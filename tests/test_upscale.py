"""CustomConv upscale variants (reference model.py:143-171) vs torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from repnerv_tpu.models.upscale import (
    apply_custom_conv,
    init_custom_conv,
    upsample_bilinear_align_corners,
)


@pytest.mark.parametrize("conv_type", ["conv", "deconv", "bilinear"])
def test_custom_conv_shapes(conv_type):
    p = init_custom_conv(jax.random.PRNGKey(0), 4, 6, 2, conv_type)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 7, 4))
    out = apply_custom_conv(p, x, 2, conv_type)
    assert out.shape == (2, 10, 14, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_bilinear_matches_torch_align_corners():
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).normal(size=(1, 5, 6, 3)).astype(np.float32)
    ours = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 2))
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            scale_factor=2,
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_deconv_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 5, 3)).astype(np.float32)
    w = rng.normal(size=(2, 2, 3, 6)).astype(np.float32) * 0.2  # HWIO
    b = rng.normal(size=(6,)).astype(np.float32)
    ours = np.asarray(
        apply_custom_conv({"deconv": {"w": jnp.asarray(w), "b": jnp.asarray(b)}},
                          jnp.asarray(x), 2, "deconv")
    )
    tconv = torch.nn.ConvTranspose2d(3, 6, 2, 2)
    # torch ConvTranspose2d weight layout: [in, out, kh, kw]
    tconv.weight.data = torch.from_numpy(w.transpose(2, 3, 0, 1))
    tconv.bias.data = torch.from_numpy(b)
    theirs = (
        tconv(torch.from_numpy(x).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1)
        .detach()
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
