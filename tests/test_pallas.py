"""Fused Pallas decode kernel — interpret-mode exactness tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from repnerv_tpu.models.layers import activation, conv2d, pixel_shuffle
from repnerv_tpu.pallas_kernels.decode import (
    fused_conv_ps_act,
    shuffle_weight_permutation,
)


def _mk(B=2, H=8, W=16, Cin=8, C=4, s=2, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    cout = C * s * s
    x = jax.random.normal(ks[0], (B, H, W, Cin), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, Cin, cout), jnp.float32) * 0.1
    b = jax.random.normal(ks[2], (cout,), jnp.float32) * 0.1
    return x, w, b


def test_shuffle_permutation_inverts_pixelshuffle_order():
    perm = np.asarray(shuffle_weight_permutation(16, 2))
    # position (i*2+j)*4 + c must hold source channel c*4 + i*2 + j
    for i in range(2):
        for j in range(2):
            for c in range(4):
                assert perm[(i * 2 + j) * 4 + c] == c * 4 + i * 2 + j


@pytest.mark.parametrize("stride", [1, 2, 5])
def test_kernel_matches_xla_block(stride):
    x, w, b = _mk(C=3, s=stride)
    ref = activation(pixel_shuffle(conv2d(x, w, b), stride), "swish")
    out = fused_conv_ps_act(
        x, w, b, stride, "swish", compute_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_kernel_fused_head_matches_xla():
    x, w, b = _mk()
    hw = jax.random.normal(jax.random.PRNGKey(7), (1, 1, 4, 3)) * 0.2
    hb = jnp.asarray([0.1, -0.2, 0.3])
    base = activation(pixel_shuffle(conv2d(x, w, b), 2), "swish")
    ref = (jnp.tanh(conv2d(base, hw, hb)) + 1.0) * 0.5
    out = fused_conv_ps_act(
        x, w, b, 2, "swish",
        head_w=hw, head_b=hb, compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_kernel_sigmoid_head():
    x, w, b = _mk()
    hw = jax.random.normal(jax.random.PRNGKey(8), (1, 1, 4, 3)) * 0.2
    base = activation(pixel_shuffle(conv2d(x, w, b), 2), "swish")
    ref = jax.nn.sigmoid(conv2d(base, hw, None))
    out = fused_conv_ps_act(
        x, w, b, 2, "swish",
        head_w=hw, head_b=None, out_squash="sigmoid",
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_generator_pallas_path_interpret(monkeypatch):
    """The cfg.use_pallas_decode wiring must reproduce the XLA deploy path."""
    import dataclasses

    import repnerv_tpu.pallas_kernels.decode as dec
    from repnerv_tpu.models.embedding import positional_encoding
    from repnerv_tpu.models.generator import (
        apply_generator,
        generator_to_deploy,
        init_generator,
    )
    from test_model_train import tiny_model

    import repnerv_tpu.models.generator as gen

    orig = dec.fused_conv_ps_act
    monkeypatch.setattr(
        dec, "fused_conv_ps_act", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )
    monkeypatch.setattr(gen, "PALLAS_MIN_PIXELS", 1)
    monkeypatch.setattr(gen, "PALLAS_REQUIRE_TPU", False)

    # strides (5, 2): exercises the single-stage kernels incl. the fused head
    cfg = tiny_model(branch_type="ERB", fc_hw_dim="8_8_8", strides=(5, 2), lower_width=8)
    params = init_generator(jax.random.PRNGKey(3), cfg)
    dep, dep_cfg = generator_to_deploy(params, cfg)
    emb = positional_encoding(jnp.asarray([0.2, 0.7]), cfg.embed)
    ref = apply_generator(dep, emb, dep_cfg, train=False)[0]
    pal_cfg = dataclasses.replace(dep_cfg, use_pallas_decode=True)
    out = apply_generator(dep, emb, pal_cfg, train=False)[0]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)
