"""Mixed-precision (bf16 MXU, f32 accumulation) correctness.

``compute_dtype="mixed"`` routes every block conv and stem matmul through
layers.mxu_conv2d_f32 / mxu_matmul_f32 — custom_vjp ops whose fwd, dgrad and
wgrad all run bf16 x bf16 -> f32.  The only rounding vs a pure-f32 graph is
the one bf16 cast per MXU operand, so outputs and gradients must track the
f32 graph to bf16 relative tolerance (~0.4%); dimension-number bugs in the
hand-written wgrad/dgrad would blow far past that.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from repnerv_tpu.config import ModelConfig
from repnerv_tpu.models.generator import apply_generator, init_generator
from repnerv_tpu.models.layers import mxu_conv2d_f32, mxu_matmul_f32


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("kh,kw", [(3, 3), (1, 1)])
def test_mxu_conv_matches_f32_conv(kh, kw):
    kx, kw_ = jax.random.split(jax.random.PRNGKey(0))
    x = _rand(kx, (2, 12, 10, 8))
    w = _rand(kw_, (kh, kw, 8, 16))
    out = mxu_conv2d_f32(x, w)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-2, atol=1e-1)


def test_mxu_conv_grads_match_f32_autodiff():
    kx, kw_, kt = jax.random.split(jax.random.PRNGKey(1), 3)
    x = _rand(kx, (2, 9, 11, 6))
    w = _rand(kw_, (3, 3, 6, 12))
    ct = _rand(kt, (2, 9, 11, 12))

    def loss_mixed(x, w):
        return jnp.sum(mxu_conv2d_f32(x, w) * ct)

    def loss_f32(x, w):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.sum(out * ct)

    dx, dw = jax.grad(loss_mixed, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_f32, argnums=(0, 1))(x, w)
    assert dx.dtype == jnp.float32 and dw.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx), rtol=3e-2, atol=2e-1)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(rw), rtol=3e-2, atol=5e-1)


def test_mxu_matmul_and_grads():
    kx, kw_, kt = jax.random.split(jax.random.PRNGKey(2), 3)
    x = _rand(kx, (4, 80))
    w = _rand(kw_, (80, 96))
    ct = _rand(kt, (4, 96))

    out = mxu_matmul_f32(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w), rtol=2e-2, atol=2e-1)

    dx, dw = jax.grad(lambda a, b: jnp.sum(mxu_matmul_f32(a, b) * ct), argnums=(0, 1))(x, w)
    rx, rw = jax.grad(lambda a, b: jnp.sum((a @ b) * ct), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx), rtol=3e-2, atol=2e-1)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(rw), rtol=3e-2, atol=2e-1)


def test_generator_mixed_tracks_f32():
    """Full-model forward + loss gradient: mixed stays within bf16-rounding
    distance of f32 — and activations/outputs remain f32 end to end."""
    cfg = ModelConfig(
        branch_type="ERB",
        fc_hw_dim="3_4_10",
        stem_dim_num="32_1",
        strides=(2, 2),
        embed="1.25_8",
        lower_width = 6,
    )
    params = init_generator(jax.random.PRNGKey(3), cfg)
    emb = _rand(jax.random.PRNGKey(4), (2, cfg.embed_length))

    import dataclasses

    out_f32 = apply_generator(params, emb, cfg, train=True)[0]
    mcfg = dataclasses.replace(cfg, compute_dtype="mixed")
    out_mix = apply_generator(params, emb, mcfg, train=True)[0]
    assert out_mix.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out_mix), np.asarray(out_f32), rtol=3e-2, atol=3e-2
    )

    tgt = jax.nn.sigmoid(_rand(jax.random.PRNGKey(5), out_f32.shape))

    def loss(p, c):
        return jnp.mean((apply_generator(p, emb, c, train=True)[0] - tgt) ** 2)

    g_f32 = jax.grad(loss)(params, cfg)
    g_mix = jax.grad(loss)(params, mcfg)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_f32)
    flat_m, _ = jax.flatten_util.ravel_pytree(g_mix)
    # cosine similarity of the full gradient: bf16 rounding is ~0.4% noise
    cos = float(
        jnp.vdot(flat_f, flat_m)
        / (jnp.linalg.norm(flat_f) * jnp.linalg.norm(flat_m) + 1e-12)
    )
    assert cos > 0.999, cos
