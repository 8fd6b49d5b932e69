"""Fused Pallas TRAINING stage (pallas_kernels/train_tail.py) — interpret
mode exactness of the forward AND the custom VJP against the XLA chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import repnerv_tpu.models.generator as gen
import repnerv_tpu.pallas_kernels.train_tail as tt
from repnerv_tpu.models.layers import activation, conv2d, pixel_shuffle
from repnerv_tpu.pallas_kernels.train_tail import fused_stage_train

from test_model_train import tiny_model


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(tt, "INTERPRET", True)


def _mk(B=2, H=8, W=16, Cin=8, C=4, s=2, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    cout = C * s * s
    x = jax.random.normal(ks[0], (B, H, W, Cin), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, Cin, cout), jnp.float32) * 0.1
    b = jax.random.normal(ks[2], (cout,), jnp.float32) * 0.1
    hw = jax.random.normal(ks[3], (1, 1, C, 3), jnp.float32) * 0.2
    hb = jax.random.normal(ks[4], (3,), jnp.float32) * 0.1
    return x, w, b, hw, hb


def _ref_chain(x, w, b, hw, hb, s, squash="tanh"):
    y = activation(pixel_shuffle(conv2d(x, w, b), s), "swish")
    if hw is None:
        return y
    h = conv2d(y, hw, hb)
    return jax.nn.sigmoid(h) if squash == "sigmoid" else (jnp.tanh(h) + 1) / 2


@pytest.mark.parametrize("stride", [2, 5])
def test_fwd_matches_xla_chain(stride):
    x, w, b, _, _ = _mk(C=3, s=stride)
    ref = _ref_chain(x, w, b, None, None, stride)
    out = fused_stage_train(
        x, w, b, None, None, stride, "swish", "tanh", "float32"
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


@pytest.mark.parametrize("squash", ["tanh", "sigmoid"])
def test_fwd_with_head_matches_xla_chain(squash):
    x, w, b, hw, hb = _mk()
    ref = _ref_chain(x, w, b, hw, hb, 2, squash)
    out = fused_stage_train(x, w, b, hw, hb, 2, "swish", squash, "float32")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_vjp_matches_autodiff_no_head():
    x, w, b, _, _ = _mk()
    ct = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 32, 4))

    def ref_loss(x, w, b):
        return jnp.sum(_ref_chain(x, w, b, None, None, 2) * ct)

    def ker_loss(x, w, b):
        return jnp.sum(
            fused_stage_train(x, w, b, None, None, 2, "swish", "tanh", "float32")
            * ct
        )

    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(x, w, b)
    gk = jax.grad(ker_loss, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-4)


@pytest.mark.parametrize("squash", ["tanh", "sigmoid"])
def test_vjp_matches_autodiff_with_head(squash):
    x, w, b, hw, hb = _mk(seed=3)
    ct = jax.random.normal(jax.random.PRNGKey(11), (2, 16, 32, 3))

    def ref_loss(x, w, b, hw, hb):
        return jnp.sum(_ref_chain(x, w, b, hw, hb, 2, squash) * ct)

    def ker_loss(x, w, b, hw, hb):
        return jnp.sum(
            fused_stage_train(x, w, b, hw, hb, 2, "swish", squash, "float32")
            * ct
        )

    gr = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(x, w, b, hw, hb)
    gk = jax.grad(ker_loss, argnums=(0, 1, 2, 3, 4))(x, w, b, hw, hb)
    for a, c in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-4)


@pytest.mark.parametrize("squash", ["tanh", "sigmoid"])
def test_th1_no_concat_fwd_and_vjp(monkeypatch, squash):
    """TH == 1 takes the nine-matmul no-concat form (Mosaic rejects the tap
    concat at that tile height — the 1080p stage-5 geometry, W=960).  Force
    TH=1 and check forward AND gradients against the XLA chain."""
    monkeypatch.setattr(tt, "_pick_tile_h", lambda *a, **k: 1)
    x, w, b, hw, hb = _mk(seed=5)
    ct = jax.random.normal(jax.random.PRNGKey(13), (2, 16, 32, 3))

    ref = _ref_chain(x, w, b, hw, hb, 2, squash)
    out = fused_stage_train(x, w, b, hw, hb, 2, "swish", squash, "float32")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)

    def ref_loss(x, w, b, hw, hb):
        return jnp.sum(_ref_chain(x, w, b, hw, hb, 2, squash) * ct)

    def ker_loss(x, w, b, hw, hb):
        return jnp.sum(
            fused_stage_train(x, w, b, hw, hb, 2, "swish", squash, "float32")
            * ct
        )

    gr = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(x, w, b, hw, hb)
    gk = jax.grad(ker_loss, argnums=(0, 1, 2, 3, 4))(x, w, b, hw, hb)
    for a, c in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-4)


def test_generator_train_fwd_and_grads_match_xla_path(monkeypatch):
    """apply_generator with use_pallas_train on (gates lifted) equals the
    XLA train path in outputs AND parameter gradients — ERB online fusion
    differentiates through the kernel's custom VJP into every branch."""
    import dataclasses

    monkeypatch.setattr(gen, "PALLAS_REQUIRE_TPU", False)
    monkeypatch.setattr(gen, "PALLAS_MIN_PIXELS", 1)
    mcfg = tiny_model(branch_type="ERB", fc_hw_dim="4_4_8", strides=(2, 2))
    params = gen.init_generator(jax.random.PRNGKey(0), mcfg)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, mcfg.embed_length))

    on = dataclasses.replace(mcfg, use_pallas_train=True)
    off = dataclasses.replace(mcfg, use_pallas_train=False)

    out_on = gen.apply_generator(params, emb, on, train=True)[-1]
    out_off = gen.apply_generator(params, emb, off, train=True)[-1]
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), atol=1e-5
    )

    def loss(p, cfg):
        o = gen.apply_generator(p, emb, cfg, train=True)[-1]
        return jnp.mean((o - 0.3) ** 2)

    g_on = jax.grad(lambda p: loss(p, on))(params)
    g_off = jax.grad(lambda p: loss(p, off))(params)
    for a, c in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


@pytest.mark.parametrize("th1", [False, True])
def test_fused_bwd_matches_xla_bwd(monkeypatch, th1):
    """The round-4 fused epilogue-backward kernel (FUSED_BWD) equals the
    XLA-chain backward it replaces, for both tile-height forms:

    - exactly (1e-5) at f32, where neither path rounds between ops
    - at bf16 (the flagship dtype) it must be AT LEAST as close to the f32
      ground truth as the XLA-bf16 chain is (the kernel keeps the whole
      elementwise chain in f32 on-tile, so it is usually closer)
    """
    if th1:
        monkeypatch.setattr(tt, "_pick_tile_h_bwd", lambda *a, **k: 1)
    x, w, b, hw, hb = _mk(seed=7)
    ct = jax.random.normal(jax.random.PRNGKey(17), (2, 16, 32, 3))

    def loss(cdt):
        def f(x, w, b, hw, hb):
            return jnp.sum(
                fused_stage_train(x, w, b, hw, hb, 2, "swish", "tanh", cdt) * ct
            )

        return f

    argnums = (0, 1, 2, 3, 4)
    monkeypatch.setattr(tt, "FUSED_BWD", False)
    g_true = jax.grad(loss("float32"), argnums=argnums)(x, w, b, hw, hb)
    g_xla16 = jax.grad(loss("bfloat16"), argnums=argnums)(x, w, b, hw, hb)
    monkeypatch.setattr(tt, "FUSED_BWD", True)
    g_fused = jax.grad(loss("float32"), argnums=argnums)(x, w, b, hw, hb)
    g_fused16 = jax.grad(loss("bfloat16"), argnums=argnums)(x, w, b, hw, hb)

    for a, c in zip(g_fused, g_true):  # f32: exact parity
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)
    for gf, gx, gt in zip(g_fused16, g_xla16, g_true):
        dev_f = float(jnp.max(jnp.abs(gf - gt)))
        dev_x = float(jnp.max(jnp.abs(gx - gt)))
        assert dev_f <= dev_x * 1.5 + 1e-5, (dev_f, dev_x)
