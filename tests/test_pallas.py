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


def test_kernel_th1_no_concat_path(monkeypatch):
    """TH == 1 takes the nine-matmul no-concat form (the tap concat is
    rejected by Mosaic at that tile height — hit at the 1080p stage-5
    geometry, W=960).  Force TH=1 and check exactness incl. the head."""
    import repnerv_tpu.pallas_kernels.decode as dec

    monkeypatch.setattr(dec, "_pick_tile_h", lambda *a, **k: 1)
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


# ---------------------------------------------------------------------------
# Pallas SSIM gaussian blur (pallas_kernels/ssim_blur.py)
# ---------------------------------------------------------------------------


def test_gauss_blur_matches_slice_sum(monkeypatch):
    import repnerv_tpu.pallas_kernels.ssim_blur as sb
    from repnerv_tpu.ops.ssim import _gaussian_filter, _gaussian_window

    monkeypatch.setattr(sb, "INTERPRET", True)
    win_t = sb.window_tuple(11, 1.5)
    win = _gaussian_window(11, 1.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 40, 50), jnp.float32)
    out = sb.gauss_blur_valid(x, win_t)
    # the slice-sum reference path works on NHWC; add/squeeze a channel dim
    ref = _gaussian_filter(x[..., None], win)[..., 0]
    assert out.shape == (3, 30, 40)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gauss_blur_vjp_is_adjoint(monkeypatch):
    """<blur(x), ct> == <x, blur_adj(ct)> and matches autodiff through the
    slice-sum formulation."""
    import repnerv_tpu.pallas_kernels.ssim_blur as sb
    from repnerv_tpu.ops.ssim import _gaussian_filter, _gaussian_window

    monkeypatch.setattr(sb, "INTERPRET", True)
    win_t = sb.window_tuple(11, 1.5)
    win = _gaussian_window(11, 1.5)
    kx, kc = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (2, 24, 32), jnp.float32)
    ct = jax.random.normal(kc, (2, 14, 22), jnp.float32)

    (dx,) = jax.vjp(lambda a: sb.gauss_blur_valid(a, win_t), x)[1](ct)
    (dref,) = jax.vjp(lambda a: _gaussian_filter(a[..., None], win)[..., 0], x)[1](ct)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dref), atol=1e-5)


def test_gauss_blur_ragged_tail_tiles(monkeypatch):
    """H_out not divisible by the tile height exercises the clipped last
    block + in-bounds input padding."""
    import repnerv_tpu.pallas_kernels.ssim_blur as sb
    from repnerv_tpu.ops.ssim import _gaussian_filter, _gaussian_window

    monkeypatch.setattr(sb, "INTERPRET", True)
    monkeypatch.setattr(sb, "_MAX_TILE_ROWS", 16)  # force ragged: 157 = 9*16+13
    win_t = sb.window_tuple(11, 1.5)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 167, 30), jnp.float32)
    out = sb.gauss_blur_valid(x, win_t)
    ref = _gaussian_filter(x[..., None], _gaussian_window(11, 1.5))[..., 0]
    assert out.shape == (1, 157, 20)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ssim_pallas_path_matches_slice_sum(monkeypatch):
    """Full SSIM + MS-SSIM + loss gradient through the Pallas blur path."""
    import repnerv_tpu.ops.ssim as S
    import repnerv_tpu.pallas_kernels.ssim_blur as sb

    kx, ky = jax.random.split(jax.random.PRNGKey(3))
    x = jax.nn.sigmoid(jax.random.normal(kx, (1, 176, 192, 3), jnp.float32))
    y = jax.nn.sigmoid(jax.random.normal(ky, (1, 176, 192, 3), jnp.float32))

    ref_ssim = S.ssim(x, y)
    ref_ms = S.ms_ssim(x, y)
    ref_g = jax.grad(lambda a: 1.0 - S.ssim(a, y))(x)

    monkeypatch.setattr(sb, "INTERPRET", True)
    monkeypatch.setattr(S, "PALLAS_MIN_PIXELS", 1)
    out_ssim = S.ssim(x, y)
    out_ms = S.ms_ssim(x, y)
    out_g = jax.grad(lambda a: 1.0 - S.ssim(a, y))(x)

    # both paths are exact f32 weighted adds; the layouts reduce in a
    # different order, so agreement is at f32 summation-order level
    np.testing.assert_allclose(float(out_ssim), float(ref_ssim), atol=1e-5)
    np.testing.assert_allclose(float(out_ms), float(ref_ms), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g), atol=1e-5)


def test_tile_picker_respects_dtype_size():
    """f32 graphs double every VMEM buffer; the tile picker must shrink TH
    accordingly (720p stage-4 f32 overflowed scoped VMEM in round 2)."""
    from repnerv_tpu.pallas_kernels.decode import _pick_tile_h

    h, w, cin, cout = 90, 160, 96, 384
    th_bf16 = _pick_tile_h(h, w, cin, cout, el_bytes=2)
    th_f32 = _pick_tile_h(h, w, cin, cout, el_bytes=4)
    assert h % th_bf16 == 0 and h % th_f32 == 0
    assert th_f32 <= th_bf16
    for th, el in ((th_bf16, 2), (th_f32, 4)):
        window = 2 * (th + 2) * (w + 2) * cin * el
        im2col = th * w * 9 * cin * el
        acc = th * w * cout * 4
        outb = 2 * th * w * cout * el
        assert window + im2col + acc + outb <= 12 * 1024 * 1024


def test_gauss_blur_single_tile_odd_rows(monkeypatch):
    """h_out <= tile limit with h_out NOT a multiple of 8 takes the
    single-tile path whose row start must be a literal 0 (Mosaic proves
    element-start divisibility symbolically; hit at 1080p MS-SSIM level 4,
    H=135 -> h_out=125)."""
    import repnerv_tpu.pallas_kernels.ssim_blur as sb
    from repnerv_tpu.ops.ssim import _gaussian_filter, _gaussian_window

    monkeypatch.setattr(sb, "INTERPRET", True)
    win_t = sb.window_tuple(11, 1.5)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 135, 240), jnp.float32)
    out = sb.gauss_blur_valid(x, win_t)
    ref = _gaussian_filter(x[..., None], _gaussian_window(11, 1.5))[..., 0]
    assert out.shape == (2, 125, 230)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
