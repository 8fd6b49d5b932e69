"""M0 golden tests: positional encoding, losses/SSIM, LR schedule, quantizer.

Reference formulas are re-derived independently (numpy / closed form) from
/root/reference/utils.py semantics — see each test's docstring.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from repnerv_tpu.models.embedding import (
    embed_length,
    positional_encoding,
    transformer_positional_encoding,
    transformer_positional_table,
)
from repnerv_tpu.ops.losses import loss_fn, multi_scale_loss
from repnerv_tpu.ops.metrics import msssim_fn, psnr_fn, round_tensor
from repnerv_tpu.ops.ssim import ms_ssim, ssim
from repnerv_tpu.train.schedule import lr_at_step, lr_multiplier
from repnerv_tpu.compress.quantize import quantize_per_tensor, quantize_state


# ---------------------------------------------------------------------------
# Positional encoding (utils.py:110-129)
# ---------------------------------------------------------------------------


def test_pe_length():
    assert embed_length("1.25_40") == 80
    assert embed_length("none") == 1


def test_pe_values_match_formula():
    t = np.array([0.0, 0.123, 0.5, 0.999], dtype=np.float32)
    out = np.asarray(positional_encoding(t, "1.25_40"))
    assert out.shape == (4, 80)
    for bi, tv in enumerate(t):
        for i in range(40):
            # emulate torch's f32 rounding order: (pos * base**i) * pi
            phase = np.float32(np.float32(tv) * np.float32(1.25**i)) * np.float32(math.pi)
            assert out[bi, 2 * i] == pytest.approx(math.sin(float(phase)), abs=1e-5)
            assert out[bi, 2 * i + 1] == pytest.approx(math.cos(float(phase)), abs=1e-5)


def test_pe_none_returns_raw():
    t = np.array([0.25, 0.75], dtype=np.float32)
    out = np.asarray(positional_encoding(t, "none"))
    np.testing.assert_allclose(out, t[:, None])


def test_pe_trans_table():
    table = transformer_positional_table(16, 100)
    assert table.shape == (100, 16)
    # row p: pe[p, 2i] = sin(p * exp(2i * -ln(1e4)/16))
    p, i = 7, 3
    div = math.exp(2 * i * (-math.log(10000.0) / 16))
    assert float(table[p, 2 * i]) == pytest.approx(math.sin(p * div), abs=1e-5)
    out = transformer_positional_encoding(jnp.array([0.07]), table)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(table[7]))


# ---------------------------------------------------------------------------
# SSIM / MS-SSIM vs an independent numpy implementation
# ---------------------------------------------------------------------------


def _np_gauss(size, sigma):
    c = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(c**2) / (2 * sigma**2))
    return g / g.sum()


def _np_filter(img, win):
    # img: [B,H,W,C]; separable valid conv
    from numpy.lib.stride_tricks import sliding_window_view

    k = len(win)
    v = sliding_window_view(img, k, axis=1)  # [B, H-k+1, W, C, k]
    img = np.einsum("bhwck,k->bhwc", v, win)
    v = sliding_window_view(img, k, axis=2)
    return np.einsum("bhwck,k->bhwc", v, win)


def _np_ssim_perch(x, y, win, data_range=1.0):
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    mu1, mu2 = _np_filter(x, win), _np_filter(y, win)
    s1 = _np_filter(x * x, win) - mu1**2
    s2 = _np_filter(y * y, win) - mu2**2
    s12 = _np_filter(x * y, win) - mu1 * mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    sm = (2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1) * cs
    return sm.mean(axis=(1, 2)), cs.mean(axis=(1, 2))


def _np_pool(x):
    # torch avg_pool2d(k=2, s=2, padding=[H%2, W%2], count_include_pad=True):
    # windows start at -pad and stride 2, so only the LEFT pad is touched.
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    x = np.pad(x, ((0, 0), (ph, 0), (pw, 0), (0, 0)))
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).sum(axis=(2, 4)) * 0.25


def test_ssim_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
    ours = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    win = _np_gauss(11, 1.5)
    ref, _ = _np_ssim_perch(x.astype(np.float64), y.astype(np.float64), win)
    assert ours == pytest.approx(float(ref.mean()), abs=2e-5)


def test_ssim_identical_images():
    x = jnp.ones((1, 16, 16, 3)) * 0.5
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-6)


def test_ms_ssim_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.random((1, 180, 192, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    ours = float(ms_ssim(jnp.asarray(x), jnp.asarray(y)))

    win = _np_gauss(11, 1.5)
    weights = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]
    xa, ya = x.astype(np.float64), y.astype(np.float64)
    mcs = []
    for i in range(5):
        sp, cp = _np_ssim_perch(xa, ya, win)
        if i < 4:
            mcs.append(np.maximum(cp, 0))
            xa, ya = _np_pool(xa), _np_pool(ya)
    stack = np.stack(mcs + [np.maximum(sp, 0)])
    ref = np.prod(stack ** np.asarray(weights)[:, None, None], axis=0).mean()
    assert ours == pytest.approx(float(ref), abs=5e-5)


# ---------------------------------------------------------------------------
# Loss table (utils.py:139-189)
# ---------------------------------------------------------------------------


def test_loss_table_values():
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.random((1, 24, 24, 3)), jnp.float32)
    t = jnp.asarray(rng.random((1, 24, 24, 3)), jnp.float32)
    l1 = float(jnp.mean(jnp.abs(p - t)))
    l2 = float(jnp.mean((p - t) ** 2))
    s = float(ssim(p, t))
    assert float(loss_fn(p, t, "L1")) == pytest.approx(l1, rel=1e-6)
    assert float(loss_fn(p, t, "L2")) == pytest.approx(l2, rel=1e-6)
    assert float(loss_fn(p, t, "SSIM")) == pytest.approx(1 - s, rel=1e-5)
    assert float(loss_fn(p, t, "Fusion6")) == pytest.approx(
        0.7 * l1 + 0.3 * (1 - s), rel=1e-5
    )
    assert float(loss_fn(p, t, "Fusion7")) == pytest.approx(
        0.7 * l2 + 0.3 * l1, rel=1e-5
    )
    with pytest.raises(KeyError):
        loss_fn(p, t, "Fusion99")


def test_loss_gradients_flow():
    p = jnp.full((1, 16, 16, 3), 0.4)
    t = jnp.full((1, 16, 16, 3), 0.6)
    g = jax.grad(lambda x: loss_fn(x, t, "Fusion6"))(p)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_multi_scale_loss_weighting():
    p1 = jnp.full((1, 16, 16, 3), 0.3)
    p2 = jnp.full((1, 32, 32, 3), 0.3)
    t1 = jnp.full((1, 16, 16, 3), 0.5)
    t2 = jnp.full((1, 32, 32, 3), 0.5)
    l = float(multi_scale_loss([p1, p2], [t1, t2], "L1", lw=0.5))
    assert l == pytest.approx(0.5 * 0.2 + 0.2, rel=1e-5)


# ---------------------------------------------------------------------------
# Metrics (utils.py:132-238)
# ---------------------------------------------------------------------------


def test_psnr_fn_shape_and_value():
    out = [jnp.full((2, 8, 8, 3), 0.5), jnp.full((2, 16, 16, 3), 0.5)]
    tgt = [jnp.full((2, 8, 8, 3), 0.4), jnp.full((2, 16, 16, 3), 0.25)]
    p = np.asarray(psnr_fn(out, tgt))
    assert p.shape == (2, 2)
    assert p[0, 0] == pytest.approx(-10 * math.log10(0.01), abs=1e-3)
    assert p[1, 1] == pytest.approx(-10 * math.log10(0.0625), abs=1e-3)


def test_msssim_fn_gates_small_stages():
    small = jnp.full((1, 80, 80, 3), 0.5)
    big = jnp.full((1, 176, 192, 3), 0.5)
    m = np.asarray(msssim_fn([small, big], [small, big]))
    assert m.shape == (1, 2)
    assert m[0, 0] == 0.0
    assert m[0, 1] == pytest.approx(1.0, abs=1e-5)


def test_round_tensor():
    x = np.array([[1.234, 5.678], [9.1011, 2.0]])
    assert round_tensor(x, 2) == "1.23,5.68,9.1,2.0"
    assert round_tensor(x, 1, group_str=True) == "1.2,5.7/9.1,2.0"


# ---------------------------------------------------------------------------
# LR schedule (utils.py:240-259)
# ---------------------------------------------------------------------------


def test_lr_warmup_and_cosine():
    # epochs=300, warmup=60 (0.2 * 300)
    kw = dict(epochs=300, warmup_epochs=60, lr_type="cosine")
    assert float(lr_multiplier(0.0, **kw)) == pytest.approx(0.1)
    assert float(lr_multiplier(30.0, **kw)) == pytest.approx(0.1 + 0.9 * 0.5)
    assert float(lr_multiplier(60.0, **kw)) == pytest.approx(1.0)
    mid = float(lr_multiplier(60 + 120.0, **kw))
    assert mid == pytest.approx(0.5, abs=1e-6)
    assert float(lr_multiplier(300.0, **kw)) == pytest.approx(0.0, abs=1e-6)


def test_lr_step_and_const():
    st = dict(epochs=100, warmup_epochs=0, lr_type="step", lr_steps=(30, 60))
    assert float(lr_multiplier(10.0, **st)) == pytest.approx(1.0)
    assert float(lr_multiplier(31.0, **st)) == pytest.approx(0.1)
    assert float(lr_multiplier(61.0, **st)) == pytest.approx(0.01, rel=1e-5)
    ct = dict(epochs=100, warmup_epochs=0, lr_type="const")
    assert float(lr_multiplier(55.0, **ct)) == 1.0


def test_lr_at_step_fractional_epoch():
    lr = float(
        lr_at_step(
            jnp.asarray(150),
            base_lr=5e-4,
            steps_per_epoch=100,
            epochs=300,
            warmup_epochs=60,
        )
    )
    # frac_epoch = 1.5 -> warmup mult = 0.1 + 0.9 * 1.5 / 60
    assert lr == pytest.approx(5e-4 * (0.1 + 0.9 * 1.5 / 60), rel=1e-5)


# ---------------------------------------------------------------------------
# Quantizer (utils.py:11-67)
# ---------------------------------------------------------------------------


def test_quantize_global_nonzero_aware():
    t = np.array([0.0, 0.5, 1.0, -0.5, 0.0], dtype=np.float32)
    q, dq = quantize_per_tensor(t, bit=8, axis=-1)
    # nonzero min=-0.5 max=1.0, scale=1.5/256
    scale = 1.5 / 256
    np.testing.assert_allclose(q, np.round((t + 0.5) / (scale + 1e-19)))
    np.testing.assert_allclose(dq, -0.5 + scale * q, rtol=1e-6)


def test_quantize_per_axis():
    t = np.array([[1.0, 2.0], [10.0, 30.0]], dtype=np.float32)
    q, dq = quantize_per_tensor(t, bit=4, axis=0)
    s0, s1 = (2 - 1) / 16, (30 - 10) / 16
    np.testing.assert_allclose(q[0], np.round((t[0] - 1.0) / (s0 + 1e-19)))
    np.testing.assert_allclose(q[1], np.round((t[1] - 10.0) / (s1 + 1e-19)))
    assert abs(dq[1, 1] - 30.0) <= s1 / 2 + 1e-6


def test_quantize_all_zero_slice():
    t = np.zeros((3, 4), dtype=np.float32)
    t[1] = [1, 2, 3, 4]
    q, dq = quantize_per_tensor(t, bit=8, axis=0)
    np.testing.assert_allclose(dq[0], 0.0)
    np.testing.assert_allclose(dq[2], 0.0)
    assert np.abs(dq[1] - t[1]).max() < (4 - 1) / 256 + 1e-6


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(3)
    t = rng.normal(size=(64, 64)).astype(np.float32)
    _, dq = quantize_per_tensor(t, bit=8, axis=-1)
    spread = t[t != 0].max() - t[t != 0].min()
    assert np.abs(dq - t).max() <= spread / 256 * 0.5 + 1e-5


def test_quantize_state_axis_selection():
    params = {
        "stem/0/w": np.random.default_rng(4).normal(size=(8, 16)).astype(np.float32),
        "stem/0/b": np.linspace(-1, 1, 16).astype(np.float32),
        "block/w": np.random.default_rng(5).normal(size=(3, 3, 4, 8)).astype(np.float32),
    }
    dq, codes, nz, qparams = quantize_state(params, bit=8, axis=0)
    assert set(dq) == set(params)
    assert len(nz) == 3
    # QuantParams reconstruct the dequantized tensors bit-exactly
    for k in params:
        rec = qparams[k].t_min + qparams[k].scale * codes[k]
        np.testing.assert_array_equal(rec.astype(np.float32), dq[k])
    # 2D/4D non-bias tensors grouped per axis-0 slice; bias per-tensor
    assert qparams["stem/0/w"].t_min.shape == (8, 1)
    assert qparams["block/w"].t_min.shape == (3, 1, 1, 1)
    assert qparams["stem/0/b"].t_min.shape == ()
    for k in params:
        assert dq[k].shape == params[k].shape
        err = np.abs(dq[k] - params[k]).max()
        spread = params[k].max() - params[k].min()
        assert err <= spread / 256 + 1e-5
