"""Runtime utilities: video-decode scan, profiling helpers, SSIM stability."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from repnerv_tpu.ops.ssim import ssim
from repnerv_tpu.train.loop import make_decode_fn, make_video_decode_fn
from repnerv_tpu.utils.profiling import StepTimer, device_memory_stats

from test_model_train import tiny_model, tiny_train


def test_video_decode_matches_per_batch():
    cfg = tiny_train()
    from repnerv_tpu.models.generator import init_generator

    params = init_generator(jax.random.PRNGKey(0), cfg.model)
    decode = make_decode_fn(cfg)
    decode_all = make_video_decode_fn(cfg, keep_frames=True)
    t = jnp.linspace(0, 0.9, 8).reshape(2, 4)
    frames = decode_all(params, t)
    assert frames.shape == (2, 4, 8, 8, 3)
    ref = decode(params, t[1])
    np.testing.assert_allclose(np.asarray(frames[1]), np.asarray(ref), atol=1e-6)


def test_video_decode_checksum_mode():
    cfg = tiny_train()
    from repnerv_tpu.models.generator import init_generator

    params = init_generator(jax.random.PRNGKey(0), cfg.model)
    decode_all = make_video_decode_fn(cfg, keep_frames=False)
    sums = decode_all(params, jnp.linspace(0, 0.9, 8).reshape(2, 4))
    assert sums.shape == (2,)
    assert np.isfinite(np.asarray(sums)).all()


def test_step_timer_forces_completion():
    timer = StepTimer()
    x = jnp.ones((64, 64))
    with timer.measure():
        y = x @ x
        timer.sync(y)
    assert timer.best_ms > 0 and np.isfinite(timer.mean_ms)


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU


def test_profiler_trace_writes(tmp_path):
    from repnerv_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jnp.sum(jnp.ones((32, 32))).block_until_ready()
    # a plugins/profile dir with at least one artifact should exist
    found = any("plugins" in root or f for root, _, f in os.walk(tmp_path))
    assert found


def test_ssim_gradient_bounded_on_flat_regions():
    """Regression canary for the TPU bf16 variance-cancellation bug
    (commit 35d9d03): near-constant prediction with flat-saturated target
    patches must produce small, finite SSIM gradients."""
    rng = np.random.default_rng(0)
    pred = jnp.asarray(
        0.5 + 0.02 * rng.standard_normal((2, 64, 64, 3)), jnp.float32
    )
    tgt = np.clip(rng.uniform(-0.2, 1.4, (2, 64, 64, 3)), 0, 1)  # saturated flats
    tgt = jnp.asarray(tgt, jnp.float32)
    g = jax.grad(lambda p: 1.0 - ssim(p, tgt))(pred)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() < 1e-2, np.abs(g).max()


def test_gaussian_filter_variance_nonnegative_epsilon():
    """filter(x*x) - filter(x)^2 must stay >= -1e-6 (far inside C2) for
    constant inputs — the exact cancellation the slice-sum filter fixes."""
    from repnerv_tpu.ops.ssim import _gaussian_filter, _gaussian_window

    win = _gaussian_window(11, 1.5)
    x = jnp.full((1, 32, 32, 3), 0.7, jnp.float32)
    mu = _gaussian_filter(x, win)
    var = _gaussian_filter(x * x, win) - mu * mu
    assert float(jnp.min(var)) > -1e-6
    assert float(jnp.max(jnp.abs(var))) < 1e-6
