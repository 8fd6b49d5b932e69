"""SSIM and MS-SSIM in pure JAX (NHWC).

Numerics follow the ``pytorch_msssim`` package that the reference loss table
depends on (reference utils.py:9,147-188):

* separable gaussian window, ``size=11, sigma=1.5``, VALID convolution;
* ``C1=(K1*L)^2, C2=(K2*L)^2`` with ``K1=0.01, K2=0.03``;
* per-channel mean of the ssim map over the valid region, then batch mean;
* MS-SSIM: 5 levels with weights (0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
  relu on intermediate ``cs`` values, 2x2 average-pool downsampling with
  one-sided zero padding on odd dims and ``count_include_pad=True``.

Everything is jit-safe, differentiable, and shaped statically.  The gaussian
filter is the dominant non-matmul cost of the Fusion6 loss (~20% of the 720p
train step on XLA's lowering); above ``PALLAS_MIN_PIXELS`` on TPU it runs
through the fused Pallas blur kernel (pallas_kernels/ssim_blur.py) instead
of the slice-sum fallback below.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..pallas_kernels import ssim_blur

MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)

# The Pallas blur kernel takes over on TPU above this pixel count: one VMEM
# pass per row tile instead of XLA's ~11 HBM passes per filter direction —
# measured ~20% of the whole Fusion6 train step at 720p (BENCHMARKS.md).
PALLAS_MIN_PIXELS = 96 * 96
PALLAS_REQUIRE_TPU = True  # tests flip ssim_blur.INTERPRET to run off-TPU


def _use_pallas_blur(x: jnp.ndarray) -> bool:
    if x.shape[1] * x.shape[2] < PALLAS_MIN_PIXELS:
        return False
    return (
        ssim_blur.INTERPRET
        or not PALLAS_REQUIRE_TPU
        or jax.default_backend() == "tpu"
    )


def _gaussian_window(size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _gaussian_filter(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable VALID gaussian blur, NHWC.

    Implemented as weighted sums of shifted slices (pure f32 VPU adds), NOT
    a conv: on TPU the default conv precision is bf16, whose ~1e-3 rounding
    on E[x^2] exceeds C2 = 9e-4, so the variance `filter(x*x) - mu^2` can
    come out <= -C2, the structure term's denominator crosses zero, and the
    loss gradient develops ~1e5 singularities that permanently poison Adam's
    second moment.  (HIGHEST-precision grouped convs avoid that too but
    lower ~6x slower on TPU.)  XLA materializes the shifted adds as ~11 HBM
    passes per direction, which is why the Pallas kernel takes over on TPU
    at real frame sizes; this form remains the exact, portable fallback and
    the parity reference the kernel is tested against.
    """
    size = win.shape[0]
    h = x.shape[1]
    acc = win[0] * x[:, : h - size + 1]
    for k in range(1, size):
        acc = acc + win[k].astype(x.dtype) * x[:, k : k + h - size + 1]
    w = x.shape[2]
    out = win[0] * acc[:, :, : w - size + 1]
    for k in range(1, size):
        out = out + win[k].astype(x.dtype) * acc[:, :, k : k + w - size + 1]
    return out


def _ssim_maps_pallas(
    x: jnp.ndarray,
    y: jnp.ndarray,
    win_t: Tuple[float, ...],
    data_range: float,
    k: Tuple[float, float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel (ssim, cs) means via the fused Pallas blur.

    NHWC's C == 3 is a hostile TPU lane dim, so images flatten to
    [B*C, H, W] once (W rides the lanes) and every filter + elementwise map
    + mean stays in that layout; only the final [B, C] reshape returns to
    channel-separated form.  Both paths are exact f32
    weighted adds in the same k-order; results agree to f32
    summation-order level (the reductions run in different layouts).
    """
    k1, k2 = k
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    b, h, w, c = x.shape
    x2 = x.transpose(0, 3, 1, 2).reshape(b * c, h, w)
    y2 = y.transpose(0, 3, 1, 2).reshape(b * c, h, w)

    def blur(a):
        return ssim_blur.gauss_blur_valid(a, win_t)

    mu1, mu2 = blur(x2), blur(y2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(x2 * x2) - mu1_sq
    sigma2_sq = blur(y2 * y2) - mu2_sq
    sigma12 = blur(x2 * y2) - mu1_mu2

    cs_map = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return (
        jnp.mean(ssim_map, axis=(1, 2)).reshape(b, c),
        jnp.mean(cs_map, axis=(1, 2)).reshape(b, c),
    )


def _ssim_maps(
    x: jnp.ndarray,
    y: jnp.ndarray,
    win: jnp.ndarray,
    data_range: float,
    k: Tuple[float, float],
    win_t: Tuple[float, ...] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if win_t is not None and _use_pallas_blur(x):
        return _ssim_maps_pallas(x, y, win_t, data_range, k)
    k1, k2 = k
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _gaussian_filter(x, win)
    mu2 = _gaussian_filter(y, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter(x * y, win) - mu1_mu2

    cs_map = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    # per-channel spatial mean -> [B, C]
    return jnp.mean(ssim_map, axis=(1, 2)), jnp.mean(cs_map, axis=(1, 2))


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k: Tuple[float, float] = (0.01, 0.03),
    size_average: bool = True,
    pallas_ok: bool = True,
) -> jnp.ndarray:
    """SSIM over NHWC images.  ``size_average`` mirrors pytorch_msssim.

    ``pallas_ok=False`` forces the plain-XLA blur lowering — required when
    this traces inside a GSPMD-jitted multi-device graph, where the
    partitioner cannot shard a Mosaic ``pallas_call``."""
    win = _gaussian_window(win_size, win_sigma)
    win_t = ssim_blur.window_tuple(win_size, win_sigma) if pallas_ok else None
    per_channel, _ = _ssim_maps(x, y, win, data_range, k, win_t=win_t)
    per_image = jnp.mean(per_channel, axis=-1)
    return jnp.mean(per_image) if size_average else per_image


def _avg_pool_2x2_torch(x: jnp.ndarray) -> jnp.ndarray:
    """F.avg_pool2d(x, kernel_size=2, padding=[H%2, W%2]) with
    count_include_pad=True: symmetric zero pad, sum window / 4."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    summed = lax.reduce_window(
        x,
        jnp.array(0.0, x.dtype),
        lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )
    return summed * 0.25


def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k: Tuple[float, float] = (0.01, 0.03),
    weights: Tuple[float, ...] = MS_WEIGHTS,
    size_average: bool = True,
    pallas_ok: bool = True,
) -> jnp.ndarray:
    """Multi-scale SSIM, NHWC.  Requires min(H, W) > (win_size-1) * 2**4
    for the default 5 levels (the reference gates usage on H >= 160,
    utils.py:204)."""
    levels = len(weights)
    smaller = min(x.shape[1], x.shape[2])
    if smaller <= (win_size - 1) * 2 ** (levels - 1):
        raise ValueError(
            f"image side {smaller} too small for {levels}-level ms_ssim with "
            f"win_size={win_size}; need > {(win_size - 1) * 2 ** (levels - 1)}"
        )
    win = _gaussian_window(win_size, win_sigma)
    win_t = ssim_blur.window_tuple(win_size, win_sigma) if pallas_ok else None
    mcs = []
    ssim_pc = None
    for i in range(levels):
        ssim_pc, cs_pc = _ssim_maps(x, y, win, data_range, k, win_t=win_t)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs_pc))
            x = _avg_pool_2x2_torch(x)
            y = _avg_pool_2x2_torch(y)
    ssim_pc = jax.nn.relu(ssim_pc)
    stack = jnp.stack(mcs + [ssim_pc], axis=0)  # [levels, B, C]
    w = jnp.asarray(weights, dtype=stack.dtype).reshape(-1, 1, 1)
    ms = jnp.prod(stack**w, axis=0)  # [B, C]
    per_image = jnp.mean(ms, axis=-1)
    return jnp.mean(per_image) if size_average else per_image
