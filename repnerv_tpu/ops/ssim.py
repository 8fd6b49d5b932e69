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
filter is a depthwise separable conv — two small convolutions that XLA fuses
well; at 720p this is the dominant non-matmul cost of the Fusion6 loss.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


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
    lower ~6x slower on TPU; the slice-sum form is exact AND fast — XLA
    fuses the 11 shifted adds into one pass.)
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


def _ssim_maps(
    x: jnp.ndarray,
    y: jnp.ndarray,
    win: jnp.ndarray,
    data_range: float,
    k: Tuple[float, float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
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
) -> jnp.ndarray:
    """SSIM over NHWC images.  ``size_average`` mirrors pytorch_msssim."""
    win = _gaussian_window(win_size, win_sigma)
    per_channel, _ = _ssim_maps(x, y, win, data_range, k)
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
    mcs = []
    ssim_pc = None
    for i in range(levels):
        ssim_pc, cs_pc = _ssim_maps(x, y, win, data_range, k)
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
