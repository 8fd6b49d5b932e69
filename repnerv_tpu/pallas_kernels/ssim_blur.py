"""Pallas gaussian-blur kernel for the SSIM/MS-SSIM hot path.

The Fusion6 training loss is ``0.7*L1 + 0.3*(1 - SSIM)`` (reference
utils.py:159-160); its SSIM term needs five VALID 11x11 separable gaussian
filters per step.  The slice-sum formulation in ops/ssim.py is numerically
exact (see its docstring for why convs are not), but XLA materializes the
shifted adds as ~11 passes per direction over the full 720p tensors —
measured at ~20% of the whole fwd+bwd+Adam train step (BENCHMARKS.md
"Training roofline").

This kernel computes the separable blur in one VMEM pass per row tile:
each input row window is read once from HBM, the 11 vertical then 11
horizontal weighted shifts happen on the VPU in f32 (exactness matters —
bf16 rounding of E[x^2] flips the variance term negative and poisons Adam,
ops/ssim.py:40-46), and only the VALID output tile is written back.

Layout: SSIM images are NHWC with C == 3 — a terrible TPU lane dim — so the
caller flattens to [N, H, W] (N = B*C) and W rides the 128-lane dimension
(ops/ssim.py transposes once per SSIM evaluation, not per filter).

The blur is linear and the window symmetric, so the VJP is the SAME kernel
applied to the zero-padded cotangent (full correlation == padded VALID
convolution); ``gauss_blur_valid`` wraps that in a ``jax.custom_vjp``.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tests monkeypatch this to run interpret-mode kernels off-TPU
INTERPRET = False

_MAX_TILE_ROWS = 128


def _blur_call(
    x: jnp.ndarray,  # [N, H, W] f32
    win: Tuple[float, ...],
    interpret: bool,
) -> jnp.ndarray:
    """Mosaic requires the last two dims of every block shape to be
    divisible by (8, 128) or equal to the array dims.  The width dim always
    equals the array width; for the rows: a single-tile call makes the
    window equal to the (exact) array rows, a multi-tile call uses a
    multiple-of-8 tile with a 16-row apron (>= the 10-row window overlap)
    and pads the array so the last window stays in bounds."""
    n, h, w = x.shape
    size = len(win)
    h_out, w_out = h - size + 1, w - size + 1
    to = min(_MAX_TILE_ROWS, h_out)
    if to == h_out:
        n_tiles, wr, pad_rows = 1, h, 0
    else:
        to = max(8, (to // 8) * 8)
        n_tiles = -(-h_out // to)
        wr = to + ((size - 1 + 7) // 8) * 8  # apron rounded up to 8 rows
        pad_rows = (n_tiles - 1) * to + wr - h
    if pad_rows > 0:
        x = jnp.pad(x, ((0, 0), (0, pad_rows), (0, 0)))

    def kernel(x_ref, out_ref):
        acc = win[0] * x_ref[0, :to, :]
        for k in range(1, size):
            acc = acc + win[k] * x_ref[0, k : k + to, :]
        out = win[0] * acc[:, :w_out]
        for k in range(1, size):
            out = out + win[k] * acc[:, k : k + w_out]
        out_ref[0] = out

    # Single-tile grids must index the row start as a literal 0: Mosaic
    # proves the 8-divisibility of element starts SYMBOLICALLY over ti, so
    # `ti * to` with a non-multiple-of-8 `to` is rejected even though the
    # only value ti takes is 0 (hit at 1080p MS-SSIM level 4, h_out=125).
    if n_tiles == 1:
        row_start = lambda ni, ti: (ni, 0, 0)  # noqa: E731
    else:
        row_start = lambda ni, ti: (ni, ti * to, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(wr), pl.Element(w)),
                row_start,
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, to, w_out),
            lambda ni, ti: (ni, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * to, w_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * size * n * (n_tiles * to) * (w + w_out),
            bytes_accessed=x.size * 4 + n * n_tiles * to * w_out * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)[:, :h_out, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gauss_blur_valid(x: jnp.ndarray, win: Tuple[float, ...]) -> jnp.ndarray:
    """Separable VALID gaussian blur on [N, H, W] f32 (win: static floats).

    Returns [N, H-size+1, W-size+1].  Linear; the VJP re-applies the same
    kernel to the zero-padded cotangent (symmetric window).
    """
    return _blur_call(x, win, INTERPRET)


def _gb_fwd(x, win):
    return _blur_call(x, win, INTERPRET), None


def _gb_bwd(win, _, ct):
    p = len(win) - 1
    ct_pad = jnp.pad(ct, ((0, 0), (p, p), (p, p)))
    return (_blur_call(ct_pad, win, INTERPRET),)


gauss_blur_valid.defvjp(_gb_fwd, _gb_bwd)


def window_tuple(size: int, sigma: float) -> Tuple[float, ...]:
    """Static gaussian window as python floats (baked into the kernel)."""
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    return tuple(float(v) for v in g)
