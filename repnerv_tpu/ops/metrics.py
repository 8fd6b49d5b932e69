"""Quality metrics: PSNR / MS-SSIM per multi-scale stage.

Parity targets: ``psnr_fn`` (reference utils.py:191-199) computes
``-10*log10(mse)`` over the *whole batch* per stage and broadcasts it to
[B, n_stage]; ``msssim_fn`` (utils.py:201-211) computes MS-SSIM only when the
stage height >= 160, else 0.  ``psnr2`` (utils.py:132-137) is the clamped
per-pixel variant kept for surface completeness.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from .ssim import ms_ssim


def psnr2(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    mse = (img1 - img2) ** 2
    psnr = -10.0 * jnp.log10(mse)
    return jnp.clip(psnr, 0.0, 50.0)


def psnr_fn(output_list: Sequence[jnp.ndarray], target_list: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Per-stage PSNR from batch-mean MSE -> [B, n_stage] (broadcast rows)."""
    cols = []
    for out, tgt in zip(output_list, target_list):
        mse = jnp.mean((out.astype(jnp.float32) - tgt.astype(jnp.float32)) ** 2)
        cols.append(-10.0 * jnp.log10(mse))
    row = jnp.stack(cols)  # [n_stage]
    b = output_list[0].shape[0]
    return jnp.broadcast_to(row[None, :], (b, row.shape[0]))


def msssim_fn(
    output_list: Sequence[jnp.ndarray],
    target_list: Sequence[jnp.ndarray],
    pallas_ok: bool = True,
) -> jnp.ndarray:
    """Per-stage MS-SSIM -> [B, n_stage]; 0 where the stage is too small.

    Gate: ``min(H, W) > 160`` — the hard constraint of 5-level MS-SSIM with
    an 11-tap window (smaller side must exceed (11-1)*2^4).  The reference
    gates on ``H >= 160`` (utils.py:204) but pytorch_msssim asserts
    ``smaller > 160``, so an H=160 video CRASHES the reference; we compute
    whenever it is legal and log 0 otherwise (one consistent rule, cf.
    ADVICE.md round 1).
    """
    vals = []
    for out, tgt in zip(output_list, target_list):
        if min(out.shape[1], out.shape[2]) > 160:  # static shapes: jit-safe python branch
            vals.append(
                ms_ssim(
                    out.astype(jnp.float32),
                    tgt.astype(jnp.float32),
                    data_range=1.0,
                    size_average=True,
                    pallas_ok=pallas_ok,
                )
            )
        else:
            vals.append(jnp.asarray(0.0, jnp.float32))
    row = jnp.stack(vals)
    b = output_list[-1].shape[0]
    return jnp.broadcast_to(row[None, :], (b, row.shape[0]))


def round_tensor(x, num: int = 2, group_str: bool = False) -> str:
    """String formatting helper (reference utils.py:213-238)."""
    import numpy as np

    x = np.asarray(x)
    if group_str:
        rows = []
        for i in range(x.shape[0]):
            rows.append(",".join(str(round(float(e), num)) for e in x[i].flatten()))
        return "/".join(rows)
    return ",".join(str(round(float(e), num)) for e in x.flatten())
