"""Fused decode kernels: conv3x3 + bias + PixelShuffle + activation (+ head).

The deploy-mode NeRV block is ``act(pixel_shuffle(conv3x3(x)))`` (reference
model.py:518-567).  Under XLA this materializes the conv output
[H, W, C*s*s] to HBM, then the pixel-shuffle transpose copies it again —
at Bunny-720p stage 5 that intermediate is 177 MB/frame (bf16), twice the
traffic of everything else in the block.  This Pallas kernel keeps the whole
block in VMEM:

* grid over (batch, row-tiles); each program DMAs a (TH+2)-row halo slice of
  the zero-padded input from HBM,
* computes the conv as 9 shifted [TH*W, Cin] @ [Cin, Cout] MXU matmuls
  accumulated in f32,
* adds bias, applies the activation, performs the pixel-shuffle transpose in
  registers/VMEM, and writes only the final [TH*s, W*s, C] tile,
* optionally also applies the 1x1 RGB head + output squashing
  (reference model.py:621-622) so the full-resolution feature map never
  touches HBM at all.

Double-buffered input DMA overlaps the next tile's fetch with compute
(guide: Patterns/Double Buffering).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.layers import activation


def _pick_tile_h(h: int, w: int, cin: int, cout: int, bytes_per_el: int = 2) -> int:
    """Largest TH dividing h such that in+out tiles fit comfortably in VMEM."""
    budget = 8 * 1024 * 1024  # leave headroom of the ~16MB VMEM
    best = 1
    for th in range(1, h + 1):
        if h % th:
            continue
        in_bytes = 2 * (th + 2) * (w + 2) * cin * bytes_per_el  # double buffer
        out_bytes = th * w * cout * 4  # f32 accumulator
        if in_bytes + out_bytes <= budget:
            best = th
        else:
            break
    return best


def fused_conv_ps_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    stride: int,
    act: str = "swish",
    *,
    head_w: Optional[jnp.ndarray] = None,
    head_b: Optional[jnp.ndarray] = None,
    out_squash: Optional[str] = None,  # None | "tanh" | "sigmoid"
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """act(pixel_shuffle(conv3x3(x) + b)) [@head_w + head_b -> squash].

    x: [B, H, W, Cin]; w: [3, 3, Cin, Cout] with Cout = C*stride**2.
    Returns [B, H*s, W*s, C] (or [..., 3] with a fused head).
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    s = stride
    C = Cout // (s * s)
    with_head = head_w is not None
    c_final = head_w.shape[-1] if with_head else C

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(compute_dtype)
    w = w.astype(compute_dtype)
    bias = (b if b is not None else jnp.zeros((Cout,))).astype(jnp.float32)
    hw = head_w[0, 0].astype(jnp.float32) if with_head else jnp.zeros((1, 1))
    hb = (
        head_b.astype(jnp.float32)
        if with_head and head_b is not None
        else jnp.zeros((c_final,), jnp.float32)
    )

    TH = _pick_tile_h(H, W, Cin, Cout)
    grid = (B, H // TH)

    def kernel(x_hbm, w_ref, b_ref, hw_ref, hb_ref, out_ref, x_tile, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        n_tiles = pl.num_programs(1)

        def dma(slot, tile_idx):
            return pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(tile_idx * TH, TH + 2)],
                x_tile.at[slot],
                sem.at[slot],
            )

        @pl.when(ti == 0)
        def _():
            dma(0, 0).start()

        slot = ti % 2

        @pl.when(ti + 1 < n_tiles)
        def _():
            dma((ti + 1) % 2, ti + 1).start()

        dma(slot, ti).wait()

        acc = jnp.zeros((TH * W, Cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                win = x_tile[slot, dy : dy + TH, dx : dx + W, :].reshape(
                    TH * W, Cin
                )
                acc += jnp.dot(
                    win, w_ref[dy, dx], preferred_element_type=jnp.float32
                )
        acc += b_ref[:].reshape(1, Cout)
        acc = activation(acc, act)
        # pixel shuffle in VMEM: [TH, W, C, s, s] -> [TH, s, W, s, C]
        tile = acc.reshape(TH, W, C, s, s).transpose(0, 3, 1, 4, 2)
        tile = tile.reshape(TH * s, W * s, C)
        if with_head:
            flat = tile.reshape(TH * s * W * s, C)
            img = (
                jnp.dot(flat, hw_ref[:], preferred_element_type=jnp.float32)
                + hb_ref[:].reshape(1, -1)
            )
            if out_squash == "sigmoid":
                img = jax.nn.sigmoid(img)
            else:
                img = (jnp.tanh(img) + 1.0) * 0.5
            out_ref[0] = img.reshape(TH * s, W * s, c_final).astype(out_ref.dtype)
        else:
            out_ref[0] = tile.astype(out_ref.dtype)

    out_dtype = jnp.float32 if with_head else compute_dtype
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded input stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH * s, W * s, c_final),
            lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H * s, W * s, c_final), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2, W + 2, Cin), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * Cin * Cout,
            bytes_accessed=xp.size * 2 + B * H * s * W * s * c_final * 4,
            transcendentals=B * H * W * Cout,
        ),
        interpret=interpret,
    )(xp, w, bias, hw, hb)
    return result
