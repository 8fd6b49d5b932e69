"""Fused decode kernels: conv3x3 + bias + PixelShuffle + activation (+ head).

The deploy-mode NeRV block is ``act(pixel_shuffle(conv3x3(x)))`` (reference
model.py:518-567).  Under XLA the conv output [H, W, C*s*s] round-trips
through HBM and the pixel-shuffle transpose copies it again — at Bunny-720p
stage 5 that intermediate is 177 MB/frame in bf16.  This kernel keeps the
block in VMEM and writes only final pixels.

Mosaic-friendly formulation (everything rides plain BlockSpec pipelining —
no manual DMA, no lane-splitting reshapes, no dynamic lane slicing):

* The 3-row halo comes from THREE row-shifted views of the zero-padded
  input (rows [0:H], [1:H+1], [2:H+2]), each block-delivered per row-tile;
  Mosaic double-buffers the fetches automatically.
* The fused conv weights are pre-permuted host-side so output channel
  ``(i*s + j)*C + c`` holds what PyTorch-ordered channel ``c*s*s + i*s + j``
  held, and pre-split per sub-row ``i``: after this, pixel-shuffle is pure
  row reindexing.
* The grid is (batch, H-row-tiles, sub-row i).  Each program computes its
  tile's output sub-rows ``h*s + i`` as 9 shifted [TH*W, Cin] @ [Cin, s*C]
  MXU matmuls (f32 accumulation), bias + activation, then ONE supported
  reshape [TH*W, s*C] -> [TH, W, s*C] (minor dim unchanged).
* The kernel output is [B, H, s, W, s*C]; the final reshape to
  [B, H*s, W*s, C] is a row-major bitcast — XLA emits no copy.
* The optional fused 1x1 RGB head + tanh/sigmoid squash (reference
  model.py:621-622) applies per sub-column j on the VMEM tile, so the
  full-resolution feature map never exists in HBM at all.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.layers import activation


def shuffle_weight_permutation(cout: int, stride: int) -> jnp.ndarray:
    """perm such that w[..., perm] reorders PyTorch pixel-shuffle channel
    order (c*s*s + i*s + j) into shuffle-major order ((i*s + j)*C + c)."""
    s = stride
    c = cout // (s * s)
    idx = jnp.arange(cout)
    ij = idx // c
    cc = idx % c
    return cc * s * s + ij


def _pick_tile_h(h: int, w: int, cin: int, n_cols: int) -> int:
    """Largest TH dividing h with tiles comfortably inside VMEM."""
    budget = 6 * 1024 * 1024
    best = 1
    for th in range(1, h + 1):
        if h % th:
            continue
        in_bytes = 3 * th * (w + 2) * cin * 2 * 2  # 3 views, double-buffered
        acc_bytes = th * w * n_cols * 4
        if in_bytes + acc_bytes <= budget:
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
    out_squash: Optional[str] = None,  # "tanh" (default squash) | "sigmoid"
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """act(pixel_shuffle(conv3x3(x) + b)) [-> 1x1 head -> squash].

    x: [B, H, W, Cin]; w: [3, 3, Cin, Cout], Cout = C*stride**2 (PyTorch
    pixel-shuffle channel order).  Returns [B, H*s, W*s, C] (or [..., 3]
    with a fused head).
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    s = stride
    C = Cout // (s * s)
    with_head = head_w is not None
    c_final = head_w.shape[-1] if with_head else C

    perm = shuffle_weight_permutation(Cout, s)
    w2 = w[..., perm].astype(compute_dtype)  # [3,3,Cin, s*s*C] shuffle-major
    # pre-split by sub-row i -> [s, 3, 3, Cin, s*C]; BlockSpec hands each
    # program its slice (Mosaic rejects dynamic lane-dim slicing in-kernel)
    w3 = jnp.moveaxis(w2.reshape(3, 3, Cin, s, s * C), 3, 0)
    bias2 = (
        (b if b is not None else jnp.zeros((Cout,)))[perm]
        .astype(jnp.float32)
        .reshape(s, s * C)
    )
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(compute_dtype)
    # three row-shifted views supply the conv's dy taps without halo DMA
    x_rows = [xp[:, dy : dy + H] for dy in range(3)]
    hw = head_w[0, 0].astype(jnp.float32) if with_head else jnp.zeros((1, 1))
    hb = (
        head_b.astype(jnp.float32)
        if with_head and head_b is not None
        else jnp.zeros((c_final,), jnp.float32)
    )

    n_cols = s * C  # matmul N per program
    TH = _pick_tile_h(H, W, Cin, n_cols)
    grid = (B, H // TH, s)
    out_cols = s * c_final if with_head else s * C

    def kernel(x0_ref, x1_ref, x2_ref, w_ref, b_ref, hw_ref, hb_ref, out_ref):
        i = pl.program_id(2)
        rows = (x0_ref, x1_ref, x2_ref)
        acc = jnp.zeros((TH * W, n_cols), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                win = rows[dy][0, :, dx : dx + W, :].reshape(TH * W, Cin)
                acc += jnp.dot(
                    win,
                    w_ref[0, dy, dx],
                    preferred_element_type=jnp.float32,
                )
        acc += b_ref[i].reshape(1, n_cols)
        acc = activation(acc, act)
        if with_head:
            pieces = []
            for j in range(s):
                rgb = (
                    jnp.dot(
                        acc[:, j * C : (j + 1) * C],
                        hw_ref[:],
                        preferred_element_type=jnp.float32,
                    )
                    + hb_ref[:].reshape(1, c_final)
                )
                if out_squash == "sigmoid":
                    rgb = jax.nn.sigmoid(rgb)
                else:
                    rgb = (jnp.tanh(rgb) + 1.0) * 0.5
                pieces.append(rgb)
            acc = jnp.concatenate(pieces, axis=-1)  # [TH*W, s*c_final]
        out_ref[0, :, 0] = acc.reshape(TH, W, out_cols).astype(out_ref.dtype)

    row_spec = pl.BlockSpec(
        (1, TH, W + 2, Cin),
        lambda bi, ti, i: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_dtype = jnp.float32 if with_head else compute_dtype
    out5 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec,
            row_spec,
            row_spec,
            pl.BlockSpec(
                (1, 3, 3, Cin, n_cols),
                lambda bi, ti, i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # full (s, s*C) bias in VMEM; sub-row i indexes the sublane dim
            # in-kernel (a (1, n_cols) block would break the (8,128) rule)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, 1, W, out_cols),
            lambda bi, ti, i: (bi, ti, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, s, W, out_cols), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * Cin * Cout,
            bytes_accessed=xp.size * 2 * 3 + B * H * s * W * out_cols * 4,
            transcendentals=B * H * W * Cout,
        ),
        interpret=interpret,
    )(x_rows[0], x_rows[1], x_rows[2], w3, bias2, hw, hb)
    # free bitcast: [B, H, s, W, s*c] is row-major-identical to the target
    return out5.reshape(B, H * s, W * s, c_final)
