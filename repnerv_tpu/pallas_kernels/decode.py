"""Fused decode kernels: conv3x3 + bias + PixelShuffle + activation (+ head).

The deploy-mode NeRV block is ``act(pixel_shuffle(conv3x3(x)))`` (reference
model.py:518-567).  Under XLA the conv output [H, W, C*s*s] round-trips
through HBM and the pixel-shuffle transpose copies it again — at Bunny-720p
stage 5 that intermediate is 177 MB/frame in bf16.  This kernel keeps the
whole block in VMEM and writes only final pixels; measured end-to-end it
decodes ~30% faster than the XLA lowering (BENCHMARKS.md).

Mosaic-friendly formulation (no lane-splitting reshapes, no dynamic lane
slices, no manual DMA):

* Grid (batch, H-row-tiles).  The input row window WITH its 3x3 halo is a
  single overlapping block: all dims ``pl.Element``-indexed over the
  zero-padded input, start ``ti*TH`` (overlap is legal with element
  indexing; Mosaic pipelines the fetches).
* The fused conv weights are pre-permuted host-side so output channel
  ``(i*s + j)*C + c`` holds what PyTorch-ordered channel ``c*s*s + i*s + j``
  held — after this, pixel-shuffle is pure row/column reindexing.
* The conv is ONE im2col MXU matmul [TH*W, 9*Cin] @ [9*Cin, s*s*C] with f32
  accumulation (the lane-dim concat building im2col is VPU-cheap and the
  big K amortizes MXU passes), then bias + activation.
* Sub-row ``i`` is a static python loop: columns ``[i*s*C:(i+1)*s*C]`` slice
  statically and one supported reshape [TH*W, s*C] -> [TH, W, s*C] (minor
  dim unchanged) writes output plane ``out[:, :, i]``.
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


def _pick_tile_h(h: int, w: int, cin: int, cout: int, el_bytes: int = 2) -> int:
    """Largest TH dividing h with all tiles comfortably inside VMEM.

    ``el_bytes`` is the compute dtype's size — an f32 graph doubles every
    buffer vs bf16, and sizing with the wrong element width overflows the
    16 MB scoped-VMEM limit at the 720p stage-4 shape (round-2 regression
    caught by the eval CLI on f32 deploy graphs)."""
    budget = 12 * 1024 * 1024
    best = 1
    for th in range(1, h + 1):
        if h % th:
            continue
        window = 2 * (th + 2) * (w + 2) * cin * el_bytes  # double-buffered in
        im2col = th * w * 9 * cin * el_bytes
        acc = th * w * cout * 4
        outb = 2 * th * w * cout * el_bytes  # double-buffered output
        if window + im2col + acc + outb <= budget:
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
    bias2 = (b if b is not None else jnp.zeros((Cout,)))[perm].astype(
        jnp.float32
    ).reshape(1, Cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(compute_dtype)
    hw = head_w[0, 0].astype(jnp.float32) if with_head else jnp.zeros((1, 1))
    hb = (
        head_b.astype(jnp.float32)
        if with_head and head_b is not None
        else jnp.zeros((c_final,), jnp.float32)
    )

    TH = _pick_tile_h(H, W, Cin, Cout, el_bytes=jnp.dtype(compute_dtype).itemsize)
    grid = (B, H // TH)
    out_cols = s * c_final if with_head else s * C

    def kernel(x_ref, w_ref, b_ref, hw_ref, hb_ref, out_ref):
        if TH == 1:
            # at TH == 1 the tap reshape is a pure squeeze, the 9 taps keep
            # shifted sublane/lane offsets, and Mosaic rejects the concat
            # ("offset mismatch on non-concat dimension") — accumulate nine
            # K=Cin matmuls instead (see pallas_kernels/train_tail.py)
            acc = None
            for dy in range(3):
                for dx in range(3):
                    tap = x_ref[0, dy : dy + TH, dx : dx + W, :].reshape(
                        TH * W, Cin
                    )
                    part = jnp.dot(
                        tap, w_ref[dy, dx],
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
        else:
            taps = [
                x_ref[0, dy : dy + TH, dx : dx + W, :].reshape(TH * W, Cin)
                for dy in range(3)
                for dx in range(3)
            ]
            win = jnp.concatenate(taps, axis=-1)  # [TH*W, 9*Cin]
            acc = jnp.dot(
                win,
                w_ref[:].reshape(9 * Cin, Cout),
                preferred_element_type=jnp.float32,
            )
        acc += b_ref[:]
        acc = activation(acc, act)
        for i in range(s):
            piece = acc[:, i * s * C : (i + 1) * s * C]  # [TH*W, s*C]
            if with_head:
                parts = []
                for j in range(s):
                    rgb = (
                        jnp.dot(
                            piece[:, j * C : (j + 1) * C],
                            hw_ref[:],
                            preferred_element_type=jnp.float32,
                        )
                        + hb_ref[:].reshape(1, c_final)
                    )
                    if out_squash == "sigmoid":
                        rgb = jax.nn.sigmoid(rgb)
                    else:
                        rgb = (jnp.tanh(rgb) + 1.0) * 0.5
                    parts.append(rgb)
                piece = jnp.concatenate(parts, axis=-1)  # [TH*W, s*c_final]
            out_ref[0, :, i] = piece.reshape(TH, W, out_cols).astype(
                out_ref.dtype
            )

    window_spec = pl.BlockSpec(
        (
            pl.Element(1),
            pl.Element(TH + 2),
            pl.Element(W + 2),
            pl.Element(Cin),
        ),  # overlapping halo window; Mosaic wants all-or-none Element dims
        lambda bi, ti: (bi, ti * TH, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_dtype = jnp.float32 if with_head else compute_dtype
    out5 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            window_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, s, W, out_cols),
            lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, s, W, out_cols), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * Cin * Cout,
            bytes_accessed=xp.size * 2 + B * H * s * W * out_cols * 4,
            transcendentals=B * H * W * Cout,
        ),
        interpret=interpret,
    )(xp, w2, bias2, hw, hb)
    # free bitcast: [B, H, s, W, s*c] is row-major-identical to the target
    return out5.reshape(B, H * s, W * s, c_final)
