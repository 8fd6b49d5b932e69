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


def _pick_tile_h(h: int, w: int, cin: int, cout: int) -> int:
    """Largest TH dividing h with all tiles comfortably inside VMEM."""
    budget = 12 * 1024 * 1024
    best = 1
    for th in range(1, h + 1):
        if h % th:
            continue
        window = 2 * (th + 2) * (w + 2) * cin * 2  # double-buffered input
        im2col = th * w * 9 * cin * 2
        acc = th * w * cout * 4
        outb = 2 * th * w * cout * 2  # double-buffered output (bf16)
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

    TH = _pick_tile_h(H, W, Cin, Cout)
    grid = (B, H // TH)
    out_cols = s * c_final if with_head else s * C

    def kernel(x_ref, w_ref, b_ref, hw_ref, hb_ref, out_ref):
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


def fused_conv_ps_act_x2(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: Optional[jnp.ndarray],
    w2: jnp.ndarray,
    b2: Optional[jnp.ndarray],
    act: str = "swish",
    *,
    head_w: Optional[jnp.ndarray] = None,
    head_b: Optional[jnp.ndarray] = None,
    out_squash: Optional[str] = None,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """TWO chained stride-2 blocks (+ optional head) in one VMEM pass:

        y   = act(pixel_shuffle2(conv3x3(x,  w1) + b1))
        out = act(pixel_shuffle2(conv3x3(y,  w2) + b2))  [-> head -> squash]

    The intermediate ``y`` (177 MB/frame bf16 at Bunny-720p stage 5 input)
    never touches HBM.  Both pixel-shuffles use the shuffle-major weight
    permutation so they are pure row reindexing; the stage-2 conv consumes
    ``y`` directly from VMEM with a 2-row halo recomputed from the stage-1
    tile (one extra x-row of overlap per side).

    Shapes: x [B,H,W,C1]; w1 [3,3,C1,4*C2]; w2 [3,3,C2,4*C3];
    head_w [1,1,C3,3].  Output [B, 4H, 4W, C3] (or [..., 3] with head).
    """
    B, H, W, C1 = x.shape
    s = 2
    C2 = w1.shape[-1] // 4
    C3 = w2.shape[-1] // 4
    with_head = head_w is not None
    c_final = head_w.shape[-1] if with_head else C3

    # pre-split per shuffle position (i*2+j) so each in-kernel matmul output
    # is a whole, offset-0 vector — Mosaic rejects concats/reshapes of lane
    # slices taken at non-128-aligned offsets
    p1 = shuffle_weight_permutation(w1.shape[-1], s)
    w1p = (
        w1[..., p1]
        .astype(compute_dtype)
        .reshape(9 * C1, 4, C2)
        .transpose(1, 0, 2)
    )  # [4, 9*C1, C2]
    b1p = (
        (b1 if b1 is not None else jnp.zeros((w1.shape[-1],)))[p1]
        .astype(jnp.float32)
        .reshape(4, 1, C2)
    )
    p2 = shuffle_weight_permutation(w2.shape[-1], s)
    w2p = (
        w2[..., p2]
        .astype(compute_dtype)
        .reshape(9 * C2, 4, C3)
        .transpose(1, 0, 2)
    )  # [4, 9*C2, C3]
    b2p = (
        (b2 if b2 is not None else jnp.zeros((w2.shape[-1],)))[p2]
        .astype(jnp.float32)
        .reshape(4, 1, C3)
    )
    xp = jnp.pad(x, ((0, 0), (2, 2), (1, 1), (0, 0))).astype(compute_dtype)
    hw = head_w[0, 0].astype(jnp.float32) if with_head else jnp.zeros((1, 1))
    hb = (
        head_b.astype(jnp.float32)
        if with_head and head_b is not None
        else jnp.zeros((c_final,), jnp.float32)
    )

    # tile: TXH x-rows -> 2*TXH y-rows -> 4*TXH output rows
    TXH = 1
    while TXH < H:
        cand = TXH * 2
        if H % cand:
            break
        win_b = (cand + 4) * (W + 2) * C1 * 2 * 2
        col1 = cand * W * 9 * C1 * 2
        y_b = (2 * cand + 2) * (2 * W + 2) * C2 * 2
        col2 = 2 * cand * 2 * W * 9 * C2 * 2
        acc2 = 2 * cand * 2 * W * 4 * C3 * 4
        if win_b + col1 + y_b + col2 + acc2 > 8 * 1024 * 1024:
            break
        TXH = cand
    grid = (B, H // TXH)
    out_cols = s * c_final if with_head else s * C3
    TY = 2 * TXH  # y rows produced per tile (without halo)

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, hw_ref, hb_ref, out_ref):
        # ---- stage 1: compute y rows [-1 .. TY+1) (2-row halo for conv2)
        # x_ref block: rows [ti*TXH - 2 .. ti*TXH + TXH + 2) of padded x,
        # i.e. TXH + 4 rows; conv1 over them yields TXH + 2 x-level rows ->
        # 2*(TXH+2) = TY + 4 y rows; we need TY + 2 (1-row halo each side),
        # so drop the outermost y row on each side after shuffling.
        nx = TXH + 2
        taps1 = [
            x_ref[0, dy : dy + nx, dx : dx + W, :].reshape(nx * W, C1)
            for dy in range(3)
            for dx in range(3)
        ]
        win1 = jnp.concatenate(taps1, axis=-1)
        # one matmul per shuffle position (i*2+j): each y sub-grid is a
        # whole matmul output (offset-0 layout), so the interleaving stacks
        # below are Mosaic-legal
        y_grid = []
        for k in range(4):
            acc = jnp.dot(
                win1, w1_ref[k], preferred_element_type=jnp.float32
            )
            acc += b1_ref[k]
            y_grid.append(activation(acc, act).reshape(nx, W, C2))
        # cols (w, j) interleave to y col 2w+j; rows (r, i) to y row 2r+i
        y_rows = [
            jnp.stack([y_grid[i * 2], y_grid[i * 2 + 1]], axis=2).reshape(
                nx, 2 * W, C2
            )
            for i in range(2)
        ]
        y_full = jnp.stack(y_rows, axis=1).reshape(2 * nx, 2 * W, C2)
        y = y_full[1 : 1 + TY + 2]  # TY + 2 rows: 1-halo, TY, 1-halo
        # stage-2 SAME padding means the halo OUTSIDE the image is zero, but
        # at the global top/bottom the rows above were computed from x's
        # padding (conv-of-padding != zero) — mask them out
        ti = pl.program_id(1)
        row_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (TY + 2, 1, 1), 0)
            + ti * TY
            - 1
        )
        y = jnp.where((row_ids >= 0) & (row_ids < 2 * H), y, 0.0)
        y = jnp.pad(y, ((0, 0), (1, 1), (0, 0))).astype(compute_dtype)

        # ---- stage 2 over y
        taps2 = [
            y[dy : dy + TY, dx : dx + 2 * W, :].reshape(TY * 2 * W, C2)
            for dy in range(3)
            for dx in range(3)
        ]
        win2 = jnp.concatenate(taps2, axis=-1)
        for i in range(2):
            parts = []
            for j in range(2):
                k = i * 2 + j
                acc = jnp.dot(
                    win2, w2_ref[k], preferred_element_type=jnp.float32
                )
                acc += b2_ref[k]
                acc = activation(acc, act)  # [TY*2W, C3]
                if with_head:
                    acc = (
                        jnp.dot(
                            acc, hw_ref[:], preferred_element_type=jnp.float32
                        )
                        + hb_ref[:].reshape(1, c_final)
                    )
                    if out_squash == "sigmoid":
                        acc = jax.nn.sigmoid(acc)
                    else:
                        acc = (jnp.tanh(acc) + 1.0) * 0.5
                parts.append(acc)
            piece = jnp.concatenate(parts, axis=-1)  # [TY*2W, 2*(C3|3)]
            out_ref[0, :, i] = piece.reshape(TY, 2 * W, out_cols).astype(
                out_ref.dtype
            )

    window_spec = pl.BlockSpec(
        (
            pl.Element(1),
            pl.Element(TXH + 4),
            pl.Element(W + 2),
            pl.Element(C1),
        ),
        lambda bi, ti: (bi, ti * TXH, 0, 0),
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
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TY, s, 2 * W, out_cols),
            lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H, s, 2 * W, out_cols), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * C1 * 4 * C2
            + 2 * 9 * B * 4 * H * W * C2 * 4 * C3,
            bytes_accessed=xp.size * 2 + B * 16 * H * W * c_final * 4,
            transcendentals=B * H * W * (4 * C2 + 16 * C3),
        ),
        interpret=interpret,
    )(xp, w1p, b1p, w2p, b2p, hw, hb)
    return out5.reshape(B, 4 * H, 4 * W, c_final)
