"""Fused TRAINING forward for trailing NeRV stages, with a custom VJP.

Round-3 profiling of the quality-critical ``-b 1`` regime (the reference's
exact schedule, main_train.py:229) showed the XLA lowering of
``act(pixel_shuffle(conv(x))) [-> head -> squash]`` collapses at batch 1:
the pixel-shuffle transpose cannot host fused epilogues, so the swish and
the 1x1 head each force full-resolution HBM round-trips in layouts the
neighboring convs reject — the 720p stage-5 tail measured 4.7 ms against
a ~1.3 ms roofline, and layout-change copies alone cost ~10 ms of the
34.5 ms step (BENCHMARKS.md round 3).

The fix reuses the decode kernel's formulation (pallas_kernels/decode.py)
for the training forward: one im2col MXU matmul per row tile computes
conv+bias, the activation and optional fused RGB head run on the VMEM
tile, and the kernel ALSO writes the pre-activation tensor ``z`` (the
only residual the backward needs).  The backward is plain XLA on
standard-layout tensors — elementwise act'/squash' chains, one channel
un-permute transpose, and the conv dX/dW pair via ``jax.vjp`` — which at
these shapes runs at its isolated (fast) speed because no pixel-shuffle
transpose poisons layout assignment.

Note the contrast with round 2's rejected Pallas *conv* custom_vjp
(models/blocks.py docstring): replacing only the conv broke XLA's
conv<->elementwise fusions and lost 16% end-to-end.  Here the kernel
absorbs exactly the ops XLA fails to fuse at b=1, and wins ~2x.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.layers import activation
from .decode import shuffle_weight_permutation

# tests monkeypatch these to exercise the kernel off-TPU
INTERPRET = False

# Round-4: the epilogue BACKWARD is fused too (one Pallas kernel per stage
# computing squash'/head grads, the activation VJP, the shuffle-major ->
# conv-order relayout, and the bias-grad partials); only the conv dX/dW
# pair stays in XLA.  The round-4 roofline (BENCHMARKS "b=1 training
# roofline") measured ~1 ms of dispatch/latency floor PER serial op group
# on this backend — the XLA epilogue backward is 4-6 such groups per
# trailing stage, all latency-bound at b=1.  Tests flip this off to pin
# the two paths against each other.
FUSED_BWD = True


def _pick_tile_h(h: int, w: int, cin: int, cout: int, el_bytes: int) -> int:
    """Like decode._pick_tile_h but budgets the extra double-buffered
    pre-activation output tile.

    The 12 MB budget is measured, not guessed: raising it to 14 MB to
    fit the 1080p stage-5 row (540x960, Cin 96, Cout 384; 13.64 MB
    accounted at TH=2, which would keep the single K=9*Cin matmul form)
    compiles to a 17.38 MB scoped allocation — Mosaic's stack
    temporaries add ~3.7 MB on top of this accounting — and trips the
    16 MB limit on-chip.  That stage therefore runs the TH=1
    nine-matmul form by design."""
    budget = 12 * 1024 * 1024
    best = 1
    for th in range(1, h + 1):
        if h % th:
            continue
        window = 2 * (th + 2) * (w + 2) * cin * el_bytes
        im2col = th * w * 9 * cin * el_bytes
        acc = th * w * cout * 4
        outb = 2 * th * w * cout * el_bytes  # final output
        zb = 2 * th * w * cout * el_bytes  # pre-activation residual
        if window + im2col + acc + outb + zb <= budget:
            best = th
        else:
            break
    return best


def _fused_fwd_kernel_call(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    head_w: Optional[jnp.ndarray],
    head_b: Optional[jnp.ndarray],
    stride: int,
    act: str,
    squash: str,
    compute_dtype,
    interpret: bool,
):
    """Returns (out [B,Hs,Ws,c_final], z5 [B,H,s,W,s*C] pre-activation)."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    s = stride
    C = Cout // (s * s)
    with_head = head_w is not None
    c_final = head_w.shape[-1] if with_head else C

    perm = shuffle_weight_permutation(Cout, s)
    w2 = w[..., perm].astype(compute_dtype)
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

    el = jnp.dtype(compute_dtype).itemsize
    TH = _pick_tile_h(H, W, Cin, Cout, el)
    grid = (B, H // TH)
    out_cols = s * c_final if with_head else s * C

    def kernel(x_ref, w_ref, b_ref, hw_ref, hb_ref, out_ref, z_ref):
        if TH == 1:
            # no-concat form: at TH == 1 the tap reshape is a pure squeeze,
            # so the 9 taps keep their shifted sublane/lane offsets and
            # Mosaic rejects the concat ("result/input offset mismatch on
            # non-concat dimension" — hit at the 1080p stage-5 geometry,
            # whose W=960 row forces TH to 1).  Nine accumulated K=Cin
            # matmuls sidestep the layout constraint; TH > 1 keeps the
            # single K=9*Cin matmul (its reshape copies taps to canonical
            # offsets, and the wider K wastes less MXU padding).
            acc = None
            for dy in range(3):
                for dx in range(3):
                    tap = x_ref[0, dy : dy + TH, dx : dx + W, :].reshape(
                        TH * W, Cin
                    )
                    part = jnp.dot(
                        tap,
                        w_ref[dy, dx],
                        preferred_element_type=jnp.float32,
                    )
                    acc = part if acc is None else acc + part
        else:
            taps = [
                x_ref[0, dy : dy + TH, dx : dx + W, :].reshape(TH * W, Cin)
                for dy in range(3)
                for dx in range(3)
            ]
            win = jnp.concatenate(taps, axis=-1)
            acc = jnp.dot(
                win,
                w_ref[:].reshape(9 * Cin, Cout),
                preferred_element_type=jnp.float32,
            )
        acc += b_ref[:]
        post = activation(acc, act)
        for i in range(s):
            z_ref[0, :, i] = (
                acc[:, i * s * C : (i + 1) * s * C]
                .reshape(TH, W, s * C)
                .astype(z_ref.dtype)
            )
            piece = post[:, i * s * C : (i + 1) * s * C]
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
                    if squash == "sigmoid":
                        rgb = jax.nn.sigmoid(rgb)
                    else:
                        rgb = (jnp.tanh(rgb) + 1.0) * 0.5
                    parts.append(rgb)
                piece = jnp.concatenate(parts, axis=-1)
            out_ref[0, :, i] = piece.reshape(TH, W, out_cols).astype(
                out_ref.dtype
            )

    window_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(TH + 2), pl.Element(W + 2), pl.Element(Cin)),
        lambda bi, ti: (bi, ti * TH, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_dtype = jnp.float32 if with_head else compute_dtype
    out5, z5 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            window_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, TH, s, W, out_cols),
                lambda bi, ti: (bi, ti, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TH, s, W, s * C),
                lambda bi, ti: (bi, ti, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, s, W, out_cols), out_dtype),
            jax.ShapeDtypeStruct((B, H, s, W, s * C), compute_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * Cin * Cout,
            bytes_accessed=xp.size * el
            + 2 * B * H * s * W * out_cols * el,
            transcendentals=B * H * W * Cout,
        ),
        interpret=interpret,
    )(xp, w2, bias2, hw, hb)
    return out5.reshape(B, H * s, W * s, c_final), z5


def _pick_tile_h_bwd(
    h: int, w: int, cout: int, s: int, c_final_s: int, with_head: bool, el: int
) -> int:
    """Tile-height picker for the epilogue-backward kernel: budgets the
    double-buffered z5/ct (+out) input tiles, the d_conv output tile, and
    the kernel body's scoped-stack scratch.

    The scratch term is calibrated against Mosaic's own accounting: the
    on-chip compile of the 720p head stage at TH=3 (W=640, Cout=384)
    reported a 26.27 MiB scoped-stack allocation against the backend's
    16 MiB limit — ~9.3 live f32 copies of the [TH*W, Cout] tile (z_i
    f32 casts, the act-VJP primal/cotangent pair per sub-row, d_cols,
    the d_acc concat and its cast).  Charging 10 copies keeps every
    shape under the limit with margin (the same stage lands at TH=1,
    ~8.8 MiB scoped)."""
    budget = 14 * 1024 * 1024
    best = 1
    for th in range(1, h + 1):
        if h % th:
            continue
        z_in = 2 * th * w * cout * el
        ct_in = 2 * th * w * s * c_final_s * (4 if with_head else el)
        out_in = 2 * th * w * s * c_final_s * 4 if with_head else 0
        d_out = 2 * th * w * cout * el
        scratch = 10 * th * w * cout * 4  # f32 body intermediates (see doc)
        if z_in + ct_in + out_in + d_out + scratch <= budget:
            best = th
        else:
            break
    return best


def _fused_bwd_kernel_call(
    z5: jnp.ndarray,
    ct: jnp.ndarray,
    out: Optional[jnp.ndarray],
    head_w: Optional[jnp.ndarray],
    stride: int,
    act: str,
    squash: str,
    compute_dtype,
    interpret: bool,
):
    """Fused epilogue backward for one trailing stage.

    Inputs: z5 [B,H,s,W,s*C] pre-activation (as the forward kernel wrote
    it), ct — the incoming cotangent viewed shuffle-major
    [B,H,s,W,s*c_final] — and, with a head, the saved squashed output in
    the same 5D view plus the 1x1 head weight.

    Returns (d_conv [B,H,W,Cout] in the PERMUTED channel order,
             d_b_part [B,H/TH,Cout] f32 partials,
             d_hw_part [B,H/TH,C,c_final] f32 partials | None,
             d_hb_part [B,H/TH,c_final] f32 partials | None).

    Everything the XLA backward ran as 4-6 serial full-resolution kernels
    (squash' chain, head grads, activation VJP, the (s,W) transpose, the
    bias reduction) happens on one VMEM tile per grid step.
    """
    B, H, s, W, sC = z5.shape
    C = sC // s
    Cout = s * s * C
    with_head = head_w is not None
    c_final = head_w.shape[-1] if with_head else C

    hw = head_w[0, 0].astype(jnp.float32) if with_head else jnp.zeros((1, 1))
    el = jnp.dtype(compute_dtype).itemsize
    TH = _pick_tile_h_bwd(H, W, Cout, s, s * c_final, with_head, el)
    grid = (B, H // TH)
    n_tiles = H // TH

    def kernel(z_ref, ct_ref, out_ref, hw_ref, dconv_ref, db_ref, dhw_ref, dhb_ref):
        d_cols = []
        dhw_acc = jnp.zeros((C, c_final), jnp.float32) if with_head else None
        dhb_acc = jnp.zeros((1, c_final), jnp.float32) if with_head else None
        for i in range(s):
            z_i = z_ref[0, :, i].reshape(TH * W, sC)
            if with_head:
                ct_i = ct_ref[0, :, i].reshape(TH * W, s * c_final)
                out_i = out_ref[0, :, i].reshape(TH * W, s * c_final)
                d_a_parts = []
                for j in range(s):
                    ct_ij = ct_i[:, j * c_final : (j + 1) * c_final].astype(
                        jnp.float32
                    )
                    o_ij = out_i[:, j * c_final : (j + 1) * c_final]
                    if squash == "sigmoid":
                        d_h = ct_ij * o_ij * (1.0 - o_ij)
                    else:  # (tanh+1)/2
                        u = 2.0 * o_ij - 1.0
                        d_h = ct_ij * 0.5 * (1.0 - u * u)
                    a_ij = activation(
                        z_i[:, j * C : (j + 1) * C].astype(jnp.float32), act
                    )
                    dhw_acc = dhw_acc + jnp.dot(
                        a_ij.T, d_h, preferred_element_type=jnp.float32
                    )
                    dhb_acc = dhb_acc + jnp.sum(d_h, axis=0, keepdims=True)
                    d_a_parts.append(
                        jnp.dot(
                            d_h.astype(compute_dtype),
                            hw_ref[:].T.astype(compute_dtype),
                            preferred_element_type=jnp.float32,
                        )
                    )
                d_a_i = jnp.concatenate(d_a_parts, axis=-1)
            else:
                d_a_i = ct_ref[0, :, i].reshape(TH * W, sC).astype(jnp.float32)
            # activation VJP on the tile (the primal act(z) fuses in; at
            # b=1 transcendentals are free — BENCHMARKS round 2)
            _, act_vjp = jax.vjp(
                lambda t: activation(t, act), z_i.astype(jnp.float32)
            )
            (d_z_i,) = act_vjp(d_a_i)
            d_cols.append(d_z_i)
        # inverse of the forward's per-i column writes: d_acc's column
        # block i is tile-row-major d_z for sub-row i — the (s, W)
        # "transpose" happens here as a pure VMEM concat, never in HBM
        d_acc = jnp.concatenate(d_cols, axis=-1)  # [TH*W, Cout] f32
        dconv_ref[0] = d_acc.reshape(TH, W, Cout).astype(dconv_ref.dtype)
        db_ref[0, 0] = jnp.sum(d_acc, axis=0, dtype=jnp.float32).reshape(
            1, Cout
        )
        if with_head:
            dhw_ref[0, 0] = dhw_acc[None]
            dhb_ref[0, 0] = dhb_acc

    ct5 = ct.reshape(B, H, s, W, s * c_final)
    out5 = (
        out.reshape(B, H, s, W, s * c_final)
        if with_head
        else jnp.zeros((1, 1, 1, 1, 1), jnp.float32)
    )
    tile = lambda *shape: pl.BlockSpec(  # noqa: E731
        (1, TH, *shape), lambda bi, ti: (bi, ti, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = [
        pl.BlockSpec(
            (1, TH, W, Cout), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, 1, Cout), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, 1, C, c_final), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, 1, c_final), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, H, W, Cout), compute_dtype),
        jax.ShapeDtypeStruct((B, n_tiles, 1, Cout), jnp.float32),
        jax.ShapeDtypeStruct((B, n_tiles, 1, C, c_final), jnp.float32),
        jax.ShapeDtypeStruct((B, n_tiles, 1, c_final), jnp.float32),
    ]
    in_specs = [
        tile(s, W, sC),
        tile(s, W, s * c_final),
        tile(s, W, s * c_final) if with_head else full,
        full,
    ]
    d_conv, d_b_part, d_hw_part, d_hb_part = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=outs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * (s * s) * C * (2 * c_final if with_head else 1),
            bytes_accessed=2 * z5.size * el + B * H * W * Cout * el,
            transcendentals=B * H * W * Cout,
        ),
        interpret=interpret,
    )(z5, ct5.astype(jnp.float32 if with_head else compute_dtype), out5, hw)
    if not with_head:
        d_hw_part = d_hb_part = None
    return d_conv, d_b_part, d_hw_part, d_hb_part


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_stage_train(
    x, w, b, head_w, head_b, stride: int, act: str, squash: str, cdt_name: str
):
    """act(pixel_shuffle(conv3x3(x) + b)) [-> 1x1 head -> squash], trainable.

    Differentiable in x, w, b (and head_w/head_b when present).  ``cdt_name``
    is the compute dtype name ("bfloat16"/"float32") — a string so
    custom_vjp's nondiff args stay hashable.
    """
    out, _ = _fused_fwd_kernel_call(
        x, w, b, head_w, head_b, stride, act, squash,
        jnp.dtype(cdt_name), INTERPRET,
    )
    return out


def _fst_fwd(x, w, b, head_w, head_b, stride, act, squash, cdt_name):
    out, z5 = _fused_fwd_kernel_call(
        x, w, b, head_w, head_b, stride, act, squash,
        jnp.dtype(cdt_name), INTERPRET,
    )
    return out, (x, w, head_w, z5, out)


def _fst_bwd(stride, act, squash, cdt_name, res, ct):
    x, w, head_w, z5, out = res
    cdt = jnp.dtype(cdt_name)
    B, H, s, W, _ = z5.shape
    Cout = w.shape[-1]
    C = Cout // (s * s)
    with_head = head_w is not None
    perm = shuffle_weight_permutation(Cout, s)

    if FUSED_BWD:
        # ONE kernel for the whole epilogue backward (BENCHMARKS "b=1
        # training roofline": the XLA chain below is 4-6 serial kernels,
        # each paying the ~1 ms per-dispatch floor at b=1)
        d_conv_w2, d_b_part, d_hw_part, d_hb_part = _fused_bwd_kernel_call(
            z5, ct, out if with_head else None, head_w,
            stride, act, squash, cdt, INTERPRET,
        )

        def conv_primal_f(xx, ww2):
            return jax.lax.conv_general_dilated(
                xx.astype(cdt), ww2.astype(cdt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        _, conv_vjp = jax.vjp(conv_primal_f, x, w[..., perm])
        d_x, d_w2 = conv_vjp(d_conv_w2.astype(cdt))
        d_w = jnp.zeros_like(d_w2).at[..., perm].set(d_w2)
        d_b = jnp.zeros((Cout,), jnp.float32).at[perm].set(
            jnp.sum(d_b_part, axis=(0, 1, 2))
        )
        if with_head:
            d_hw = jnp.sum(d_hw_part, axis=(0, 1, 2)).reshape(head_w.shape)
            d_hb = jnp.sum(d_hb_part, axis=(0, 1, 2))
        else:
            d_hw = d_hb = None
        return (d_x.astype(x.dtype), d_w, d_b, d_hw, d_hb)

    # pre-activation in logical NHWC at full resolution (free bitcast).
    # The whole elementwise chain runs in the COMPUTE dtype — the XLA path
    # this replaces backpropagates in bf16 too, and f32 here doubled the
    # HBM traffic of every 720p-sized op (round-3 trace: the f32 variant
    # spent ~4 ms/step more in d_z reshapes/copies).
    z = z5.reshape(B, H * s, W * s, C)

    if with_head:
        # out = squash(act(z) @ hw + hb); recover squash' from out itself
        a = activation(z, act)
        ctc = ct.astype(jnp.float32)
        if squash == "sigmoid":
            d_h = ctc * out * (1.0 - out)
        else:  # (tanh+1)/2
            u = 2.0 * out - 1.0
            d_h = ctc * 0.5 * (1.0 - u * u)
        hw2 = head_w[0, 0]
        d_hw = jnp.einsum(
            "bhwc,bhwo->co",
            a.astype(jnp.float32),
            d_h,
            preferred_element_type=jnp.float32,
        ).reshape(head_w.shape)
        d_hb = jnp.sum(d_h, axis=(0, 1, 2))
        d_a = jnp.einsum(
            "bhwo,co->bhwc", d_h.astype(cdt), hw2.astype(cdt)
        )
    else:
        d_a = ct.astype(cdt)
        d_hw = d_hb = None

    # activation VJP (elementwise, fuses cleanly on standard layouts)
    _, act_vjp = jax.vjp(lambda t: activation(t, act), z)
    (d_z,) = act_vjp(d_a.astype(z.dtype))

    # back to conv-output space: un-bitcast to 5D, swap (s, W), un-permute
    # channels from shuffle-major to the torch conv order
    d_z5 = d_z.reshape(B, H, s, W, s * C)
    d_conv_w2 = d_z5.transpose(0, 1, 3, 2, 4).reshape(B, H, W, Cout)
    perm = shuffle_weight_permutation(Cout, s)

    def conv_primal(xx, ww2):
        return jax.lax.conv_general_dilated(
            xx.astype(cdt),
            ww2.astype(cdt),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    w2 = w[..., perm]
    _, conv_vjp = jax.vjp(conv_primal, x, w2)
    d_x, d_w2 = conv_vjp(d_conv_w2.astype(cdt))
    # w2 = w[..., perm]  =>  d_w[..., perm] accumulates d_w2
    d_w = jnp.zeros_like(d_w2).at[..., perm].set(d_w2)
    # bias2 = b[perm] => scatter the permuted-space bias grad back
    d_b = jnp.zeros((Cout,), jnp.float32).at[perm].set(
        jnp.sum(d_conv_w2, axis=(0, 1, 2), dtype=jnp.float32)
    )
    return (d_x.astype(x.dtype), d_w, d_b, d_hw, d_hb)


fused_stage_train.defvjp(_fst_fwd, _fst_bwd)
