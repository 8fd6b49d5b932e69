"""int8 fused decode: conv3x3(int8) + dequant + bias + PixelShuffle + act.

The bf16 decode kernel (decode.py) runs at ~93% of this chip's measured
bf16 MXU peak — the remaining decode headroom is algorithmic.  Stage 5 of
the paper config is 76% of decode FLOPs and stage 4 another 19%
(BENCHMARKS.md), so the trailing stages run int8 here.  Measured: the
int8 MATMUL lowers at ~the bf16 MXU rate on this chip (not the datasheet
2x int8 figure), so the realized win — +26% at the stage-5 kernel, +17%
end-to-end (525 vs 449 fps), at a calibrated 0.15 dB — comes from halving
the HBM traffic of the halo windows and outputs.

Quantization scheme (symmetric, no zero point — SAME-padding zeros stay
exact):

* weights: per-output-channel ``w_q[.., oc] = round(w / sw[oc])`` with
  ``sw[oc] = max|w[.., oc]| / 127``, materialized once at deploy time.
* activations: one static per-stage scale ``sx = amax_in / 127`` from a
  calibration decode (models/generator.py calibrate_int8); the producing
  stage REQUANTIZES its output to int8 inside the kernel, so chained int8
  stages pass int8 through HBM (half the bf16 traffic).
* kernel: ONE im2col MXU matmul [TH*W, 9*Cin]i8 @ [9*Cin, Cout]i8 with
  int32 accumulation, then the f32 epilogue on the VPU:
  ``act(i32 * (sx*sw[oc]) + bias[oc])`` -> pixel-shuffle reindex ->
  either requant-to-int8 (chained stage) or the fused 1x1 RGB head +
  squash (final stage, f32 out).

This is an inference-only path (reference main_eval.py measures decode FPS
on the deploy graph, main_eval.py:753-784); training and the compression
pipeline are untouched.  Accuracy cost is measured and reported next to
the fps win in BENCHMARKS.md.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.layers import activation
from .decode import shuffle_weight_permutation


def quantize_weight_int8(w: jnp.ndarray):
    """Per-output-channel symmetric int8: w [..., Cout] -> (w_q, sw)."""
    amax = jnp.max(jnp.abs(w.reshape(-1, w.shape[-1])), axis=0)
    sw = jnp.maximum(amax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    return w_q, sw.astype(jnp.float32)


def quantize_act_int8(x: jnp.ndarray, sx: jnp.ndarray) -> jnp.ndarray:
    """Symmetric activation quant with a static scale (host/XLA side)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(
        jnp.int8
    )


def _pick_tile_h_int8(h: int, w: int, cin: int, cout: int) -> int:
    budget = 12 * 1024 * 1024
    best = 1
    for th in range(1, h + 1):
        if h % th:
            continue
        window = 2 * (th + 2) * (w + 2) * cin  # double-buffered int8 input
        im2col = th * w * 9 * cin
        acc = th * w * cout * 4  # int32 accumulator + f32 epilogue
        outb = 2 * th * w * cout * 4  # conservative: f32-out double buffer
        if window + im2col + acc + outb <= budget:
            best = th
        else:
            break
    return best


def fused_conv_ps_act_int8(
    x_q: jnp.ndarray,
    w_q: jnp.ndarray,
    scale: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: int,
    act: str = "swish",
    *,
    out_scale: Optional[jnp.ndarray] = None,
    head_w: Optional[jnp.ndarray] = None,
    head_b: Optional[jnp.ndarray] = None,
    out_squash: Optional[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """act(pixel_shuffle(dequant(conv3x3_int8(x_q)) + bias)) [-> head|requant].

    x_q: [B, H, W, Cin] int8; w_q: [3, 3, Cin, Cout] int8 (PyTorch
    pixel-shuffle channel order); scale: [Cout] f32 = sx * sw (input scale
    folded into the per-channel weight scale); bias: [Cout] f32.

    Exactly one of ``out_scale`` / ``head_w`` must be set: ``out_scale``
    (scalar f32) requantizes the activated output to int8 for the next int8
    stage; ``head_w`` fuses the 1x1 RGB head + squash and returns f32.
    """
    B, H, W, Cin = x_q.shape
    Cout = w_q.shape[-1]
    s = stride
    C = Cout // (s * s)
    with_head = head_w is not None
    assert (out_scale is None) == with_head, "need exactly one output mode"
    c_final = head_w.shape[-1] if with_head else C

    perm = shuffle_weight_permutation(Cout, s)
    w2 = w_q[..., perm]
    scale2 = scale[perm].astype(jnp.float32).reshape(1, Cout)
    bias2 = (bias if bias is not None else jnp.zeros((Cout,)))[perm].astype(
        jnp.float32
    ).reshape(1, Cout)
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hw = head_w[0, 0].astype(jnp.float32) if with_head else jnp.zeros((1, 1))
    hb = (
        head_b.astype(jnp.float32)
        if with_head and head_b is not None
        else jnp.zeros((c_final,), jnp.float32)
    )
    inv_out = (
        jnp.float32(0.0) if with_head else (1.0 / out_scale).astype(jnp.float32)
    ).reshape(1, 1)

    TH = _pick_tile_h_int8(H, W, Cin, Cout)
    grid = (B, H // TH)
    out_cols = s * c_final if with_head else s * C

    def kernel(x_ref, w_ref, sc_ref, b_ref, hw_ref, hb_ref, io_ref, out_ref):
        taps = [
            x_ref[0, dy : dy + TH, dx : dx + W, :].reshape(TH * W, Cin)
            for dy in range(3)
            for dx in range(3)
        ]
        win = jnp.concatenate(taps, axis=-1)  # [TH*W, 9*Cin] int8
        acc = jnp.dot(
            win,
            w_ref[:].reshape(9 * Cin, Cout),
            preferred_element_type=jnp.int32,
        )
        acc = acc.astype(jnp.float32) * sc_ref[:] + b_ref[:]
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
                piece = jnp.concatenate(parts, axis=-1)
            else:
                piece = jnp.clip(jnp.round(piece * io_ref[0, 0]), -127, 127)
            out_ref[0, :, i] = piece.reshape(TH, W, out_cols).astype(
                out_ref.dtype
            )

    window_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(TH + 2), pl.Element(W + 2), pl.Element(Cin)),
        lambda bi, ti: (bi, ti * TH, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_dtype = jnp.float32 if with_head else jnp.int8
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
            bytes_accessed=xp.size + B * H * s * W * out_cols,
            transcendentals=B * H * W * Cout,
        ),
        interpret=interpret,
    )(xp, w2, scale2, bias2, hw, hb, inv_out)
    return out5.reshape(B, H * s, W * s, c_final)
