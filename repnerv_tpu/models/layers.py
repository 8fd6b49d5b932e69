"""Primitive layers: activations, norms, MLP stem, pixel shuffle, conv.

TPU-first conventions used throughout the framework:

* Activations are NHWC (channels-last) — the layout XLA:TPU convolves best.
* Conv weights are HWIO; linear weights are [in, out].  Conversion to/from
  PyTorch's OIHW / [out, in] happens only at the checkpoint-parity boundary
  (repnerv_tpu/train/checkpoint.py).
* Everything here is a pure function over explicit parameter pytrees.

Reference parity: ActivationLayer model.py:86-117, NormLayer model.py:120-140,
MLP model.py:174-188, nn.PixelShuffle used at model.py:310.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# Activations (reference model.py:86-117)
# ---------------------------------------------------------------------------


def activation(x: jnp.ndarray, act_type: str) -> jnp.ndarray:
    if act_type == "relu":
        return jax.nn.relu(x)
    if act_type == "leaky":
        return jax.nn.leaky_relu(x, negative_slope=0.01)
    if act_type == "leaky01":
        return jax.nn.leaky_relu(x, negative_slope=0.1)
    if act_type == "relu6":
        return jax.nn.relu6(x)
    if act_type == "gelu":
        # torch nn.GELU() default is the exact (erf) formulation
        return jax.nn.gelu(x, approximate=False)
    if act_type == "sin":
        return jnp.sin(x)
    if act_type == "swish":
        return jax.nn.silu(x)
    if act_type == "softplus":
        return jax.nn.softplus(x)
    if act_type == "hardswish":
        return jax.nn.hard_swish(x)
    raise KeyError(f"Unknown activation function {act_type}.")


# ---------------------------------------------------------------------------
# Norms (reference model.py:120-140).  NHWC.
# ---------------------------------------------------------------------------


def init_norm(norm_type: str, ch: int) -> Params:
    if norm_type == "none":
        return {}
    if norm_type == "bn":
        return {
            "scale": jnp.ones((ch,), jnp.float32),
            "bias": jnp.zeros((ch,), jnp.float32),
            "mean": jnp.zeros((ch,), jnp.float32),
            "var": jnp.ones((ch,), jnp.float32),
        }
    if norm_type == "in":
        return {}  # torch InstanceNorm2d default: affine=False
    raise NotImplementedError(norm_type)


def apply_norm(
    params: Params,
    x: jnp.ndarray,
    norm_type: str,
    *,
    train: bool = True,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """NHWC norm.  BN here is the *batch statistics* path (training mode);
    running stats are carried for checkpoint parity but, like the reference
    paper config (norm='none'), BN is off the hot path.
    """
    if norm_type == "none":
        return x
    if norm_type == "bn":
        if train:
            mean = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.var(x, axis=(0, 1, 2))
        else:
            mean, var = params["mean"], params["var"]
        inv = lax.rsqrt(var + eps)
        return (x - mean) * inv * params["scale"] + params["bias"]
    if norm_type == "in":
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * lax.rsqrt(var + eps)
    raise NotImplementedError(norm_type)


# ---------------------------------------------------------------------------
# Pixel shuffle (NHWC).  Matches torch.nn.PixelShuffle channel ordering:
# out[b, h*s+i, w*s+j, c] = in[b, h, w, c*s*s + i*s + j]
# so fused conv weights can round-trip through PyTorch checkpoints.
# ---------------------------------------------------------------------------


def pixel_shuffle(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    if stride == 1:
        return x
    b, h, w, c = x.shape
    cc = c // (stride * stride)
    x = x.reshape(b, h, w, cc, stride, stride)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, si, w, sj, cc
    return x.reshape(b, h * stride, w * stride, cc)


def pixel_unshuffle(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    if stride == 1:
        return x
    b, hs, ws, cc = x.shape
    h, w = hs // stride, ws // stride
    x = x.reshape(b, h, stride, w, stride, cc)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h, w, cc * stride * stride)


# ---------------------------------------------------------------------------
# Conv2d (NHWC x HWIO), stride 1, zero padding — the only conv geometry the
# generator uses (reference model.py:316-393 are all stride-1 convs).
# ---------------------------------------------------------------------------

DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _conv_f32acc(lhs: jnp.ndarray, rhs: jnp.ndarray, dn, padding) -> jnp.ndarray:
    """bf16 x bf16 conv accumulating to f32 (MXU-native: the systolic array
    multiplies bf16 and accumulates f32; this just keeps the f32 result)."""
    return lax.conv_general_dilated(
        lhs.astype(jnp.bfloat16),
        rhs.astype(jnp.bfloat16),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )


def _same_pad(w: jnp.ndarray):
    kh, kw = w.shape[0], w.shape[1]
    return ((kh // 2, kh // 2), (kw // 2, kw // 2))


@jax.custom_vjp
def mxu_conv2d_f32(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Mixed-precision conv: f32 in/out, bf16 on the MXU, f32 accumulation.

    Stride-1 SAME conv with an odd HWIO kernel (the only geometry the
    generator's blocks use).  A custom_vjp is required because XLA's conv
    transpose rule cannot mix a f32 cotangent with bf16 weights; here all
    three convs (fwd / dgrad / wgrad) run bf16 x bf16 -> f32.  Unlike a
    Pallas kernel this stays inside XLA, so conv<->elementwise fusions
    survive (see BENCHMARKS.md "Training roofline" for why that matters).
    """
    return _conv_f32acc(x, w, DIMSPEC, _same_pad(w))


def _mxu_conv_fwd(x, w):
    # residuals are the bf16 casts: the backward only ever feeds the MXU, so
    # saving bf16 HALVES activation-residual HBM vs an f32 graph (a 720p
    # b=8 fused-epoch step would otherwise exceed the 16 GB chip)
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    out = lax.conv_general_dilated(
        xb, wb, (1, 1), _same_pad(w), dimension_numbers=DIMSPEC,
        preferred_element_type=jnp.float32,
    )
    return out, (xb, wb)


def _mxu_conv_bwd(res, ct):
    xb, wb = res
    # dgrad: correlate the cotangent with the spatially-flipped, IO-swapped
    # kernel (exact transpose of a stride-1 SAME conv with an odd kernel)
    w_flip = wb[::-1, ::-1].transpose(0, 1, 3, 2)
    dx = _conv_f32acc(ct, w_flip, DIMSPEC, _same_pad(wb))
    # wgrad as a conv: batch is the contraction, C_in rides the batch slot.
    # lhs = x [N,H,W,I] read as (batch=I@3, feature=N@0, spatial=1,2);
    # rhs = ct [N,H,W,O] read as (out=O@3, in=N@0, spatial=1,2);
    # out spec places (batch=I, feature=O) after the spatial dims -> [kh,kw,I,O].
    dn = lax.ConvDimensionNumbers(
        lhs_spec=(3, 0, 1, 2), rhs_spec=(3, 0, 1, 2), out_spec=(2, 3, 0, 1)
    )
    dw = _conv_f32acc(xb, ct, dn, _same_pad(wb))
    return dx, dw


mxu_conv2d_f32.defvjp(_mxu_conv_fwd, _mxu_conv_bwd)


@jax.custom_vjp
def mxu_matmul_f32(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Mixed-precision matmul [B,K]x[K,N]: bf16 MXU inputs, f32 accumulation."""
    return lax.dot_general(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mxu_mm_fwd(x, w):
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    out = lax.dot_general(
        xb, wb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return out, (xb, wb)


def _mxu_mm_bwd(res, ct):
    xb, wb = res
    ctb = ct.astype(jnp.bfloat16)
    dx = lax.dot_general(
        ctb, wb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw = lax.dot_general(
        xb, ctb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dx, dw


mxu_matmul_f32.defvjp(_mxu_mm_fwd, _mxu_mm_bwd)


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    padding: str | Sequence = "SAME",
    feature_group_count: int = 1,
    mixed: bool = False,
) -> jnp.ndarray:
    if (
        mixed
        and padding == "SAME"
        and feature_group_count == 1
        and w.shape[0] % 2 == 1
        and w.shape[1] % 2 == 1
    ):
        out = mxu_conv2d_f32(x, w)
        if b is not None:
            out = out + b.astype(out.dtype)
        return out
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=DIMSPEC,
        feature_group_count=feature_group_count,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Parameter initializers mirroring torch defaults, so training dynamics match.
# torch nn.Conv2d/Linear: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +)
# for weight, U(-1/sqrt(fan_in), +) for bias.
# ---------------------------------------------------------------------------


def _torch_uniform(key, shape, fan_in: int, dtype=jnp.float32) -> jnp.ndarray:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_conv(
    key, kh: int, kw: int, cin: int, cout: int, bias: bool = True
) -> Params:
    kw_key, b_key = jax.random.split(key)
    fan_in = cin * kh * kw
    # kaiming_uniform(a=sqrt(5)): gain = sqrt(2/(1+5)) = 1/sqrt(3);
    # bound = gain * sqrt(3/fan_in) = 1/sqrt(fan_in)  (torch Conv2d default)
    p: Params = {"w": _torch_uniform(kw_key, (kh, kw, cin, cout), fan_in)}
    if bias:
        p["b"] = _torch_uniform(b_key, (cout,), fan_in)
    return p


def init_linear(key, din: int, dout: int, bias: bool = True) -> Params:
    w_key, b_key = jax.random.split(key)
    p: Params = {"w": _torch_uniform(w_key, (din, dout), din)}
    if bias:
        p["b"] = _torch_uniform(b_key, (dout,), din)
    return p


# ---------------------------------------------------------------------------
# MLP stem (reference model.py:174-188): [Linear, act] * len(dims-1).
# ---------------------------------------------------------------------------


def init_mlp(key, dim_list: Sequence[int], bias: bool = True) -> List[Params]:
    keys = jax.random.split(key, max(len(dim_list) - 1, 1))
    return [
        init_linear(keys[i], dim_list[i], dim_list[i + 1], bias=bias)
        for i in range(len(dim_list) - 1)
    ]


def apply_mlp(
    params: Sequence[Params], x: jnp.ndarray, act_type: str, dtype=None,
    mixed: bool = False,
) -> jnp.ndarray:
    for layer in params:
        w = layer["w"]
        if mixed:
            x = mxu_matmul_f32(x, w)
        else:
            if dtype is not None:
                w = w.astype(dtype)
                x = x.astype(dtype)
            x = x @ w
        if "b" in layer:
            x = x + layer["b"].astype(x.dtype)
        x = activation(x, act_type)
    return x
