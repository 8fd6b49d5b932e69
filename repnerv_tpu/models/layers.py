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


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    padding: str | Sequence = "SAME",
    feature_group_count: int = 1,
) -> jnp.ndarray:
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
    params: Sequence[Params], x: jnp.ndarray, act_type: str, dtype=None
) -> jnp.ndarray:
    for layer in params:
        w = layer["w"]
        if dtype is not None:
            w = w.astype(dtype)
            x = x.astype(dtype)
        x = x @ w
        if "b" in layer:
            x = x + layer["b"].astype(x.dtype)
        x = activation(x, act_type)
    return x
