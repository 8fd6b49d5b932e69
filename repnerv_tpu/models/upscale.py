"""Upscale-conv variants — parity with the reference's ``CustomConv``
(model.py:143-171): 'conv' (conv3x3 + PixelShuffle), 'deconv'
(ConvTranspose2d(k=s, stride=s)), 'bilinear' (align_corners upsample +
conv(2s+1)).

The reference's NeRVBlock never reads ``conv_type`` (the flag only feeds the
experiment name, SURVEY.md §2 #7), so these are standalone layers kept for
API completeness; 'conv' is the path the generator actually uses.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from .layers import conv2d, init_conv, pixel_shuffle, _torch_uniform

Params = Dict[str, Any]


def init_custom_conv(
    key, ngf: int, new_ngf: int, stride: int, conv_type: str = "conv", bias: bool = True
) -> Params:
    if conv_type == "conv":
        return {"conv": init_conv(key, 3, 3, ngf, new_ngf * stride * stride, bias=bias)}
    if conv_type == "deconv":
        # torch ConvTranspose2d default init: kaiming_uniform over fan_in
        # computed from (in_channels, k, k)
        wk, bk = jax.random.split(key)
        fan_in = ngf * stride * stride
        p: Params = {
            # stored HWIO for lax.conv_transpose: [kh, kw, in, out]
            "w": _torch_uniform(wk, (stride, stride, ngf, new_ngf), fan_in)
        }
        p["b"] = _torch_uniform(bk, (new_ngf,), fan_in)
        return {"deconv": p}
    if conv_type == "bilinear":
        k = 2 * stride + 1
        return {"conv": init_conv(key, k, k, ngf, new_ngf, bias=bias)}
    raise KeyError(conv_type)


def upsample_bilinear_align_corners(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC bilinear upsample with torch's ``align_corners=True`` grid:
    src = dst * (in-1)/(out-1)."""
    b, h, w, c = x.shape
    oh, ow = h * scale, w * scale

    def axis_weights(n_in, n_out):
        if n_in == 1:
            lo = jnp.zeros(n_out, jnp.int32)
            return lo, lo, jnp.zeros(n_out, x.dtype)
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        lo = jnp.clip(lo, 0, n_in - 2)
        frac = (pos - lo).astype(x.dtype)
        return lo, lo + 1, frac

    ylo, yhi, fy = axis_weights(h, oh)
    xlo, xhi, fx = axis_weights(w, ow)
    top = x[:, ylo][:, :, xlo] * (1 - fx)[None, None, :, None] + x[:, ylo][
        :, :, xhi
    ] * fx[None, None, :, None]
    bot = x[:, yhi][:, :, xlo] * (1 - fx)[None, None, :, None] + x[:, yhi][
        :, :, xhi
    ] * fx[None, None, :, None]
    return top * (1 - fy)[None, :, None, None] + bot * fy[None, :, None, None]


def apply_custom_conv(
    params: Params, x: jnp.ndarray, stride: int, conv_type: str = "conv"
) -> jnp.ndarray:
    if conv_type == "conv":
        return pixel_shuffle(conv2d(x, params["conv"]["w"], params["conv"].get("b")), stride)
    if conv_type == "deconv":
        p = params["deconv"]
        # torch ConvTranspose2d scatters W[i, j] at output offset (i, j);
        # lax.conv_transpose's kernel runs in conv orientation, so flip the
        # spatial dims to match (verified against torch in test_upscale)
        out = lax.conv_transpose(
            x,
            jnp.flip(p["w"], (0, 1)).astype(x.dtype),
            strides=(stride, stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + p["b"].astype(out.dtype)
    if conv_type == "bilinear":
        up = upsample_bilinear_align_corners(x, stride)
        k = params["conv"]["w"].shape[0]
        pad = (k - 1) // 2
        return conv2d(
            up,
            params["conv"]["w"],
            params["conv"].get("b"),
            padding=((pad, pad), (pad, pad)),
        )
    raise KeyError(conv_type)
