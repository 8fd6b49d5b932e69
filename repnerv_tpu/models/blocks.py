"""NeRVBlock — the reparam conv block: conv -> PixelShuffle -> norm -> act.

Parity target: reference model.py:303-567.  ``out_channels = new_ngf *
stride**2`` feeds a PixelShuffle(stride) so one stride-1 conv performs the
upsampling (model.py:310-314).

Params-as-pytree design: a block is a dict of branch param dicts.  The train
apply is ``act(norm(pixel_shuffle(conv(x, fuse(params)))))``; switching to
deploy is a *pure params transformation* (``block_to_deploy``), not module
surgery (cf. reference model.py:395-448).

``apply_branches_direct`` reproduces the reference's branch-sum forward
(model.py:541-565, and the commented-out offline path at :526-531) and exists
to property-test that fusion is exact for every branch type.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from . import reparam
from .layers import (
    activation,
    apply_norm,
    conv2d,
    init_conv,
    init_norm,
    pixel_shuffle,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_seqconv(key, cin: int, cout: int) -> Params:
    """SeqConv3x3 edge branch params (reference model.py:198-220):
    1x1 conv (torch default init) + randn*1e-3 scale/bias."""
    k0_key, s_key, b_key = jax.random.split(key, 3)
    p = init_conv(k0_key, 1, 1, cin, cout, bias=True)
    return {
        "k0": p["w"],
        "b0": p["b"],
        "scale": jax.random.normal(s_key, (cout,), jnp.float32) * 1e-3,
        "bias": jax.random.normal(b_key, (cout,), jnp.float32) * 1e-3,
    }


def init_block(
    key,
    *,
    ngf: int,
    new_ngf: int,
    stride: int,
    branch_type: str = "NeRV_vanilla",
    norm: str = "none",
    bias: bool = True,
    deploy: bool = False,
) -> Params:
    cout = new_ngf * stride * stride
    keys = jax.random.split(key, 8)
    p: Params = {"norm": init_norm(norm, new_ngf)}

    if deploy:
        p["rbr_reparam"] = init_conv(keys[0], 3, 3, ngf, cout, bias=True)
        return p

    if branch_type == "NeRV_vanilla":
        p["branch"] = init_conv(keys[0], 3, 3, ngf, cout, bias=bias)
    elif branch_type == "ERB":
        p["k3x3"] = init_conv(keys[0], 3, 3, ngf, cout)
        p["k3x1"] = init_conv(keys[1], 3, 1, ngf, cout)
        p["k1x3"] = init_conv(keys[2], 1, 3, ngf, cout)
        p["seq_1x1_a"] = init_conv(keys[3], 1, 1, ngf, 2 * ngf, bias=False)
        p["seq_3x3"] = init_conv(keys[4], 3, 3, 2 * ngf, cout, bias=False)
        p["seq_1x1_b"] = init_conv(keys[5], 1, 1, cout, cout, bias=False)
    elif branch_type == "ACB":
        p["k3x3"] = init_conv(keys[0], 3, 3, ngf, cout)
        p["k3x1"] = init_conv(keys[1], 3, 1, ngf, cout)
        p["k1x3"] = init_conv(keys[2], 1, 3, ngf, cout)
    elif branch_type == "RepVGG":
        p["k3x3"] = init_conv(keys[0], 3, 3, ngf, cout)
        p["k1x1"] = init_conv(keys[1], 1, 1, ngf, cout)
    elif branch_type == "DBB":
        p["k3x3"] = init_conv(keys[0], 3, 3, ngf, cout)
        p["k1x1"] = init_conv(keys[1], 1, 1, ngf, cout)
        p["seq_1x1"] = init_conv(keys[2], 1, 1, ngf, 2 * ngf, bias=False)
        p["seq_3x3"] = init_conv(keys[3], 3, 3, 2 * ngf, cout, bias=False)
        p["avg_1x1"] = init_conv(keys[4], 1, 1, ngf, cout, bias=False)
    elif branch_type == "ECB":
        p["k3x3"] = init_conv(keys[0], 3, 3, ngf, cout)
        p["seq_1x1"] = init_conv(keys[1], 1, 1, ngf, 2 * ngf, bias=False)
        p["seq_3x3"] = init_conv(keys[2], 3, 3, 2 * ngf, cout, bias=False)
        p["sbx"] = _init_seqconv(keys[3], ngf, cout)
        p["sby"] = _init_seqconv(keys[4], ngf, cout)
        p["lpl"] = _init_seqconv(keys[5], ngf, cout)
    else:
        raise KeyError(f"unknown branch_type {branch_type}")
    return p


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def apply_block(
    params: Params,
    x: jnp.ndarray,
    *,
    stride: int,
    branch_type: str,
    norm: str = "none",
    act: str = "swish",
    train: bool = True,
    online_fuse: bool = True,
    mixed: bool = False,
) -> jnp.ndarray:
    """NHWC block forward.  ``online_fuse`` runs one conv with fused weights
    (the paper's online reparam, exact for every branch type); otherwise the
    branch-sum graph executes (reference semantics for ACB/RepVGG/DBB/ECB).

    The conv deliberately stays on XLA's lowering in training: a round-2
    custom_vjp Pallas conv (fwd/dgrad/wgrad im2col GEMMs, 115 vs 100 TF/s
    isolated) measured 16% SLOWER end-to-end because it breaks XLA's
    conv<->elementwise fusions — see BENCHMARKS.md "Training roofline"."""
    if "rbr_reparam" in params or online_fuse:
        k, b = reparam.fuse(branch_type, params)
        out = conv2d(x, k, b, mixed=mixed)
    else:
        out = apply_branches_direct(params, x, branch_type)
    out = pixel_shuffle(out, stride)
    out = apply_norm(params.get("norm", {}), out, norm, train=train)
    return activation(out, act)


def _seqconv_apply(p: Params, x: jnp.ndarray, mask2d: jnp.ndarray) -> jnp.ndarray:
    """Literal SeqConv3x3 forward (reference model.py:272-284): 1x1 conv,
    explicit border fill with the 1x1 bias, depthwise mask conv."""
    y = conv2d(x, p["k0"], p["b0"], padding="VALID")
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b0 = p["b0"].astype(y.dtype)
    y = y.at[:, 0:1, :, :].set(b0)
    y = y.at[:, -1:, :, :].set(b0)
    y = y.at[:, :, 0:1, :].set(b0)
    y = y.at[:, :, -1:, :].set(b0)
    cout = p["scale"].shape[0]
    # depthwise 3x3: HWIO with I=1, groups=cout
    w = (mask2d[:, :, None] * p["scale"][None, None, :]).reshape(3, 3, 1, cout)
    return conv2d(y, w, p["bias"], padding="VALID", feature_group_count=cout)


def _avgpool3x3(x: jnp.ndarray) -> jnp.ndarray:
    from jax import lax

    s = lax.reduce_window(
        x,
        jnp.array(0.0, x.dtype),
        lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return s / 9.0


def apply_branches_direct(params: Params, x: jnp.ndarray, branch_type: str) -> jnp.ndarray:
    """Branch-by-branch forward mirroring reference model.py:522-565."""
    if branch_type == "NeRV_vanilla":
        return conv2d(x, params["branch"]["w"], params["branch"].get("b"))
    if branch_type in ("ERB", "ACB"):
        out = (
            conv2d(x, params["k3x3"]["w"], params["k3x3"]["b"])
            + conv2d(x, reparam._pad_3x1_to_3x3(params["k3x1"]["w"]), params["k3x1"]["b"])
            + conv2d(x, reparam._pad_1x3_to_3x3(params["k1x3"]["w"]), params["k1x3"]["b"])
        )
        if branch_type == "ERB":
            h = conv2d(x, params["seq_1x1_a"]["w"])
            h = conv2d(h, params["seq_3x3"]["w"])
            h = conv2d(h, params["seq_1x1_b"]["w"])
            out = out + h
        return out
    if branch_type == "RepVGG":
        return conv2d(x, params["k3x3"]["w"], params["k3x3"]["b"]) + conv2d(
            x, params["k1x1"]["w"], params["k1x1"]["b"]
        )
    if branch_type == "DBB":
        seq = conv2d(conv2d(x, params["seq_1x1"]["w"]), params["seq_3x3"]["w"])
        avg = _avgpool3x3(conv2d(x, params["avg_1x1"]["w"]))
        return (
            conv2d(x, params["k3x3"]["w"], params["k3x3"]["b"])
            + conv2d(x, params["k1x1"]["w"], params["k1x1"]["b"])
            + seq
            + avg
        )
    if branch_type == "ECB":
        seq = conv2d(conv2d(x, params["seq_1x1"]["w"]), params["seq_3x3"]["w"])
        out = conv2d(x, params["k3x3"]["w"], params["k3x3"]["b"]) + seq
        for name, mask in reparam.EDGE_MASKS.items():
            out = out + _seqconv_apply(params[name], x, mask)
        return out
    raise KeyError(branch_type)


# ---------------------------------------------------------------------------
# Deploy switch — a pure params transformation
# ---------------------------------------------------------------------------

_BRANCH_KEYS = (
    "branch",
    "k3x3",
    "k3x1",
    "k1x3",
    "k1x1",
    "seq_1x1",
    "seq_3x3",
    "seq_1x1_a",
    "seq_1x1_b",
    "avg_1x1",
    "sbx",
    "sby",
    "lpl",
)


def block_to_deploy(params: Params, branch_type: str) -> Params:
    """Fuse branches into a single ``rbr_reparam`` conv; idempotent
    (reference switch_to_deploy, model.py:395-448 — but correct for all
    branch types, not only ERB)."""
    if "rbr_reparam" in params:
        return params
    k, b = reparam.fuse(branch_type, params)
    out: Params = {k2: v for k2, v in params.items() if k2 not in _BRANCH_KEYS}
    rbr: Params = {"w": k}
    if b is not None:
        rbr["b"] = b
    out["rbr_reparam"] = rbr
    return out
