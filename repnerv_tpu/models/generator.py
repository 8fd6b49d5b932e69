"""Generator — MLP stem -> reshape -> NeRVBlock stack -> RGB head(s).

Parity target: reference model.py:571-625.  ``stem_dim_num "D_N"`` and
``fc_hw_dim "h_w_c"`` size the stem ``[embed_len, D*N, h*w*c]``; the stem
output reshapes to a [B, h, w, c] feature map (NHWC here; the reference's
NCHW view at model.py:613 maps to this channel-last layout at the checkpoint
boundary); per-stage channel schedule and head placement follow
model.py:583-608; output is ``sigmoid(x)`` or ``(tanh(x)+1)/2``.

The whole forward is one pure function over a params pytree, jit/vmap/pjit
friendly.  A batch of frame embeddings decodes a batch of frames — the
data axis shards over a TPU mesh (repnerv_tpu/parallel).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, head_plan, stage_channels
from .blocks import apply_block, block_to_deploy, init_block
from .layers import apply_mlp, conv2d, init_conv, init_mlp

Params = Dict[str, Any]

# below this input-pixel count a stage stays on the XLA path even when
# use_pallas_decode is set (tiny early stages gain nothing from the kernel)
PALLAS_MIN_PIXELS = 1024
# the fused kernel only lowers on real TPUs; tests monkeypatch this to run
# the interpret-mode kernel on CPU
PALLAS_REQUIRE_TPU = True


def init_generator(key, cfg: ModelConfig) -> Params:
    stem_dim, stem_num = cfg.stem_dims
    h, w, c = cfg.fc_hwd
    mlp_dims = [cfg.embed_length] + [stem_dim] * stem_num + [h * w * c]

    k_stem, k_blocks, k_heads = jax.random.split(key, 3)
    params: Params = {"stem": init_mlp(k_stem, mlp_dims, bias=True)}

    plan = stage_channels(cfg)
    bkeys = jax.random.split(k_blocks, len(plan))
    params["blocks"] = [
        init_block(
            bkeys[i],
            ngf=ngf,
            new_ngf=new_ngf,
            stride=stride,
            branch_type=cfg.branch_type,
            norm=cfg.norm,
            bias=cfg.bias,
            deploy=cfg.deploy,
        )
        for i, (ngf, new_ngf, stride) in enumerate(plan)
    ]

    heads = head_plan(cfg)
    hkeys = jax.random.split(k_heads, len(heads))
    head_params: List[Params | None] = []
    # channel width entering each stage head = width after that stage's blocks
    widths = _stage_out_widths(cfg)
    for i, has_head in enumerate(heads):
        if has_head:
            head_params.append(init_conv(hkeys[i], 1, 1, widths[i], 3, bias=cfg.bias))
        else:
            head_params.append(None)
    params["heads"] = head_params
    return params


def _stage_out_widths(cfg: ModelConfig) -> List[int]:
    plan = stage_channels(cfg)
    widths = []
    for i in range(len(cfg.strides)):
        # last block of stage i is at index (i+1)*num_blocks - 1
        widths.append(plan[(i + 1) * cfg.num_blocks - 1][1])
    return widths


def apply_generator(
    params: Params,
    embed: jnp.ndarray,
    cfg: ModelConfig,
    *,
    train: bool = True,
) -> List[jnp.ndarray]:
    """embed [B, embed_length] -> list of NHWC frames (one per active head).

    ``compute_dtype`` modes: ``float32`` | ``bfloat16`` (everything bf16) |
    ``mixed`` — f32 activations and params with bf16 MXU inputs and f32
    accumulation on every conv/matmul (layers.mxu_conv2d_f32): the matmul
    speed of bf16 with near-f32 forward precision (the bf16 rounding happens
    once per MXU input, never on partial sums or elementwise chains)."""
    mixed = cfg.compute_dtype == "mixed"
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    h, w, c = cfg.fc_hwd

    x = apply_mlp(params["stem"], embed, cfg.act, dtype=dtype, mixed=mixed)
    # reference reshapes NCHW [B, c, h, w] (model.py:613); channel-last here.
    x = x.reshape(x.shape[0], c, h, w).transpose(0, 2, 3, 1)

    plan = stage_channels(cfg)
    outputs: List[jnp.ndarray] = []
    block_idx = 0
    for stage, head in enumerate(params["heads"]):
        for j in range(cfg.num_blocks):
            _, _, stride = plan[block_idx]
            bparams = params["blocks"][block_idx]
            is_last_block = block_idx == len(params["blocks"]) - 1
            use_int8 = (
                cfg.decode_int8
                and not train
                and cfg.norm == "none"
                and "rbr_reparam" in bparams
                and str(block_idx) in params.get("int8", {})
                and (not PALLAS_REQUIRE_TPU or jax.default_backend() == "tpu")
            )
            if use_int8:
                from ..pallas_kernels import decode_int8 as d8

                q = params["int8"][str(block_idx)]
                if x.dtype != jnp.int8:
                    x = d8.quantize_act_int8(x, q["in_scale"])
                fuse_head = is_last_block and head is not None
                x = d8.fused_conv_ps_act_int8(
                    x,
                    q["w_q"],
                    q["scale"],
                    q.get("b"),
                    stride,
                    cfg.act,
                    out_scale=None if fuse_head else q["out_scale"],
                    head_w=head["w"] if fuse_head else None,
                    head_b=head.get("b") if fuse_head else None,
                    out_squash="sigmoid" if cfg.sigmoid else "tanh",
                )
                if fuse_head:
                    outputs.append(x.astype(jnp.float32))
                    return outputs
                block_idx += 1
                continue
            use_pallas = (
                cfg.use_pallas_decode
                and not train
                and cfg.norm == "none"
                and "rbr_reparam" in bparams
                # tiny early stages gain nothing and stress Mosaic layouts
                and x.shape[1] * x.shape[2] >= PALLAS_MIN_PIXELS
                and (not PALLAS_REQUIRE_TPU or jax.default_backend() == "tpu")
            )
            if use_pallas:
                from ..pallas_kernels.decode import fused_conv_ps_act

                fuse_head = is_last_block and head is not None
                x = fused_conv_ps_act(
                    x,
                    bparams["rbr_reparam"]["w"],
                    bparams["rbr_reparam"].get("b"),
                    stride,
                    cfg.act,
                    head_w=head["w"] if fuse_head else None,
                    head_b=head.get("b") if fuse_head else None,
                    out_squash="sigmoid" if cfg.sigmoid else "tanh",
                    compute_dtype=dtype,
                )
                if fuse_head:
                    outputs.append(x.astype(jnp.float32))
                    return outputs
                block_idx += 1
                continue
            use_ptrain = (
                cfg.use_pallas_train
                and train
                # only the small-batch regime wins: at b=1 the XLA tail
                # collapses into layout copies (34.5 -> 28 ms/step with the
                # kernel) but at b=8 XLA's batched graph is already
                # efficient and the kernel path measured 1.7x SLOWER
                and x.shape[0] <= 2
                and cfg.norm == "none"
                and cfg.online_fuse
                and not cfg.remat
                and cfg.compute_dtype != "mixed"
                and x.shape[1] * x.shape[2] >= PALLAS_MIN_PIXELS
                and (not PALLAS_REQUIRE_TPU or jax.default_backend() == "tpu")
            )
            if use_ptrain:
                from ..pallas_kernels.train_tail import fused_stage_train
                from . import reparam

                if "rbr_reparam" in bparams:
                    wt = bparams["rbr_reparam"]["w"]
                    bt = bparams["rbr_reparam"].get("b")
                else:
                    wt, bt = reparam.fuse(cfg.branch_type, bparams)
                if bt is None:
                    bt = jnp.zeros((wt.shape[-1],), wt.dtype)
                fuse_head = is_last_block and head is not None
                x = fused_stage_train(
                    x,
                    wt,
                    bt,
                    head["w"] if fuse_head else None,
                    head.get("b") if fuse_head else None,
                    stride,
                    cfg.act,
                    "sigmoid" if cfg.sigmoid else "tanh",
                    "float32" if cfg.compute_dtype == "float32" else "bfloat16",
                )
                if fuse_head:
                    outputs.append(x.astype(jnp.float32))
                    return outputs
                block_idx += 1
                continue
            block_fn = lambda p, xx: apply_block(  # noqa: E731
                p,
                xx,
                stride=stride,
                branch_type=cfg.branch_type,
                norm=cfg.norm,
                act=cfg.act,
                train=train,
                online_fuse=cfg.online_fuse,
                mixed=mixed,
            )
            if cfg.remat and train:
                # rematerialize block activations in the backward pass —
                # halves peak HBM for 720p batches at ~1.3x step FLOPs
                block_fn = jax.checkpoint(block_fn)
            x = block_fn(bparams, x)
            block_idx += 1
        if head is not None:
            img = conv2d(x, head["w"], head.get("b"))
            img = (
                jax.nn.sigmoid(img)
                if cfg.sigmoid
                else (jnp.tanh(img) + 1.0) * 0.5
            )
            outputs.append(img.astype(jnp.float32))
    return outputs


def generator_to_deploy(params: Params, cfg: ModelConfig) -> Tuple[Params, ModelConfig]:
    """Fuse every block's branches -> single-conv deploy params.

    A pure tree transformation (no module surgery); returns the deploy params
    and the matching config.  Mirrors the per-layer switch_to_deploy sweep of
    reference main_train.py:332-351.
    """
    import dataclasses

    new_blocks = [block_to_deploy(b, cfg.branch_type) for b in params["blocks"]]
    new_params = dict(params)
    new_params["blocks"] = new_blocks
    return new_params, dataclasses.replace(cfg, deploy=True)


def calibrate_int8(
    params: Params, cfg: ModelConfig, calib_embeds: jnp.ndarray
) -> Params:
    """Prepare int8 decode scales/weights for the trailing blocks.

    Runs an f32 forward over ``calib_embeds`` (a representative batch of
    frame embeddings), records the abs-max of each trailing block's input
    activation, and attaches ``params["int8"][str(i)]`` entries holding the
    per-output-channel int8 weights (symmetric, from the fused deploy
    kernel), the combined dequant scale ``sx*sw``, the f32 bias, the input
    scale, and the next stage's requant scale.  Inference-only: pairs with
    ``cfg.decode_int8`` (see pallas_kernels/decode_int8.py for the scheme).

    Requires deploy params and a single trailing head (the paper's
    ``--single_res`` layout); returns params unchanged if the config has
    intermediate heads.
    """
    from ..pallas_kernels import decode_int8 as d8

    heads = head_plan(cfg)
    if any(heads[:-1]) or not heads[-1]:
        return params
    n_blocks = len(params["blocks"])
    first = n_blocks + cfg.int8_from_block
    if not (0 <= first < n_blocks):
        return params

    # f32 forward collecting every block's input abs-max, under ONE jit:
    # a lax.scan over 2-frame chunks bounds the live footprint to a single
    # chunk's stage buffers (the eager per-op loop this replaces held every
    # intermediate alive — a 1080p 8-frame sweep transiently needed ~13 GB)
    # and dispatches once instead of per-op.
    h, w, c = cfg.fc_hwd
    plan = stage_channels(cfg)
    for bparams in params["blocks"]:
        if "rbr_reparam" not in bparams:
            raise ValueError("calibrate_int8 needs deploy params (fused blocks)")

    chunk = 2
    pad = (-calib_embeds.shape[0]) % chunk
    if pad:
        # repeating the last frame cannot change any max
        calib_embeds = jnp.concatenate(
            [calib_embeds, jnp.repeat(calib_embeds[-1:], pad, axis=0)]
        )
    chunks = calib_embeds.reshape(-1, chunk, calib_embeds.shape[-1])

    @jax.jit
    def collect_amax(p, emb_chunks):
        def body(carry, emb):
            x = apply_mlp(p["stem"], emb, cfg.act)
            x = x.reshape(x.shape[0], c, h, w).transpose(0, 2, 3, 1)
            per_block = []
            for i, bparams in enumerate(p["blocks"]):
                per_block.append(jnp.max(jnp.abs(x)))
                x = apply_block(
                    bparams,
                    x,
                    stride=plan[i][2],
                    branch_type=cfg.branch_type,
                    norm=cfg.norm,
                    act=cfg.act,
                    train=False,
                )
            return jnp.maximum(carry, jnp.stack(per_block)), None

        init = jnp.zeros(len(p["blocks"]), jnp.float32)
        out, _ = jax.lax.scan(body, init, emb_chunks)
        return out

    amax = collect_amax(
        {"stem": params["stem"], "blocks": params["blocks"]},
        chunks.astype(jnp.float32),
    )

    table: Dict[str, Params] = {}
    for i in range(first, n_blocks):
        bp = params["blocks"][i]["rbr_reparam"]
        w_q, sw = d8.quantize_weight_int8(bp["w"])
        in_scale = jnp.maximum(amax[i], 1e-12) / 127.0
        entry: Params = {
            "w_q": w_q,
            "scale": in_scale * sw,
            "in_scale": in_scale,
        }
        if "b" in bp:
            entry["b"] = bp["b"].astype(jnp.float32)
        if i + 1 < n_blocks:
            entry["out_scale"] = jnp.maximum(amax[i + 1], 1e-12) / 127.0
        table[str(i)] = entry
    out = dict(params)
    out["int8"] = table
    return out


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
