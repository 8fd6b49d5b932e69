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


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
