"""Checkpointing — Orbax for native state, plus PyTorch ``.pth`` interop.

Reference surface (main_train.py:292-358, SURVEY.md §5.4): checkpoints carry
{epoch, state_dict, 4 best metrics, optimizer state}; files
``model_latest`` / ``model_train_best`` / ``model_val_best``, and for
reparam branches an additional *deploy-state* snapshot per epoch.  Unlike
the reference (whose resume flags are dead — start_epoch is hardwired 0,
main_train.py:221), ``load_checkpoint`` genuinely resumes.

The ``.pth`` import/export mirrors the naming scheme that ``read_pth.py``
inspects, so reference checkpoints can be loaded for parity testing and our
checkpoints can round-trip back to torch tooling.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, TrainConfig, head_plan, stage_channels

Params = Dict[str, Any]

# our branch-param key <-> reference nn.Module attribute (model.py:320-393)
_BRANCH_NAME_MAP = {
    "branch": "branch",
    "k3x3": "rbr_3x3_branch",
    "k3x1": "rbr_3x1_branch",
    "k1x3": "rbr_1x3_branch",
    "k1x1": "rbr_1x1_branch",
    "seq_1x1_a": "rbr_1x1_3x3_1x1_branch_1x1_1",
    "seq_3x3_erb": "rbr_1x1_3x3_1x1_branch_3x3",
    "seq_1x1_b": "rbr_1x1_3x3_1x1_branch_1x1_2",
    "seq_1x1": "rbr_1x1_3x3_branch_1x1",
    "seq_3x3": "rbr_1x1_3x3_branch_3x3",
    "avg_1x1": "rbr_1x1_avg_branch_1x1",
    "sbx": "rbr_conv1x1_sbx_branch",
    "sby": "rbr_conv1x1_sby_branch",
    "lpl": "rbr_conv1x1_lpl_branch",
    "rbr_reparam": "rbr_reparam",
}


def _torch_name(our_key: str, branch_type: str) -> str:
    if our_key == "seq_3x3":
        # ERB's middle 3x3 has a different torch attr than DBB/ECB's
        return (
            _BRANCH_NAME_MAP["seq_3x3_erb"]
            if branch_type == "ERB"
            else _BRANCH_NAME_MAP["seq_3x3"]
        )
    return _BRANCH_NAME_MAP[our_key]


# ---------------------------------------------------------------------------
# params pytree <-> torch-style flat state dict (numpy)
# ---------------------------------------------------------------------------


def params_to_torch_state(params: Params, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Flatten our pytree into reference-named torch tensors:
    HWIO conv -> OIHW, [in,out] linear -> [out,in]."""
    out: Dict[str, np.ndarray] = {}

    for i, layer in enumerate(params["stem"]):
        out[f"stem.{2 * i}.weight"] = np.asarray(layer["w"]).T
        if "b" in layer:
            out[f"stem.{2 * i}.bias"] = np.asarray(layer["b"])

    for li, block in enumerate(params["blocks"]):
        for key, sub in block.items():
            if key == "norm":
                if sub:
                    out[f"layers.{li}.norm.weight"] = np.asarray(sub["scale"])
                    out[f"layers.{li}.norm.bias"] = np.asarray(sub["bias"])
                    out[f"layers.{li}.norm.running_mean"] = np.asarray(sub["mean"])
                    out[f"layers.{li}.norm.running_var"] = np.asarray(sub["var"])
                continue
            tname = _torch_name(key, cfg.branch_type)
            if key in ("sbx", "sby", "lpl"):
                out[f"layers.{li}.{tname}.k0"] = (
                    np.asarray(sub["k0"]).transpose(3, 2, 0, 1)
                )
                out[f"layers.{li}.{tname}.b0"] = np.asarray(sub["b0"])
                out[f"layers.{li}.{tname}.scale"] = np.asarray(sub["scale"]).reshape(
                    -1, 1, 1, 1
                )
                out[f"layers.{li}.{tname}.bias"] = np.asarray(sub["bias"])
            else:
                out[f"layers.{li}.{tname}.weight"] = (
                    np.asarray(sub["w"]).transpose(3, 2, 0, 1)
                )
                if "b" in sub:
                    out[f"layers.{li}.{tname}.bias"] = np.asarray(sub["b"])

    for hi, head in enumerate(params["heads"]):
        if head is not None:
            out[f"head_layers.{hi}.weight"] = np.asarray(head["w"]).transpose(
                3, 2, 0, 1
            )
            if "b" in head:
                out[f"head_layers.{hi}.bias"] = np.asarray(head["b"])
    return out


def torch_state_to_params(
    state: Dict[str, np.ndarray], cfg: ModelConfig
) -> Params:
    """Inverse of :func:`params_to_torch_state`.  Accepts reference
    checkpoints (incl. a ``module.`` DDP prefix and thop's
    ``total_ops``/``total_params`` artifacts, cf. main_eval.py:231-234)."""
    clean: Dict[str, np.ndarray] = {}
    for k, v in state.items():
        if "total_ops" in k or "total_params" in k:
            continue
        if k.startswith("module."):
            k = k[len("module.") :]
        clean[k] = np.asarray(v, dtype=np.float32)

    deploy = any(".rbr_reparam." in k for k in clean)
    rev = {}
    for ours, theirs in _BRANCH_NAME_MAP.items():
        rev[theirs] = "seq_3x3" if ours == "seq_3x3_erb" else ours

    params: Params = {"stem": [], "blocks": [], "heads": []}
    stem_ids = sorted(
        {int(m.group(1)) for k in clean if (m := re.match(r"stem\.(\d+)\.", k))}
    )
    for si in stem_ids:
        layer = {"w": jnp.asarray(clean[f"stem.{si}.weight"].T)}
        if f"stem.{si}.bias" in clean:
            layer["b"] = jnp.asarray(clean[f"stem.{si}.bias"])
        params["stem"].append(layer)

    n_blocks = len(stage_channels(cfg))
    for li in range(n_blocks):
        block: Params = {"norm": {}}
        prefix = f"layers.{li}."
        for k in clean:
            if not k.startswith(prefix):
                continue
            rest = k[len(prefix) :]
            attr, _, leaf = rest.rpartition(".")
            if attr == "norm":
                nm = {"weight": "scale", "bias": "bias", "running_mean": "mean", "running_var": "var"}
                if leaf in nm:
                    block["norm"][nm[leaf]] = jnp.asarray(clean[k])
                continue
            ours = rev.get(attr)
            if ours is None:
                continue
            if ours in ("sbx", "sby", "lpl"):
                sub = block.setdefault(ours, {})
                if leaf == "k0":
                    sub["k0"] = jnp.asarray(clean[k].transpose(2, 3, 1, 0))
                elif leaf == "b0":
                    sub["b0"] = jnp.asarray(clean[k])
                elif leaf == "scale":
                    sub["scale"] = jnp.asarray(clean[k].reshape(-1))
                elif leaf == "bias":
                    sub["bias"] = jnp.asarray(clean[k])
            else:
                sub = block.setdefault(ours, {})
                if leaf == "weight":
                    sub["w"] = jnp.asarray(clean[k].transpose(2, 3, 1, 0))
                elif leaf == "bias":
                    sub["b"] = jnp.asarray(clean[k])
        params["blocks"].append(block)

    for hi in range(len(head_plan(cfg))):
        key = f"head_layers.{hi}.weight"
        if key in clean:
            head = {"w": jnp.asarray(clean[key].transpose(2, 3, 1, 0))}
            if f"head_layers.{hi}.bias" in clean:
                head["b"] = jnp.asarray(clean[f"head_layers.{hi}.bias"])
            params["heads"].append(head)
        else:
            params["heads"].append(None)
    return params


def save_pth(path: str, params: Params, cfg: ModelConfig, extra: Optional[dict] = None):
    """Write a torch-loadable checkpoint with the reference's dict layout."""
    import torch

    state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in params_to_torch_state(params, cfg).items()
    }
    ckpt = {"state_dict": state}
    if extra:
        ckpt.update(extra)
    torch.save(ckpt, path)


def load_pth(path: str, cfg: ModelConfig) -> Tuple[Params, dict]:
    """Load a reference-format ``.pth`` (weights_only first, fallback to
    full pickle — read_pth.py:41-45 semantics)."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except (TypeError, AttributeError):
        ckpt = torch.load(path, map_location="cpu")
    state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    np_state = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
    extra = {k: v for k, v in ckpt.items() if k != "state_dict"} if isinstance(ckpt, dict) else {}
    return torch_state_to_params(np_state, cfg), extra


# ---------------------------------------------------------------------------
# Orbax native checkpoints (params + opt state + counters), resumable.
# ---------------------------------------------------------------------------


def save_orbax(ckpt_dir: str, name: str, payload: Any):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, name))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def load_orbax(ckpt_dir: str, name: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, name))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, like)
