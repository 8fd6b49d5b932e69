"""Checkpoint inspector — parity with reference read_pth.py:26-165.

Reads a PyTorch ``.pth`` (reference format, safe ``weights_only`` load
first), one of our Orbax directories, or a ``.rnvb`` compressed bitstream
artifact (compress/bitstream.py).  Prints top-level keys, a state-dict
preview (name/shape/dtype), tensor and element counts, and the same
structural heuristics: ``module.`` prefix (DDP), ``rbr_reparam`` (deploy
state), ERB branch names (train state).  For ``.rnvb`` it also reports the
codec, quantization grid, payload bits and the on-disk all-in size.

Usage: ``python -m repnerv_tpu.tools.read_ckpt path [--limit N]``
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Any, Dict


def _load_pth(path: str) -> Any:
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except (TypeError, AttributeError):
        return torch.load(path, map_location="cpu")


def _load_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(os.path.abspath(path))
        return {"_orbax_metadata": meta}


def summarize_state_dict(state: Dict[str, Any], limit: int = 20) -> Dict[str, Any]:
    n_tensors = 0
    n_elems = 0
    lines = []
    for i, (k, v) in enumerate(state.items()):
        shape = tuple(getattr(v, "shape", ()))
        dtype = getattr(v, "dtype", type(v).__name__)
        numel = 1
        for s in shape:
            numel *= s
        n_tensors += 1
        n_elems += numel
        if i < limit:
            lines.append(f"  {k}: shape={shape} dtype={dtype}")
    return {"tensors": n_tensors, "elements": n_elems, "preview": lines}


def classify(state_keys) -> str:
    keys = list(state_keys)
    notes = []
    if any(k.startswith("module.") for k in keys):
        notes.append("DDP-wrapped ('module.' prefix)")
    if any("rbr_reparam" in k for k in keys):
        notes.append("DEPLOY state (fused rbr_reparam convs)")
    if any("rbr_3x3_branch" in k for k in keys):
        notes.append("TRAIN state (multi-branch reparam convs)")
    if any(k.startswith("layers.") and ".branch." in k for k in keys):
        notes.append("TRAIN state (NeRV_vanilla single branch)")
    return "; ".join(notes) if notes else "unclassified"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--limit", type=int, default=20)
    args = p.parse_args(argv)

    if os.path.isdir(args.path):
        ckpt = _load_orbax(args.path)
        print(f"Orbax checkpoint: {args.path}")
        print(ckpt["_orbax_metadata"])
        return

    if args.path.endswith(".rnvb"):
        from ..compress.bitstream import read_bitstream

        params, mcfg, header = read_bitstream(args.path)
        size = os.path.getsize(args.path)
        print(f"RNVB bitstream: {args.path}")
        print(
            f"codec={header['codec']} quant_bit={header['quant_bit']} "
            f"quant_axis={header['quant_axis']} "
            f"symbols={header['n_symbols']:,} "
            f"payload_bits={header['payload_bits']:,}"
        )
        print(
            f"on-disk: {size:,} bytes "
            f"(payload {header['payload_bits'] / 8 / size:.1%}, rest = "
            "header/codec table/qparams/sparsity bitmaps)"
        )
        print(f"model: branch={mcfg.branch_type} deploy={mcfg.deploy}")
        tensors = header["tensors"]
        print(f"Tensors: {len(tensors)}")
        for t in tensors[: args.limit]:
            print(
                f"  {t['key']}: shape={tuple(t['shape'])} axis={t['axis']} "
                f"zeros={t['n_zero']}/{t['n_elem']}"
            )
        if len(tensors) > args.limit:
            print(f"  ... ({len(tensors) - args.limit} more)")
        print(f"Structure: {classify(t['key'] for t in tensors)}")
        return

    ckpt = _load_pth(args.path)
    print(f"Checkpoint: {args.path}")
    if isinstance(ckpt, dict):
        print(f"Top-level keys: {list(ckpt.keys())}")
        state = ckpt.get("state_dict", ckpt)
    else:
        state = ckpt
    if hasattr(state, "items"):
        info = summarize_state_dict(state, args.limit)
        print(f"Tensors: {info['tensors']}  Elements: {info['elements']:,}")
        for line in info["preview"]:
            print(line)
        if info["tensors"] > args.limit:
            print(f"  ... ({info['tensors'] - args.limit} more)")
        print(f"Structure: {classify(state.keys())}")


if __name__ == "__main__":
    main()
