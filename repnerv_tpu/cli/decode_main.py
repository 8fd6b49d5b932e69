"""Standalone decoder: ``.rnvb`` artifact -> frames, no checkpoint/config
needed.

The serving-side half of the compression story: ``--save_bitstream``
(eval CLI) writes one self-describing file — model config, per-axis
quantization parameters, sparsity map, entropy-coded weights — and this
CLI plays it back.  The reference has no equivalent surface (its
``main_eval.py:714-727`` only *estimates* a bitstream; decoding always
requires the original ``.pth`` checkpoint plus the full training flag
set).

    python -m repnerv_tpu.cli.decode_main model.rnvb --frames 132 \
        [--out frames_dir] [--decode_int8] [--batch N]

Frame timestamps follow the training convention t_i = i/N
(data/frames.py:140, reference model.py:54).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import numpy as np

import jax.numpy as jnp


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("artifact", help=".rnvb file written by --save_bitstream")
    p.add_argument(
        "--frames", type=int, required=True,
        help="number of frames N to decode (t_i = i/N)",
    )
    p.add_argument(
        "--out", default="",
        help="directory for pred_{i}.png dumps; omit to only measure decode",
    )
    p.add_argument(
        "--batch", type=int, default=0,
        help="frames per dispatch (default: auto, HBM-capped by pixel count)",
    )
    p.add_argument(
        "--decode_int8", action="store_true",
        help="int8-MXU trailing stages (calibrated on the first frames)",
    )
    p.add_argument(
        "--mesh_shape", type=int, nargs="*", default=None,
        help="decode over a device mesh, e.g. --mesh_shape 8: each scan "
        "step's frame batch shards over the data axis (serving scale-out)",
    )
    return p


def main(argv=None) -> dict:
    from ..compress.bitstream import read_bitstream
    from ..config import TrainConfig, output_hw
    from ..models.embedding import positional_encoding
    from ..models.generator import generator_to_deploy
    from ..train.loop import (
        decode_batch_cap,
        make_decode_fn,
        measure_decode_fps,
    )
    from ..utils.misc import enable_compilation_cache

    a = build_parser().parse_args(argv)
    if a.frames <= 0:
        build_parser().error(f"--frames must be positive (got {a.frames})")
    enable_compilation_cache()

    params, mcfg, header = read_bitstream(a.artifact)
    print(
        f"loaded {a.artifact}: {header['codec']} codec, "
        f"{header['quant_bit']}-bit, branch={mcfg.branch_type}, "
        f"deploy={mcfg.deploy}"
    )
    if not mcfg.deploy and mcfg.branch_type != "NeRV_vanilla":
        # PATH-A artifacts hold the train-state tensors; serve the fused
        # single-conv graph (pure params transform, exact by property test)
        params, mcfg = generator_to_deploy(params, mcfg)
        print("fused branches -> deploy graph for serving")

    if a.decode_int8:
        from ..models.generator import calibrate_int8

        mcfg = dataclasses.replace(mcfg, decode_int8=True)
        calib_t = jnp.arange(min(8, a.frames), dtype=jnp.float32) / a.frames
        params = calibrate_int8(
            params, mcfg, positional_encoding(calib_t, mcfg.embed)
        )
        if "int8" in params:
            print("int8 decode calibrated")
        else:
            print("WARNING: int8 calibration skipped; using non-int8 path")

    h, w = output_hw(mcfg)
    n = a.frames
    mesh = None
    if a.mesh_shape is not None:
        from ..parallel.sharding import make_mesh

        mesh = make_mesh(tuple(a.mesh_shape), ("data",))
        n_dev = dict(mesh.shape).get("data", 1)
        # per-device HBM cap scales out: n_dev chips hold n_dev x the
        # stage buffers, and the batch column must divide by the axis
        if n < n_dev:
            build_parser().error(f"--frames {n} < data-axis size {n_dev}")
        bsz = max(a.batch or decode_batch_cap(h, w) * n_dev, n_dev)
        bsz = min((bsz // n_dev) * n_dev, (n // n_dev) * n_dev)
        print(f"decoding over a {dict(mesh.shape)} mesh, batch {bsz}")
    else:
        bsz = min(a.batch or decode_batch_cap(h, w), n)
    t_all = np.arange(n, dtype=np.float32) / n

    result = {"frames": n, "hw": [h, w], "batch": bsz}
    cfg = TrainConfig(model=mcfg)
    if a.out:
        from PIL import Image

        os.makedirs(a.out, exist_ok=True)
        # chunked decode (NOT the whole-video scan with keep_frames: the
        # full 1080p frame stack is GBs, and fetching it to host over a
        # tunneled backend takes minutes)
        decode = make_decode_fn(cfg)
        t0 = time.perf_counter()
        for i0 in range(0, n, bsz):
            chunk = t_all[i0 : i0 + bsz]
            t = jnp.asarray(np.pad(chunk, (0, bsz - len(chunk)), mode="edge"))
            arr = np.clip(np.asarray(decode(params, t))[: len(chunk)] * 255, 0, 255)
            for b in range(len(chunk)):
                Image.fromarray(arr[b].astype(np.uint8)).save(
                    os.path.join(a.out, f"pred_{i0 + b}.png")
                )
        wall = time.perf_counter() - t0
        print(f"wrote {n} frames to {a.out} in {wall:.2f}s (incl. PNG encode)")
        result["dump_seconds"] = wall
    else:
        # pure decode throughput: same harness as the eval CLI
        fps = measure_decode_fps(params, cfg, t_all, bsz, mesh=mesh)
        n_timed = max(n // bsz, 1) * bsz
        print(f"decoded {n_timed} frames at {fps:.1f} fps")
        result["fps"] = fps
    return result


if __name__ == "__main__":
    main()
