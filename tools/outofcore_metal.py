"""Out-of-core training ON METAL (VERDICT r4 next #3).

The reference trains any-size video from disk for free (per-item PIL
loads, /root/reference/model.py:52-70).  Our 3-rung ladder (HBM-resident
-> host-streaming -> lazy disk, data/frames.py make_frame_store) is
exact-parity tested on CPU; this tool puts rungs 2 and 3 on the real
chip and records what they cost vs the resident path:

  resident   photo 132f 720p, default budgets (365 MiB < 40% HBM)
  stream     same video, --hbm_budget_mb 256 forces rung 2: the video
             stays in host RAM and fused epochs stream uint8 chunks
             (one H2D + one scan dispatch per chunk)
  disk       same video dumped to 132 PNG files, --host_budget_mb 128
             forces rung 3: frames decoded lazily per gather (DirFrames)

All three rungs share the flagship 720p geometry, seed, and shuffle
order, so final train PSNR must agree to bf16 noise — the parity check —
while s/epoch isolates the ladder's real H2D / decode cost.  Emits ONE
JSON (results/outofcore_metal.json) with per-rung epoch-1 (compile),
steady-state median s/epoch, and final PSNRs.

Usage: python -u tools/outofcore_metal.py [--epochs 30] [--skip resident,...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAPER = (
    "--synthetic_frames 132 --synthetic_hw 720 1280 "
    "--lower_width 96 --num_blocks 1 --frame_gap 1 "
    "--embed 1.25_40 --stem_dim_num 512_1 --reduction 2 --fc_hw_dim 9_16_26 "
    "--expansion 1 --single_res --loss Fusion6 --warmup 0.2 --lr_type cosine "
    "--strides 5 2 2 2 2 --conv_type conv -b 1 --lr 0.0005 --norm none "
    "--act swish --compute_dtype bfloat16 --branch_type ERB "
    "--ckpt_freq 1000 --eval_freq 1000"
)

# rank0.txt line shape (ops/metrics.py round_tensor emits bare
# comma-joined floats, no brackets):
#   [ts] Epoch[3/30] lr:4.2e-04 PSNR: 20.1,21.2 MSSSIM: 0.5,0.6 \
#   Time/epoch: Current:3.31 Average:5.02
EPOCH_RE = re.compile(
    r"Epoch\[(\d+)/\d+\].*?PSNR: ([0-9.,\-nan]+) .*?Current:([0-9.]+)"
)
EVAL_RE = re.compile(r"Eval at epoch \d+: PSNR ([0-9.,\-nan]+)")


def dump_png_frames(out_dir: str, n: int = 132, h: int = 720, w: int = 1280):
    """Write the photo video's frames as PNGs (the rung-3 input)."""
    sys.path.insert(0, REPO)
    from PIL import Image

    from repnerv_tpu.data.frames import photo_video

    frames, _ = photo_video(n, h, w, seed=0)
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n):
        p = os.path.join(out_dir, f"f{i:05d}.png")
        if not os.path.exists(p):
            Image.fromarray(frames[i]).save(p)
    return out_dir


def parse_log(log: str) -> dict:
    """Pull per-epoch seconds + final PSNRs out of a train log/rank0.txt."""
    epochs_seen = []
    for line in log.splitlines():
        m = EPOCH_RE.search(line)
        if m:
            final_stage = float(m.group(2).split(",")[-1])
            epochs_seen.append(
                (int(m.group(1)), final_stage, float(m.group(3)))
            )
    row: dict = {}
    if epochs_seen:
        cur = [c for _, _, c in epochs_seen]
        row.update(
            epoch1_s=round(cur[0], 2),
            steady_s_per_epoch=round(
                float(sorted(cur[1:])[len(cur[1:]) // 2])
                if len(cur) > 1 else cur[0], 3,
            ),
            epochs_seen=len(cur),
            final_train_psnr=round(epochs_seen[-1][1], 3),
        )
    spill = [ln for ln in log.splitlines() if "frame store:" in ln]
    if spill:
        row["spill_msg"] = spill[0].strip()
    ev = EVAL_RE.findall(log)
    if ev:
        row["final_eval_psnr"] = float(ev[-1].split(",")[-1])
    return row


def find_rank0(name: str) -> str | None:
    base = os.path.join(REPO, "result", f"ooc_{name}")
    for root, _, files in os.walk(base):
        if "rank0.txt" in files:
            return os.path.join(root, "rank0.txt")
    return None


def run_one(name: str, extra: str, epochs: int) -> dict:
    outf = f"ooc_{name}"
    cmd = (
        f"{sys.executable} -u -m repnerv_tpu.cli.train_main {PAPER} "
        f"-e {epochs} {extra} --outf {outf}"
    )
    print(f"=== {name}: {cmd}", flush=True)
    t0 = time.time()
    proc = subprocess.run(
        cmd.split(), cwd=REPO, capture_output=True, text=True
    )
    wall = time.time() - t0
    log = proc.stdout + proc.stderr
    tail = "\n".join(log.splitlines()[-25:])
    print(tail, flush=True)
    row = {
        "rung": name,
        "cmd_extra": extra,
        "epochs": epochs,
        "wall_s": round(wall, 1),
        "rc": proc.returncode,
    }
    row.update(parse_log(log))
    return row


def collect(epochs: int) -> list:
    """Rebuild rows from the on-disk rank0.txt logs (the runs persist even
    if the driving process died or its stdout parsing failed)."""
    rows = []
    extras = {
        "resident": "--dataset photo",
        "stream": "--dataset photo --hbm_budget_mb 256 --stream_chunk_mb 175",
        "disk": "--dataset oocdisk --data_dir data --host_budget_mb 128 "
                "--stream_chunk_mb 175",
    }
    for name, extra in extras.items():
        p = find_rank0(name)
        if p is None:
            continue
        with open(p) as f:
            row = {"rung": name, "cmd_extra": extra, "epochs": epochs,
                   "log": os.path.relpath(p, REPO)}
            row.update(parse_log(f.read()))
        rows.append(row)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--skip", default="")
    ap.add_argument(
        "--collect", action="store_true",
        help="skip running; rebuild the JSON from on-disk rank0.txt logs",
    )
    ap.add_argument(
        "--out", default=os.path.join(REPO, "results", "outofcore_metal.json")
    )
    args = ap.parse_args(argv)
    skip = set(args.skip.split(",")) if args.skip else set()

    rows = []
    if args.collect:
        rows = collect(args.epochs)
        skip = {"resident", "stream", "disk"}
    if "resident" not in skip:
        rows.append(
            run_one("resident", "--dataset photo", args.epochs)
        )
    if "stream" not in skip:
        rows.append(
            run_one(
                "stream",
                "--dataset photo --hbm_budget_mb 256 --stream_chunk_mb 175",
                args.epochs,
            )
        )
    if "disk" not in skip:
        d = dump_png_frames(os.path.join(REPO, "data", "oocdisk"))
        print(f"PNG frames at {d}", flush=True)
        rows.append(
            run_one(
                "disk",
                "--dataset oocdisk --data_dir data --host_budget_mb 128 "
                "--stream_chunk_mb 175",
                args.epochs,
            )
        )
    out = {
        "desc": (
            "out-of-core ladder on the real chip: identical flagship-720p "
            "fit (photo content, 132 frames, b=1) at all three rungs; "
            "final_train_psnr must agree to bf16 noise, steady_s_per_epoch "
            "is the ladder's cost (VERDICT r4 next #3)"
        ),
        "device": None,
        "rows": rows,
    }
    if not args.collect:  # a TPU client would collide with in-flight runs
        try:
            import jax

            out["device"] = str(jax.devices()[0])
        except Exception:
            pass
    else:
        out["device"] = "TPU v5 lite0 (collected from rank0.txt logs)"
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
