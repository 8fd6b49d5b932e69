"""Race the ACTUAL torch reference train() loop to convergence — medium scale.

The CI trajectory-parity test (tests/test_reference_parity.py) proves
step-for-step dynamics at 12x16; this script settles the remaining claim
class behind the flagship quality numbers: a matched-data endpoint
comparison at a resolution where SSIM windows, photographic multi-octave
content, and tens of epochs matter (VERDICT r3 missing #1).

One experiment, two frameworks, identical everything:
  * same photo video (data/frames.py photo_video — real photograph content)
  * same bridged init (torch Generator init -> train/checkpoint.py bridge)
  * same per-epoch permutations (seed * 100003 + epoch, drop_last)
  * same b=1 ERB Fusion6 cosine schedule with the reference's SAMPLE-count
    lr denominator (utils.py:240-259 adjust_lr semantics)
Ours runs train/loop.py (jitted, CPU for one-process determinism); theirs
runs the reference semantics on torch/CPU by EXECUTING /root/reference's
model.py / utils.py (loss_fn, adjust_lr, psnr_fn) — reference code is
loaded and called, never copied.  jax work happens before torch (1-core
box quirk, see .claude/skills/verify/SKILL.md).

Output: per-epoch PSNR/loss curves for both sides + the endpoint delta,
written to results/reference_race.json and printed as a table.

Reference loop semantics mirrored: /root/reference/main_train.py:222-290.

Usage (from the repo root; ~15-25 min on the 1-core box):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 \
      python -u tools/race_reference.py
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time
import types
from types import SimpleNamespace

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Reference modules with pytorch_msssim satisfied by the test vendor."""
    vendor = _load("_vendor_msssim", os.path.join(REPO, "tests", "_vendor_msssim.py"))
    stub = types.ModuleType("pytorch_msssim")
    stub.ssim = vendor.ssim
    stub.ms_ssim = vendor.ms_ssim
    sys.modules.setdefault("pytorch_msssim", stub)
    model = _load("_ref_model", os.path.join(REF, "model.py"))
    utils = _load("_ref_utils", os.path.join(REF, "utils.py"))
    return SimpleNamespace(model=model, utils=utils)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--fc_hw_dim", default="3_4_24")
    ap.add_argument("--strides", type=int, nargs="+", default=[4, 4, 2])
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--init_seed", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO, "results", "reference_race.json"))
    ap.add_argument("--skip_theirs", action="store_true",
                    help="only run our side (debugging)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from repnerv_tpu.config import ModelConfig, TrainConfig
    from repnerv_tpu.data.frames import FrameStore, photo_video
    from repnerv_tpu.train.loop import (
        TrainState, make_optimizer, make_train_step, run_epoch,
    )

    # default geometry: 96x128 output via strides 4*4*2 from a 3x4 stem
    mcfg = ModelConfig(
        embed="1.25_8",
        stem_dim_num="48_1",
        fc_hw_dim=args.fc_hw_dim,
        strides=tuple(args.strides),
        lower_width=6,
        reduction=2,
        norm="none",
        act="swish",
        single_res=True,
        sigmoid=False,
        branch_type="ERB",
        use_pallas_decode=False,
        use_pallas_train=False,
    )
    up = int(np.prod(mcfg.strides))
    h, w = mcfg.fc_hwd[0] * up, mcfg.fc_hwd[1] * up
    tcfg = TrainConfig(
        model=mcfg,
        epochs=args.epochs,
        warmup=0.2,
        lr=args.lr,
        lr_type="cosine",
        beta=0.5,
        loss_type="Fusion6",
        manual_seed=args.seed,
        lr_frac_mode="sample",  # reference adjust_lr denominator
    )
    b = 1  # the reference's headline regime (main_train.py:229)

    video_u8, t_all = photo_video(args.frames, h, w, seed=0)

    # ---- shared bridged init (torch init -> our params) --------------------
    # torch must not run any conv before jax on this box; state_dict alone is
    # safe (no conv dispatch), and the reference model forward waits until
    # our side has finished.
    import torch

    from repnerv_tpu.train.checkpoint import torch_state_to_params

    torch.manual_seed(args.init_seed)
    tmodel = ref_model_for(mcfg)
    state_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = torch_state_to_params(state_np, mcfg)

    # ---- our side (jax, CPU) ----------------------------------------------
    store = FrameStore(frames=jnp.asarray(video_u8), t=t_all)
    tx = make_optimizer(tcfg)
    state = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))
    step = make_train_step(tcfg, steps_per_epoch=args.frames // b, with_msssim=False)
    ours = {"psnr": [], "loss": [], "lr": []}
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        state, m = run_epoch(state, step, store, tcfg, epoch)
        ours["psnr"].append(float(m.psnr[-1]))
        ours["loss"].append(m.loss)
        ours["lr"].append(m.lr)
        print(f"[ours  ] epoch {epoch + 1}/{args.epochs}  "
              f"loss {m.loss:.5f}  PSNR {m.psnr[-1]:.3f}  lr {m.lr:.2e}",
              flush=True)
    ours_wall = time.perf_counter() - t0

    theirs = {"psnr": [], "loss": [], "lr": []}
    theirs_wall = None
    if not args.skip_theirs:
        # ---- reference loop (torch, CPU) -----------------------------------
        import torch.nn.functional as F

        ref = REF_MODULES
        tmodel = tmodel.train()
        opt = torch.optim.Adam(tmodel.parameters(), betas=(0.5, 0.999))
        pe = ref.utils.PositionalEncoding(mcfg.embed)
        targs = SimpleNamespace(
            loss_type="Fusion6",
            lw=1.0,
            lr=tcfg.lr,
            lr_type="cosine",
            warmup=int(tcfg.warmup * args.epochs),  # main_train.py:111
            epochs=args.epochs,
            lr_steps=[],
        )
        t0 = time.perf_counter()
        for epoch in range(args.epochs):
            losses, psnrs = [], []
            lr = 0.0
            for i, (rows, t) in enumerate(
                store.epoch_batches(
                    b, shuffle=True,
                    seed=tcfg.manual_seed * 100003 + epoch, drop_last=True,
                )
            ):
                data = torch.from_numpy(
                    video_u8[rows].astype(np.float32).transpose(0, 3, 1, 2) / 255.0
                )
                emb = pe(torch.from_numpy(np.asarray(t)))
                output_list = tmodel(emb)
                target_list = [
                    F.adaptive_avg_pool2d(data, x.shape[-2:]) for x in output_list
                ]
                loss_list = [
                    ref.utils.loss_fn(o, tg, targs)
                    for o, tg in zip(output_list, target_list)
                ]
                loss_sum = sum(
                    loss_list[j] * (targs.lw if j < len(loss_list) - 1 else 1)
                    for j in range(len(loss_list))
                )
                lr = ref.utils.adjust_lr(opt, epoch % args.epochs, i,
                                         args.frames, targs)
                opt.zero_grad()
                loss_sum.backward()
                opt.step()
                losses.append(float(loss_sum.detach()))
                psnrs.append(
                    ref.utils.psnr_fn(output_list, target_list).mean(0).numpy()
                )
            theirs["psnr"].append(float(np.stack(psnrs).mean(0)[-1]))
            theirs["loss"].append(float(np.mean(losses)))
            theirs["lr"].append(lr)
            print(f"[theirs] epoch {epoch + 1}/{args.epochs}  "
                  f"loss {theirs['loss'][-1]:.5f}  "
                  f"PSNR {theirs['psnr'][-1]:.3f}  lr {lr:.2e}", flush=True)
        theirs_wall = time.perf_counter() - t0

    result = {
        "config": {
            "frames": args.frames, "hw": [h, w], "epochs": args.epochs,
            "batch": b, "lr": args.lr, "loss": "Fusion6",
            "branch_type": "ERB", "lr_type": "cosine", "warmup": 0.2,
            "model": {"embed": mcfg.embed, "stem_dim_num": mcfg.stem_dim_num,
                      "fc_hw_dim": mcfg.fc_hw_dim, "strides": list(mcfg.strides)},
            "data": "photo_video seed 0 (grace_hopper pan/zoom)",
            "init": f"torch.manual_seed({args.init_seed}) bridged",
        },
        "ours": ours,
        "theirs": theirs,
        "ours_wall_s": round(ours_wall, 1),
        "theirs_wall_s": round(theirs_wall, 1) if theirs_wall else None,
    }
    if theirs["psnr"]:
        result["endpoint_delta_db"] = round(ours["psnr"][-1] - theirs["psnr"][-1], 4)
        result["max_abs_psnr_gap_db"] = round(
            float(np.max(np.abs(np.array(ours["psnr"]) - np.array(theirs["psnr"])))), 4
        )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("ours", "theirs", "config")}))
    return result


def ref_model_for(mcfg):
    ref = REF_MODULES
    return ref.model.Generator(
        embed_length=mcfg.embed_length,
        stem_dim_num=mcfg.stem_dim_num,
        fc_hw_dim=mcfg.fc_hw_dim,
        expansion=mcfg.expansion,
        num_blocks=mcfg.num_blocks,
        norm=mcfg.norm,
        act=mcfg.act,
        bias=mcfg.bias,
        reduction=mcfg.reduction,
        conv_type=mcfg.conv_type,
        stride_list=list(mcfg.strides),
        sin_res=mcfg.single_res,
        lower_width=mcfg.lower_width,
        sigmoid=mcfg.sigmoid,
        deploy=mcfg.deploy,
        branch_type=mcfg.branch_type,
    ).eval()


REF_MODULES = None

if __name__ == "__main__":
    REF_MODULES = load_reference()
    main()
