"""Multi-video suite driver — fit N videos, report a per-video table.

The reference's UVG workflow is seven separate shell invocations, one per
video (reference README.md:63-111; model.py:37-49 ``vid_list``).  This
driver fits the whole suite in one command:

* ``--suite_mode sequential`` (default on one chip): per-video fits reusing
  the fused-epoch train machinery — reference-parity behavior.
* ``--suite_mode parallel`` (needs >= n_videos devices): the stacked
  per-video states shard one-fit-per-device over a ``("video",)`` mesh and
  every epoch is ONE dispatch for the whole suite (parallel/suite.py) —
  the suite finishes in a single video's wall-clock while preserving the
  quality-critical ``-b 1`` regime inside each fit.

After fitting, each video's params are (optionally) pushed through the
prune/quant/entropy pipeline for BPP, and the per-video + aggregate
PSNR/MS-SSIM/BPP table lands in ``--suite_out`` (default
``results/uvg_suite.json``).

Synthetic stand-ins: with ``--dataset synth`` each video v draws its own
deterministic content (seed = manual_seed + v); ``--dataset photo`` gives
each video a distinct rotation/mirror + camera path over real photographic
texture (data/frames.py photo_video); with a real frame dir the ``--vid``
subsets select the videos, one fit per subset entry.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..compress.pipeline import compress
from ..config import TrainConfig
from ..data.frames import FrameStore, photo_video, synthetic_video
from ..models.generator import generator_to_deploy
from ..train.loop import (
    init_train_state,
    make_epoch_fn,
    run_fused_epoch,
)
from .args import args_to_config, build_parser


def _suite_stores(cfg: TrainConfig, n_videos: int) -> list:
    """One FrameStore per video.

    Real data: a dataset directory whose entries are PER-VIDEO
    SUBDIRECTORIES of frames (the reference's UVG layout — one frame dir
    per video, one ``main_train.py`` invocation each, README.md:63-111)
    maps one subdirectory to one suite video.  A FLAT directory of frames
    is split into ``n_videos`` contiguous chunks of the ``--vid``-selected
    (or all) frames, each chunk one video.
    """
    stores = []
    if cfg.data.dataset == "synth" or (
        cfg.data.dataset in ("photo", "corpus") and cfg.data.synthetic_frames > 0
    ):
        # photo -> distinct content transform + camera path per seed
        # (data/frames.py photo_video); corpus -> a different CONTENT CLASS
        # per video (photo/MRI/terrain/text, data/frames.py corpus_video);
        # synth -> distinct value-noise draw
        from ..data.frames import corpus_video

        gen = {
            "photo": photo_video, "corpus": corpus_video
        }.get(cfg.data.dataset, synthetic_video)
        h, w = cfg.data.synthetic_hw
        for v in range(n_videos):
            frames, t = gen(
                cfg.data.synthetic_frames, h, w, seed=cfg.manual_seed + v
            )
            stores.append(
                FrameStore(jnp.asarray(frames), t, cfg.data.frame_gap)
            )
        return stores

    from ..data.frames import load_frame_dir

    root = os.path.join(cfg.data.data_dir, cfg.data.dataset.lower())
    subdirs = sorted(
        d
        for d in (os.listdir(root) if os.path.isdir(root) else [])
        if os.path.isdir(os.path.join(root, d))
    )
    if subdirs:
        if len(subdirs) < n_videos:
            raise FileNotFoundError(
                f"{root} has {len(subdirs)} video subdirectories, "
                f"--n_videos {n_videos} requested"
            )
        for name in subdirs[:n_videos]:
            # --vid keeps its reference meaning WITHIN each video's dir
            frames, t = load_frame_dir(
                os.path.join(root, name), cfg.data.vid
            )
            stores.append(
                FrameStore(
                    jnp.asarray(frames) if cfg.data.cache_device else frames,
                    t,
                    cfg.data.frame_gap,
                )
            )
    else:
        frames, t = load_frame_dir(root, cfg.data.vid)
        if len(frames) < n_videos:
            raise ValueError(
                f"{len(frames)} frames cannot form {n_videos} suite videos"
            )
        for chunk in np.array_split(np.arange(len(frames)), n_videos):
            arr = frames[chunk]
            stores.append(
                FrameStore(
                    jnp.asarray(arr) if cfg.data.cache_device else arr,
                    t[chunk],
                    cfg.data.frame_gap,
                )
            )
    return stores


def _measure_video(
    params, store, cfg: TrainConfig, v: int, eval_steps: dict | None = None
) -> dict:
    """Deploy -> (optional) compress -> PSNR/MS-SSIM/BPP for one video.

    ``eval_steps`` memoizes the jitted eval fn across videos — suite videos
    share shapes and config, so without it each video recompiles an
    identical eval graph."""
    reparam = cfg.model.branch_type != "NeRV_vanilla"
    mcfg = cfg.model
    if reparam:
        params, mcfg = generator_to_deploy(params, mcfg)
    row: dict = {"video": v}
    if cfg.quant_bit != -1 or cfg.prune_ratio < 1.0:
        ccfg = dataclasses.replace(cfg, model=mcfg, finetune=False)
        # one decodable artifact per suite video, like the reference's
        # one-checkpoint-per-UVG-video output layout (README.md:63-111)
        bitstream_path = None
        if cfg.save_bitstream and cfg.quant_bit != -1:
            outdir = os.path.join(cfg.outf or "result/suite", "bitstreams")
            os.makedirs(outdir, exist_ok=True)
            bitstream_path = os.path.join(
                outdir, f"video{v}_q{cfg.quant_bit}.rnvb"
            )
        params, report = compress(
            params, ccfg, store, deploy_after=False,
            bitstream_path=bitstream_path,
        )
        row.update(bpp=report.bpp, efficiency=report.efficiency)
        if bitstream_path:
            acct = report.extras["bitstream"]
            row.update(
                rnvb=bitstream_path,
                rnvb_bytes=int(acct["file_bytes"]),
                bpp_all_in=float(acct.get("bpp_all_in", 0.0)),
            )
    from ..train.loop import evaluate, make_eval_step

    ecfg = dataclasses.replace(cfg, model=mcfg)
    with_msssim = min(store.hw) > 160
    key = (mcfg.deploy, with_msssim)
    if eval_steps is None:
        eval_steps = {}
    if key not in eval_steps:
        eval_steps[key] = make_eval_step(ecfg, with_msssim)
    psnr, msssim = evaluate(params, eval_steps[key], store, ecfg)
    row.update(psnr=float(psnr[-1]), msssim=float(msssim[-1]))
    return row


def flag_divergent(
    train_early: list,
    train_final: list,
    *,
    spread_db: float = 12.0,
    floor_db: float = 8.0,
) -> list:
    """Indices of suite videos whose training collapsed.

    Three tests, any of which flags (the 150-epoch 1080p corpus suite
    shipped a video at 6.96 dB next to its class twin at 35.86 — an init
    collapse the original ``final < early`` test would MISS whenever the
    collapse happens before the 20%-of-schedule snapshot, because then
    final ~= early; see BENCHMARKS "MRI variant-1 collapse"):

    * late collapse:  final train PSNR fell below the 20%-of-schedule
      PSNR (a healthy cosine fit is monotone-ish after warmup) — with a
      0.1 dB tolerance so a saturated flat fit isn't flagged on bf16 noise;
    * early collapse: final is an absolute outlier, > ``spread_db`` below
      the suite median (content classes legitimately spread ~24 dB at
      fixed capacity, so the default is wide);
    * sanity floor:   final below ``floor_db`` — under random-output PSNR
      for natural content, no legitimate class sits there.
    """
    if not train_final:
        return []
    med = float(np.median(train_final))
    flagged = []
    for v, fin in enumerate(train_final):
        early = train_early[v] if v < len(train_early) else None
        late = early is not None and fin < early - 0.1
        if late or fin < med - spread_db or fin < floor_db:
            flagged.append(v)
    return flagged


def _fit_one(cfg, store, key, v, epoch_fns, with_msssim, early_epoch):
    """One sequential video fit; returns (host params, early, final PSNR).

    ``epoch_fns`` memoizes one jitted epoch fn per DISTINCT step count
    (equal-length suites share one — no per-video retrace).  steps_per_epoch
    is traced into the LR schedule (build_train_step_fn), so a short video
    reusing a longer video's fn would pace its cosine wrong."""
    b = cfg.data.batch_size
    steps_v = max(store.num_samples // b, 1)
    if steps_v not in epoch_fns:
        epoch_fns[steps_v] = make_epoch_fn(cfg, steps_v, with_msssim=with_msssim)
    state = init_train_state(key, cfg)
    # per-video seed offset matches parallel/suite.py suite_perms
    vcfg = dataclasses.replace(cfg, manual_seed=cfg.manual_seed + v)
    # in-run half of the recovery story (train/recovery.py): stops a
    # q5_text_static-style mid-training collapse from burning the rest of
    # this video's schedule; the post-hoc flag+refit below stays as the
    # cross-video outlier net
    from ..train.recovery import DivergenceGuard

    guard = DivergenceGuard(
        cfg, jax.jit(lambda p: jax.tree.map(lambda x: x + 0, p)),
        log=lambda msg: print(f"video {v}: {msg}"),
    )
    early = final = None
    for epoch in range(cfg.epochs):
        state, m = run_fused_epoch(state, epoch_fns[steps_v], store, vcfg, epoch)
        state, _ = guard.observe(epoch, float(m.psnr[-1]), state)
        if epoch + 1 == early_epoch:
            early = float(m.psnr[-1])
    if cfg.epochs > 0:
        state, restored = guard.finalize(state)
        final = guard.best_psnr if restored else float(m.psnr[-1])
    return jax.tree.map(np.asarray, state.params), early, final


def _refit_flagged(
    flagged, per_video_params, train_early, train_final,
    stores, cfg, vkeys, epoch_fns, with_msssim, early_epoch, max_refits,
):
    """Refit collapsed videos with fresh init keys (bounded retries).

    The reference's per-video UVG workflow makes a rerun a manual shell
    invocation (README.md:63-111); here a flagged video is automatically
    refit from ``fold_in(vkeys[v], attempt)`` — a different draw than both
    the original AND the standalone ``--content_seed`` repro — keeping the
    best final train PSNR across attempts.  Returns per-video refit info."""
    info = {}
    for v in flagged:
        best_final, best_params = train_final[v], per_video_params[v]
        best_early, attempts = train_early[v], 0
        for attempt in range(1, max_refits + 1):
            attempts = attempt
            key = jax.random.fold_in(vkeys[v], 1000 + attempt)
            params, early, final = _fit_one(
                cfg, stores[v], key, v, epoch_fns, with_msssim, early_epoch
            )
            print(
                f"refit video {v} attempt {attempt}: train PSNR "
                f"{final:.2f} dB (was {train_final[v]:.2f})"
            )
            if final is not None and final > best_final:
                best_final, best_params, best_early = final, params, early
            trial_final = list(train_final)
            trial_early = list(train_early)
            trial_final[v], trial_early[v] = best_final, best_early
            if v not in flag_divergent(trial_early, trial_final):
                break
        info[v] = {
            "initial_train_psnr": train_final[v],
            "refit_train_psnr": best_final,
            "attempts": attempts,
        }
        per_video_params[v] = best_params
        train_final[v], train_early[v] = best_final, best_early
    return info


def run_suite(
    cfg: TrainConfig, n_videos: int, mode: str, suite_out: str,
    max_refits: int = 2,
) -> dict:
    from ..utils.misc import enable_compilation_cache

    enable_compilation_cache()
    stores = _suite_stores(cfg, n_videos)
    b = cfg.data.batch_size
    with_msssim = min(stores[0].hw) > 160
    t0 = time.time()

    if mode == "parallel":
        from jax.sharding import Mesh
        from ..parallel.suite import (
            init_suite_states,
            make_suite_epoch_fn,
            extract_video_params,
            run_suite_epoch,
            shard_suite,
        )

        n_dev = len(jax.devices())
        axis = min(n_dev, n_videos)
        if n_videos % axis != 0:
            print(
                f"WARNING: {n_videos} videos do not divide over {n_dev} "
                "devices; falling back to sequential"
            )
            return run_suite(cfg, n_videos, "sequential", suite_out)
        mesh = Mesh(np.asarray(jax.devices()[:axis]), ("video",))
        # UVG-style suites mix lengths (ShakeNDry: 300 frames vs 600): the
        # stack zero-pads to the longest video (padded frames are NEVER
        # sampled — suite_perms indexes each video's true frames only, so
        # shorter videos revisit frames within the epoch), and every video
        # runs the longest video's step count so SPMD stays uniform.
        n_frames_list = [int(s.frames.shape[0]) for s in stores]
        max_n = max(n_frames_list)
        if len(set(n_frames_list)) > 1:
            print(
                f"suite videos have unequal lengths {n_frames_list}; "
                f"zero-padding the stack to {max_n} frames (pad never "
                "sampled; shorter videos cycle their own frames per epoch)"
            )
        steps = max(max(s.num_samples for s in stores) // b, 1)

        def _pad(x, n):
            x = jnp.asarray(x)
            if x.shape[0] == n:
                return x
            pad = jnp.zeros((n - x.shape[0],) + x.shape[1:], x.dtype)
            return jnp.concatenate([x, pad])

        videos = shard_suite(
            jnp.stack([_pad(s.frames, max_n) for s in stores]), mesh
        )
        t_all = shard_suite(
            jnp.stack(
                [_pad(jnp.asarray(s.t, jnp.float32), max_n) for s in stores]
            ),
            mesh,
        )
        states = shard_suite(
            init_suite_states(
                jax.random.PRNGKey(cfg.manual_seed), cfg, n_videos
            ),
            mesh,
        )
        epoch_fn = make_suite_epoch_fn(
            cfg, steps, mesh=mesh, with_msssim=with_msssim
        )
        early_epoch = max(cfg.epochs // 5, 1)
        train_early = train_final = None
        m = None
        for epoch in range(cfg.epochs):
            states, m = run_suite_epoch(
                states, epoch_fn, videos, t_all, cfg, epoch, steps, mesh,
                n_frames=n_frames_list,
            )
            if epoch + 1 == early_epoch:
                train_early = [float(p[-1]) for p in m["psnr"]]
            if epoch % max(cfg.print_freq // steps, 1) == 0 or epoch == cfg.epochs - 1:
                ps = " ".join(f"{p[-1]:.2f}" for p in m["psnr"])
                print(f"epoch {epoch + 1}/{cfg.epochs} per-video PSNR: {ps}")
        train_final = (
            [float(p[-1]) for p in m["psnr"]] if m is not None else None
        )
        per_video_params = [
            extract_video_params(states, v) for v in range(n_videos)
        ]
        vkeys = jax.random.split(
            jax.random.PRNGKey(cfg.manual_seed), len(stores)
        )
        epoch_fns: dict = {}
    else:
        per_video_params = []
        # same per-video keys as parallel/suite.py init_suite_states, so the
        # two modes produce identical fits (pinned by test_suite.py)
        vkeys = jax.random.split(
            jax.random.PRNGKey(cfg.manual_seed), len(stores)
        )
        epoch_fns = {}
        early_epoch = max(cfg.epochs // 5, 1)
        train_early, train_final = [], []
        for v, store in enumerate(stores):
            params, early, final = _fit_one(
                cfg, store, vkeys[v], v, epoch_fns, with_msssim, early_epoch
            )
            train_early.append(early)
            train_final.append(final)
            if final is not None:
                print(f"video {v}: final train PSNR {final:.2f}")
            per_video_params.append(params)
        if cfg.epochs == 0:
            train_early = train_final = None

    # Divergence detection + bounded auto-refit BEFORE measurement, so no
    # headline artifact carries a collapsed fit (the 150-epoch 1080p corpus
    # suite shipped video 4 at 6.96 dB from an unlucky init draw while the
    # SAME content trained standalone to 35.85 dB — BENCHMARKS "MRI
    # variant-1 collapse").
    refit_info = {}
    detect = bool(train_early and train_final) and cfg.epochs >= 10
    if detect:
        flagged = flag_divergent(train_early, train_final)
        for v in flagged:
            synthetic = cfg.data.dataset in ("synth", "photo", "corpus") and (
                cfg.data.dataset == "synth" or cfg.data.synthetic_frames > 0
            )
            hint = (
                f"; reproduce it standalone via --content_seed "
                f"{cfg.manual_seed + v}" if synthetic else ""
            )
            print(
                f"WARNING: video {v} collapsed — train PSNR "
                f"{train_final[v]:.2f} dB at the end vs "
                f"{train_early[v]:.2f} dB at epoch {early_epoch} "
                f"(suite median {float(np.median(train_final)):.2f}).  "
                f"Likely an init/content interaction; refitting with a "
                f"fresh init key (up to {max_refits} attempts){hint}."
            )
        if flagged and max_refits > 0:
            refit_info = _refit_flagged(
                flagged, per_video_params, train_early, train_final,
                stores, cfg, vkeys, epoch_fns, with_msssim, early_epoch,
                max_refits,
            )

    fit_s = time.time() - t0
    eval_steps: dict = {}
    rows = [
        _measure_video(p, s, cfg, v, eval_steps)
        for v, (p, s) in enumerate(zip(per_video_params, stores))
    ]
    if detect:
        still_bad = set(flag_divergent(train_early, train_final))
        for v, r in enumerate(rows):
            r["train_psnr"] = train_final[v]
            if v in still_bad:
                r["diverged"] = True
            if v in refit_info:
                r["refit"] = refit_info[v]
    result = {
        "mode": mode,
        "n_videos": n_videos,
        "epochs": cfg.epochs,
        "fit_seconds": fit_s,
        "videos": rows,
        "mean_psnr": float(np.mean([r["psnr"] for r in rows])),
        "mean_msssim": float(np.mean([r["msssim"] for r in rows])),
    }
    if all("bpp" in r for r in rows):
        result["mean_bpp"] = float(np.mean([r["bpp"] for r in rows]))
    os.makedirs(os.path.dirname(suite_out) or ".", exist_ok=True)
    with open(suite_out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return result


def main(argv=None):
    p = build_parser(eval_mode=False)
    p.add_argument("--n_videos", type=int, default=7, help="suite size (UVG: 7)")
    p.add_argument(
        "--suite_mode",
        default="sequential",
        choices=["sequential", "parallel"],
        help="parallel = one fit per device over a ('video',) mesh",
    )
    p.add_argument("--suite_out", default="results/uvg_suite.json")
    p.add_argument(
        "--max_refits", type=int, default=2,
        help="bounded fresh-init retries for videos the divergence "
        "detector flags (0 disables auto-refit)",
    )
    a = p.parse_args(argv)
    cfg = args_to_config(a)
    return run_suite(cfg, a.n_videos, a.suite_mode, a.suite_out, a.max_refits)


if __name__ == "__main__":
    main()
