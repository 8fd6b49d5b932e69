"""A/B the shipped b=1 train step with the fused epilogue-backward kernel
(pallas_kernels/train_tail.py FUSED_BWD) on vs off — the round-4 follow-up
to the roofline's prediction that fusing the 4-6 serial backward groups per
trailing stage removes most of the per-dispatch latency floor.

Same scan-amortized methodology as tools/profile_b1.py (whole lax.scan of
the REAL step over S frames, scalar fetch per rep).

  python -u tools/profile_fused_bwd_ab.py [--steps 33] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=33)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "results", "profile_fused_bwd_ab.json")
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import repnerv_tpu.pallas_kernels.train_tail as tt
    from repnerv_tpu.config import ModelConfig, TrainConfig
    from repnerv_tpu.data.frames import synthetic_video
    from repnerv_tpu.train.loop import build_train_step_fn, init_train_state
    from repnerv_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    mcfg = ModelConfig(
        branch_type="ERB", compute_dtype="bfloat16", use_pallas_train=True
    )
    cfg = TrainConfig(
        model=mcfg, epochs=300, warmup=0.2, lr=5e-4, lr_type="cosine",
        beta=0.5, loss_type="Fusion6", manual_seed=1,
    )
    S = args.steps
    video_u8, t_all = synthetic_video(S, 720, 1280, seed=7)
    video = jnp.asarray(video_u8)
    t_all = jnp.asarray(t_all)
    rows = jnp.arange(S) % S

    results = {}
    for fused in (False, True):
        tt.FUSED_BWD = fused  # read at trace time inside _fst_bwd
        step_fn = build_train_step_fn(cfg, steps_per_epoch=S, with_msssim=True)

        def epoch(state, xs):
            def body(st, i):
                frame = video[i][None].astype(jnp.float32) / 255.0
                st, aux = step_fn(st, frame, t_all[i][None], None)
                return st, aux["loss"]

            return jax.lax.scan(body, state, xs)

        fn = jax.jit(epoch)
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        t0 = time.perf_counter()
        st, losses = fn(state, rows)
        probe = float(jnp.sum(losses))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.reps):
            st2 = init_train_state(jax.random.PRNGKey(0), cfg)
            t0 = time.perf_counter()
            _, losses = fn(st2, rows)
            probe = float(jnp.sum(losses))
            best = min(best, time.perf_counter() - t0)
        ms = best / S * 1e3
        label = "fused_bwd" if fused else "xla_bwd"
        results[label] = {"ms_per_step": round(ms, 3), "compile_s": round(compile_s, 1)}
        print(
            f"{label:>10}: {ms:8.3f} ms/step  (compile {compile_s:.0f}s, "
            f"loss-sum {probe:.4f})",
            flush=True,
        )

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"written {args.out}")


if __name__ == "__main__":
    main()
