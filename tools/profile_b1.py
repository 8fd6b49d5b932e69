"""Per-op(-group) cost table for the b=1 flagship train step.

VERDICT r3 weak #1: the 24.4 ms/step b=1 number (fused Pallas train tail,
720p paper config, Fusion6 + metrics + Adam) had no backward decomposition.
The tunnel's per-dispatch RTT makes isolated-op timing meaningless (round-3
lesson: "91 TF/s isolated" was dispatch-bound), so every variant here is a
whole ``lax.scan`` over S steps of the REAL training recurrence — the same
amortization the fused epoch uses — and the table is built by ABLATION:

  fwd            forward + Fusion6 loss only (no grad, no update)
  head           + backward to the RGB head only
  blk{k}+        + backward through blocks k..end (params of stem and
                   blocks[:k] frozen via closure -> XLA DCEs their dX/dW)
  full-grad      backward to everything incl. the stem MLP
  +adam          full value_and_grad + masked Adam update (no metrics)
  +metrics       the shipped step: adds per-stage PSNR + MS-SSIM

Differences between consecutive rows attribute time to each block's
(dX + dW) pair, the optimizer, and the metrics.  Run on the real chip:

  python -u tools/profile_b1.py [--steps 33] [--reps 3] [--out results/...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=33)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames", type=int, default=33)
    ap.add_argument("--no_pallas_train", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "results", "profile_b1.json"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from repnerv_tpu.config import ModelConfig, TrainConfig
    from repnerv_tpu.data.frames import synthetic_video
    from repnerv_tpu.models.embedding import positional_encoding
    from repnerv_tpu.models.generator import apply_generator, init_generator
    from repnerv_tpu.ops.losses import multi_scale_loss
    from repnerv_tpu.ops.metrics import msssim_fn, psnr_fn
    from repnerv_tpu.train.loop import (
        TrainState, build_train_step_fn, make_optimizer,
    )
    from repnerv_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    mcfg = ModelConfig(
        branch_type="ERB",
        compute_dtype="bfloat16",
        use_pallas_train=not args.no_pallas_train,
    )
    cfg = TrainConfig(
        model=mcfg,
        epochs=300,
        warmup=0.2,
        lr=5e-3,
        lr_type="cosine",
        beta=0.5,
        loss_type="Fusion6",
        manual_seed=1,
        lr_frac_mode="sample",
    )
    S = args.steps
    video_u8, t_all = synthetic_video(args.frames, 720, 1280, seed=7)
    video = jnp.asarray(video_u8)
    t_all = jnp.asarray(t_all)

    params = init_generator(jax.random.PRNGKey(0), mcfg)
    tx = make_optimizer(cfg)
    n_blocks = len(params["blocks"])
    rows = jnp.arange(S) % args.frames  # b=1: one frame per step

    def fwd_loss(p, frame, t):
        embed = positional_encoding(t, mcfg.embed)
        outs = apply_generator(p, embed, mcfg, train=True)
        from repnerv_tpu.data.frames import adaptive_avg_pool

        targets = [adaptive_avg_pool(frame, o.shape[1:3]) for o in outs]
        return multi_scale_loss(outs, targets, cfg.loss_type, cfg.lw, True), (
            outs, targets,
        )

    def timed_scan(body, init_carry, label, results):
        """jit(scan(body)) over S steps; time reps with a scalar fetch."""
        fn = jax.jit(
            lambda carry, xs: jax.lax.scan(body, carry, xs)[0]
        )
        t0 = time.perf_counter()
        out = fn(init_carry, rows)
        val = float(jax.tree.leaves(out)[0].sum()) if hasattr(
            jax.tree.leaves(out)[0], "sum") else float(jax.tree.leaves(out)[0])
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(init_carry, rows)
            leaf = jax.tree.leaves(out)[0]
            val = float(leaf.sum()) if getattr(leaf, "ndim", 0) else float(leaf)
            best = min(best, time.perf_counter() - t0)
        ms = best / S * 1e3
        results[label] = {"ms_per_step": round(ms, 3),
                          "compile_s": round(compile_s, 1)}
        print(f"{label:>12}: {ms:8.3f} ms/step   (compile {compile_s:.0f}s, "
              f"probe {val:.4g})", flush=True)
        return ms

    results = {}

    # ---- fwd only -----------------------------------------------------------
    def body_fwd(acc, i):
        frame = video[i][None].astype(jnp.float32) / 255.0
        loss, _ = fwd_loss(params, frame, t_all[i][None])
        return acc + loss, None

    timed_scan(body_fwd, jnp.zeros(()), "fwd", results)

    # ---- backward truncations ----------------------------------------------
    # trainable = heads + blocks[k:]; stem/blocks[:k] closed over (frozen).
    # The scan carry accumulates a scalar from the grads so they stay live.
    def make_body_grad(k):
        def body(acc, i):
            frame = video[i][None].astype(jnp.float32) / 255.0

            def f(trainable):
                p = {
                    "stem": params["stem"],
                    "blocks": list(params["blocks"][:k]) + list(trainable["blocks"]),
                    "heads": trainable["heads"],
                }
                for key in params:
                    if key not in p:
                        p[key] = params[key]
                return fwd_loss(p, frame, t_all[i][None])[0]

            sub = {"blocks": list(params["blocks"][k:]), "heads": params["heads"]}
            g = jax.grad(f)(sub)
            s = sum(jnp.sum(x * x) for x in jax.tree.leaves(g))
            return acc + s, None

        return body

    timed_scan(make_body_grad(n_blocks), jnp.zeros(()), "head", results)
    for k in range(n_blocks - 1, -1, -1):
        timed_scan(make_body_grad(k), jnp.zeros(()), f"blk{k}+", results)

    # ---- full grad incl. stem ------------------------------------------------
    def body_fullgrad(acc, i):
        frame = video[i][None].astype(jnp.float32) / 255.0
        g = jax.grad(lambda p: fwd_loss(p, frame, t_all[i][None])[0])(params)
        s = sum(jnp.sum(x * x) for x in jax.tree.leaves(g))
        return acc + s, None

    timed_scan(body_fullgrad, jnp.zeros(()), "full-grad", results)

    # ---- + adam (no metrics) --------------------------------------------------
    def body_adam(state, i):
        frame = video[i][None].astype(jnp.float32) / 255.0
        loss, grads = jax.value_and_grad(
            lambda p: fwd_loss(p, frame, t_all[i][None])[0]
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p - 5e-3 * u.astype(p.dtype), state.params, updates
        )
        return TrainState(new_params, opt_state, state.step + 1), None

    state0 = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))
    timed_scan(body_adam, state0, "+adam", results)

    # ---- the shipped step (loss + metrics + schedule) -------------------------
    step_fn = build_train_step_fn(cfg, steps_per_epoch=args.frames,
                                  with_msssim=True)

    def body_ship(state, i):
        frame = video[i][None].astype(jnp.float32) / 255.0
        state, aux = step_fn(state, frame, t_all[i][None], None)
        return state, None

    timed_scan(body_ship, state0, "+metrics", results)

    # ---- attribution table ----------------------------------------------------
    order = (["fwd", "head"]
             + [f"blk{k}+" for k in range(n_blocks - 1, -1, -1)]
             + ["full-grad", "+adam", "+metrics"])
    print("\nincremental attribution (each row minus the previous):")
    prev = None
    deltas = {}
    for name in order:
        ms = results[name]["ms_per_step"]
        d = ms - prev if prev is not None else ms
        deltas[name] = round(d, 3)
        print(f"{name:>12}: {ms:8.3f} ms/step   (+{d:6.3f})")
        prev = ms
    results["_deltas"] = deltas
    results["_config"] = {
        "steps": S, "reps": args.reps, "frames": args.frames,
        "pallas_train": not args.no_pallas_train,
        "model": "paper 720p ERB bf16 Fusion6 b=1",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwritten {args.out}")


if __name__ == "__main__":
    main()
