"""Per-iteration and per-serial-op-group latency floors of a lax.scan on
this backend (VERDICT r4 next #4 — re-baseline the b=1 roofline).

Round 3 measured 0.97 ms per EMPTY scan iteration; mid-round-4 the same
probe read 0.135 ms while the real b=1 train step went 20.9 -> 35.1 ms.
Hypothesis to test: the per-ITERATION dispatch floor and the per-serial-
GROUP cost inside one iteration are now different quantities — a backend
can make iteration boundaries cheap while serialized small ops inside the
body still each pay a fixed latency.

Probes (all jit(scan) over S iterations, forced completion via a scalar
fetch — block_until_ready returns early on this backend):

  empty       body = carry + 0.0 * i                  (iteration floor)
  tiny        body = carry + sum of one 128x128 dot   (1 group)
  chain-K     body = K DEPENDENT 128x128 dots, distinct weights so XLA
              cannot fuse or reorder them              (K serial groups)

ms/iter vs K gives the per-serial-group cost as the slope; the intercept
is the iteration floor.  Compare with results/profile_b1.json's op-group
table to explain where the b=1 step's time moved between backends.

Usage: python -u tools/probe_scan_floor.py [--steps 200] [--reps 3]
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
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "results", "probe_scan_floor.json")
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from repnerv_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    S = args.steps
    results: dict = {"steps": S, "reps": args.reps}

    def timed(fn, init, label):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        val = float(jfn(init))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            val = float(jfn(init))
            best = min(best, time.perf_counter() - t0)
        ms = best / S * 1e3
        results[label] = {"ms_per_iter": round(ms, 4), "compile_s": round(compile_s, 1)}
        print(f"{label:>10}: {ms:8.4f} ms/iter (compile {compile_s:.0f}s, probe {val:.4g})",
              flush=True)
        return ms

    def empty(x):
        def body(c, i):
            return c + 0.0 * i, None
        return jax.lax.scan(body, x, jnp.arange(S, dtype=jnp.float32))[0]

    timed(empty, jnp.float32(0.0), "empty")

    # K dependent 128x128 bf16 dots with DISTINCT weights (closure consts):
    # each dot needs the previous one's output, so they serialize, and
    # distinct weights prevent XLA from collapsing the chain.
    for k in (1, 2, 4, 8, 16):
        ws = [
            jax.random.normal(jax.random.PRNGKey(j), (128, 128), jnp.bfloat16)
            / 128.0
            for j in range(k)
        ]

        def chain(x, ws=ws):
            def body(c, i):
                y = c + i * jnp.bfloat16(0.0)
                for w in ws:
                    y = jnp.tanh(y @ w)
                return y, None

            y = jax.lax.scan(
                body, x, jnp.arange(S, dtype=jnp.bfloat16)
            )[0]
            return jnp.sum(y.astype(jnp.float32))

        init = jax.random.normal(jax.random.PRNGKey(99), (128, 128), jnp.bfloat16)
        timed(chain, init, f"chain-{k}")

    ms1 = results["chain-1"]["ms_per_iter"]
    ms16 = results["chain-16"]["ms_per_iter"]
    results["per_group_ms"] = round((ms16 - ms1) / 15.0, 4)
    print(f"per-serial-group cost (chain slope): {results['per_group_ms']} ms")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
