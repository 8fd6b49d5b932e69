"""Decompose the train-tail BACKWARD (pallas_kernels/train_tail.py:_fst_bwd)
into its op groups, per trailing stage, each timed as a scan-amortized jit
on the real chip (isolated dispatches are RTT-bound through the tunnel —
round-3 lesson).

Groups per stage (blk3: 180x320 -> 360x640, blk4: 360x640 -> 720x1280):
  act-chain   recompute a=act(z), head/squash grads, act VJP -> d_z
  unpermute   d_z5 (B,H,s,W,sC) -> transpose -> d_conv (B,H,W,Cout)
  conv-dx     conv dX via jax.vjp (d_conv -> d_x)
  conv-dw     conv dW via jax.vjp (x, d_conv -> d_w)
  scatter     d_w2 -> d_w[..., perm] + bias scatter

Usage: python -u tools/profile_tail_bwd.py [--steps 20] [--reps 3]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "results", "profile_tail_bwd.json"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from repnerv_tpu.models.layers import activation
    from repnerv_tpu.pallas_kernels.decode import shuffle_weight_permutation
    from repnerv_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    cdt = jnp.bfloat16
    S = args.steps
    results = {}

    def timed(label, fn, *arrs):
        jfn = jax.jit(
            lambda xs, *a: jax.lax.scan(
                lambda acc, i: (acc + fn(*a, i), None), jnp.zeros(()), xs
            )[0]
        )
        xs = jnp.arange(S)
        t0 = time.perf_counter()
        float(jfn(xs, *arrs))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jfn(xs, *arrs))
            best = min(best, time.perf_counter() - t0)
        ms = best / S * 1e3
        results[label] = round(ms, 3)
        print(f"{label:>22}: {ms:8.3f} ms   (compile {compile_s:.0f}s)", flush=True)

    # per-iteration latency floor of a scan on this backend: an EMPTY body
    # (and a tiny one) both measure ~1 ms/iter — the baseline every op
    # group below pays on top of its real work (BENCHMARKS "b=1 training
    # roofline")
    def null_body(i):
        return 0.0 * i

    def tiny_body(i):
        return jnp.sum(jnp.full((128, 128), 1.0) * i)

    timed("null scan-iter", null_body)
    timed("tiny scan-iter", tiny_body)

    key = jax.random.PRNGKey(0)
    for name, (H, W, Cin, Cout, s, with_head) in {
        "blk3": (180, 320, 96, 384, 2, False),
        "blk4": (360, 640, 96, 384, 2, True),
    }.items():
        C = Cout // (s * s)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        x = jax.random.normal(k1, (1, H, W, Cin), cdt)
        w = jax.random.normal(k2, (3, 3, Cin, Cout), jnp.float32) * 0.05
        z5 = jax.random.normal(k3, (1, H, s, W, s * C), cdt)
        ct = jax.random.normal(k4, (1, H * s, W * s, 3 if with_head else C), jnp.float32)
        head_w = jax.random.normal(k5, (1, 1, C, 3), jnp.float32) * 0.2
        out = jnp.clip(jax.random.uniform(k5, ct.shape), 1e-3, 1 - 1e-3)
        perm = shuffle_weight_permutation(Cout, s)
        w2 = w[..., perm]

        # --- act-chain: everything before the transpose --------------------
        def act_chain(z5_, ct_, out_, head_w_, i):
            z = z5_.reshape(1, H * s, W * s, C)
            if with_head:
                a = activation(z, "swish")
                u = 2.0 * out_ - 1.0
                d_h = ct_ * 0.5 * (1.0 - u * u)
                d_hw = jnp.einsum("bhwc,bhwo->co", a.astype(jnp.float32), d_h,
                                  preferred_element_type=jnp.float32)
                d_a = jnp.einsum("bhwo,co->bhwc", d_h.astype(cdt),
                                 head_w_[0, 0].astype(cdt))
                extra = jnp.sum(d_hw)
            else:
                d_a = ct_.astype(cdt)
                extra = 0.0
            _, act_vjp = jax.vjp(lambda tt: activation(tt, "swish"), z)
            (d_z,) = act_vjp(d_a.astype(z.dtype))
            return jnp.sum(d_z.astype(jnp.float32)[0, 0, 0]) + extra + 0.0 * i

        timed(f"{name} act-chain", act_chain, z5, ct, out, head_w)

        # --- unpermute transpose -------------------------------------------
        d_z = jax.random.normal(k3, (1, H * s, W * s, C), cdt)

        def unpermute(d_z_, i):
            d_z5 = d_z_.reshape(1, H, s, W, s * C)
            d_conv = d_z5.transpose(0, 1, 3, 2, 4).reshape(1, H, W, Cout)
            return jnp.sum(d_conv.astype(jnp.float32)[0, 0, 0]) + 0.0 * i

        timed(f"{name} unpermute", unpermute, d_z)

        # --- conv dX / dW ----------------------------------------------------
        d_conv = jax.random.normal(k2, (1, H, W, Cout), cdt)

        def conv_primal(xx, ww2):
            return jax.lax.conv_general_dilated(
                xx.astype(cdt), ww2.astype(cdt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def conv_dx(x_, w2_, d_conv_, i):
            _, vjp = jax.vjp(functools.partial(conv_primal), x_, w2_)
            d_x, _ = vjp(d_conv_)
            return jnp.sum(d_x.astype(jnp.float32)[0, 0, 0]) + 0.0 * i

        def conv_dw(x_, w2_, d_conv_, i):
            _, vjp = jax.vjp(functools.partial(conv_primal), x_, w2_)
            _, d_w2 = vjp(d_conv_)
            return jnp.sum(d_w2.astype(jnp.float32)) + 0.0 * i

        def conv_both(x_, w2_, d_conv_, i):
            _, vjp = jax.vjp(functools.partial(conv_primal), x_, w2_)
            d_x, d_w2 = vjp(d_conv_)
            return (jnp.sum(d_x.astype(jnp.float32)[0, 0, 0])
                    + jnp.sum(d_w2.astype(jnp.float32)) + 0.0 * i)

        timed(f"{name} conv-dx", conv_dx, x, w2, d_conv)
        timed(f"{name} conv-dw", conv_dw, x, w2, d_conv)
        timed(f"{name} conv-both", conv_both, x, w2, d_conv)

        # --- scatter d_w2 -> d_w --------------------------------------------
        d_w2c = jax.random.normal(k1, (3, 3, Cin, Cout), jnp.float32)

        def scatter(d_w2_, d_conv_, i):
            d_w = jnp.zeros_like(d_w2_).at[..., perm].set(d_w2_)
            d_b = jnp.zeros((Cout,), jnp.float32).at[perm].set(
                jnp.sum(d_conv_, axis=(0, 1, 2), dtype=jnp.float32))
            return jnp.sum(d_w) + jnp.sum(d_b) + 0.0 * i

        timed(f"{name} scatter", scatter, d_w2c, d_conv)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"written {args.out}")


if __name__ == "__main__":
    main()
