"""Benchmark — decode fps/chip from the fused (deploy) paper-config model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver's north-star of 400 decode fps/chip for the fused
single-branch Bunny-720p model (BASELINE.md; the reference repo publishes no
numbers of its own — SURVEY.md §6).

Methodology: the whole 132-frame video decodes in ONE device dispatch
(lax.scan over frame batches, per-batch checksums only), repeated and the
best wall-clock taken.  A scalar is fetched to force completion —
``block_until_ready`` returns early on tunneled backends.
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from repnerv_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    from repnerv_tpu.config import ModelConfig, TrainConfig
    from repnerv_tpu.models.generator import generator_to_deploy, init_generator
    from repnerv_tpu.train.loop import make_video_decode_fn

    # 1024 frames: at ~530 fps a 256-frame scan finishes in ~0.5 s, so the
    # ~30-50 ms per-dispatch tunnel RTT was ~7% of the measurement; the
    # longer video amortizes it away (measured 548 vs 527 fps, same kernels)
    n_frames = int(os.environ.get("BENCH_FRAMES", 1024))
    batch = int(os.environ.get("BENCH_BATCH", 32))
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    # int8 MXU decode for the trailing blocks is the default serving path:
    # measured +17% over the bf16 kernel (525 vs 449 fps) at a calibrated
    # quality cost of 0.15 dB on the trained 720p model (BENCHMARKS.md).
    # BENCH_INT8=0 selects the pure-bf16 kernel path.
    use_int8 = os.environ.get("BENCH_INT8", "1") == "1"

    mcfg = ModelConfig(
        branch_type="ERB",
        compute_dtype="bfloat16",
        use_pallas_decode=use_pallas,
        decode_int8=use_int8,
    )
    params = init_generator(jax.random.PRNGKey(0), mcfg)
    dep_params, dep_cfg = generator_to_deploy(params, mcfg)
    if use_int8:
        from repnerv_tpu.models.embedding import positional_encoding
        from repnerv_tpu.models.generator import calibrate_int8

        calib = positional_encoding(
            jnp.linspace(0.0, 0.99, 8, dtype=jnp.float32), dep_cfg.embed
        )
        dep_params = calibrate_int8(dep_params, dep_cfg, calib)
    cfg = TrainConfig(model=dep_cfg)

    decode_all = make_video_decode_fn(cfg, keep_frames=False)

    # compile + warm; on HBM exhaustion halve the batch and retry — batch 64
    # at 720p int8 compiles to 15.86G of 15.75G HBM (measured), so an
    # over-ambitious BENCH_BATCH must degrade to a number, not a crash
    while True:
        n_batches = n_frames // batch
        t = jnp.linspace(
            0.0, 0.99, n_batches * batch, dtype=jnp.float32
        ).reshape(n_batches, batch)
        try:
            float(jnp.sum(decode_all(dep_params, t)))
            break
        except Exception:
            if batch <= 8:
                raise
            batch //= 2
    float(jnp.sum(decode_all(dep_params, t)))

    times = []
    for i in range(5):
        ti = t + i * 1e-7
        t0 = time.perf_counter()
        float(jnp.sum(decode_all(dep_params, ti)))
        times.append(time.perf_counter() - t0)
    fps = n_batches * batch / min(times)

    baseline_fps = 400.0  # BASELINE.md north-star: >=400 decode fps/chip
    print(
        json.dumps(
            {
                "metric": "decode_fps_720p_fused",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
