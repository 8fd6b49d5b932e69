"""Benchmark — decode fps/chip from the fused (deploy) paper-config model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: the driver's north-star of 400 decode fps/chip for the fused
single-branch Bunny-720p model (BASELINE.md; the reference repo publishes no
numbers of its own — SURVEY.md §6).

Methodology: a BENCH_FRAMES-frame video (default 1024 — long enough to
amortize the 30-50 ms per-dispatch tunnel RTT to <1%) decodes in
ceil(frames/batch) device dispatches (lax.scan over frame batches,
per-batch checksums only), repeated 5x and the best wall-clock taken.  A
scalar is fetched to force completion — ``block_until_ready`` returns early
on tunneled backends.  If the requested batch exhausts HBM at compile time
the batch halves and retries (batch 64 at 720p int8 measures 15.86G of
15.75G HBM); any non-OOM failure is raised immediately.

The headline value is the int8 serving path; the JSON line is
self-describing about its quality cost: ``quality_delta_db`` is the
measured flagship-checkpoint PSNR delta of this path vs the f32 decode
(BENCHMARKS.md int8 from_block sweep), and the quality-neutral bf16
kernel's fps is reported alongside (``bf16_fps``, also measured unless
BENCH_BOTH=0).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# measured on the trained 300-epoch flagship: int8 from_block=-2 decodes at
# 30.86 dB vs 31.22 dB f32 (BENCHMARKS.md "int8 on the flagship" sweep)
INT8_QUALITY_DELTA_DB = -0.36


def _is_oom(e: Exception) -> bool:
    msg = str(e)
    return "RESOURCE_EXHAUSTED" in msg or "Ran out of memory" in msg or "out of memory" in msg.lower()


def _measure_fps(use_int8: bool, n_frames: int, batch: int, use_pallas: bool) -> float:
    from repnerv_tpu.config import ModelConfig, TrainConfig
    from repnerv_tpu.models.generator import generator_to_deploy, init_generator
    from repnerv_tpu.train.loop import make_video_decode_fn

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

    # compile + warm; on HBM exhaustion halve the batch and retry — an
    # over-ambitious BENCH_BATCH must degrade to a number, not a crash.
    # Non-OOM failures re-raise immediately (ADVICE r3: a shape bug must not
    # surface as the smallest-batch error after three pointless retries).
    batch = min(batch, n_frames)
    while True:
        n_batches = n_frames // batch
        assert n_batches >= 1, (n_frames, batch)
        t = jnp.linspace(
            0.0, 0.99, n_batches * batch, dtype=jnp.float32
        ).reshape(n_batches, batch)
        try:
            float(jnp.sum(decode_all(dep_params, t)))
            break
        except Exception as e:
            if not _is_oom(e) or batch <= 8:
                raise
            batch //= 2
    float(jnp.sum(decode_all(dep_params, t)))

    times = []
    for i in range(5):
        ti = t + i * 1e-7
        t0 = time.perf_counter()
        float(jnp.sum(decode_all(dep_params, ti)))
        times.append(time.perf_counter() - t0)
    return n_batches * batch / min(times)


def main():
    from repnerv_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    n_frames = int(os.environ.get("BENCH_FRAMES", 1024))
    batch = int(os.environ.get("BENCH_BATCH", 32))
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    # int8 MXU decode for the trailing blocks is the default serving path:
    # measured +17% over the bf16 kernel at a calibrated quality cost of
    # 0.36 dB on the trained 720p flagship (BENCHMARKS.md).  BENCH_INT8=0
    # makes the quality-neutral bf16 kernel the headline instead.
    use_int8 = os.environ.get("BENCH_INT8", "1") == "1"
    # BENCH_BOTH=0 skips the secondary-path measurement (one compile fewer)
    both = os.environ.get("BENCH_BOTH", "1") == "1"

    fps = _measure_fps(use_int8, n_frames, batch, use_pallas)
    baseline_fps = 400.0  # BASELINE.md north-star: >=400 decode fps/chip
    out = {
        "metric": "decode_fps_720p_fused" + ("" if use_int8 else "_bf16"),
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
        "quality_delta_db": INT8_QUALITY_DELTA_DB if use_int8 else 0.0,
    }
    if both:
        other = _measure_fps(not use_int8, n_frames, batch, use_pallas)
        key = "bf16" if use_int8 else "int8"
        out[f"{key}_fps"] = round(other, 2)
        out[f"{key}_vs_baseline"] = round(other / baseline_fps, 3)
        out[f"{key}_quality_delta_db"] = 0.0 if use_int8 else INT8_QUALITY_DELTA_DB
    print(json.dumps(out))


if __name__ == "__main__":
    main()
