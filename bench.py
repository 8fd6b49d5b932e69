"""Benchmark — decode fps/chip from the fused (deploy) paper-config model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver's north-star of 400 decode fps/chip for the fused
single-branch Bunny-720p model (BASELINE.md; the reference repo publishes no
numbers of its own — SURVEY.md §6).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from repnerv_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    from repnerv_tpu.config import ModelConfig
    from repnerv_tpu.models.embedding import positional_encoding
    from repnerv_tpu.models.generator import (
        apply_generator,
        generator_to_deploy,
        init_generator,
    )

    cfg = ModelConfig(branch_type="ERB", compute_dtype="bfloat16")
    params = init_generator(jax.random.PRNGKey(0), cfg)
    dep_params, dep_cfg = generator_to_deploy(params, cfg)

    batch = 16

    @jax.jit
    def decode(p, t):
        embed = positional_encoding(t, dep_cfg.embed)
        out = apply_generator(p, embed, dep_cfg, train=False)[-1]
        # a scalar checksum rides along: fetching it to host forces real
        # completion (block_until_ready alone returns early on tunneled
        # backends, so wall-clock around it under-measures)
        return out, jnp.sum(out)

    t = jnp.linspace(0.0, 0.99, batch, dtype=jnp.float32)
    # warmup/compile
    float(decode(dep_params, t)[1])
    float(decode(dep_params, t)[1])

    reps = 10
    times = []
    for i in range(reps):
        ti = t + i * 1e-7
        t0 = time.perf_counter()
        _, s = decode(dep_params, ti)
        float(s)
        times.append(time.perf_counter() - t0)
    fps = batch / min(times)

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
