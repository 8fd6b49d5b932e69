"""Multi-video suite fitting — the UVG workflow, TPU-native.

The reference fits the 7 UVG videos one ``python main_train.py`` run at a
time (reference README.md:63-111 — one shell command per video;
model.py:37-49 ``vid_list`` selects the video from the frame directory).
NeRV fitting is embarrassingly parallel across videos — no state is shared
between fits — so the TPU-native driver adds a mode the reference cannot
express:

* **sequential** (single chip): one fit per video, reference parity; the
  driver in ``cli/suite_main.py`` reuses the fused-epoch train machinery.
* **parallel** (mesh): ONE program fits every video simultaneously.  The
  per-video train states stack on a leading ``"video"`` axis that shards
  over the mesh (one fit per device); the whole-epoch ``lax.scan`` vmaps
  over that axis.  No collective crosses the video axis, so GSPMD
  partitions the computation trivially and the suite costs a single
  video's wall-clock.  This preserves the quality-critical ``-b 1``
  regime per video while still filling the pod — the natural TPU scale-out
  for video suites (BENCHMARKS.md: batching frames *within* one video
  costs PSNR; batching *videos* is free).

Used by ``cli/suite_main.py`` and exercised on the virtual 8-device CPU
mesh in ``tests/test_suite.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TrainConfig
from ..train.loop import TrainState, build_train_step_fn, init_train_state

Params = Dict[str, Any]


def init_suite_states(key, cfg: TrainConfig, n_videos: int) -> TrainState:
    """Stack ``n_videos`` independent train states on a leading video axis.

    Each video gets its own PRNG stream, so the stacked init equals the
    sequential per-video inits leaf-for-leaf (test_suite.py pins this).
    """
    keys = jax.random.split(key, n_videos)
    return jax.vmap(lambda k: init_train_state(k, cfg))(keys)


def video_sharding(mesh: Optional[Mesh], axis: str = "video"):
    if mesh is None or axis not in mesh.axis_names:
        return None
    return NamedSharding(mesh, P(axis))


def shard_suite(tree, mesh: Optional[Mesh], axis: str = "video"):
    """Shard every leaf's leading (video) axis over the mesh; no-op off-mesh."""
    s = video_sharding(mesh, axis)
    if s is None:
        return tree
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def make_suite_epoch_fn(
    cfg: TrainConfig,
    steps_per_epoch: int,
    *,
    mesh: Optional[Mesh] = None,
    with_msssim: bool = False,
):
    """Whole-epoch scan vmapped over the video axis, in ONE jit.

    Call: (states, videos_u8 [V,N,H,W,3], perms [V,steps,B], t_all [V,N])
    -> (states, aux) with aux entries stacked [V, steps, ...].

    With a mesh, ``shard_map`` splits the video axis across devices and each
    device vmaps over its local videos — V independent fits per dispatch.
    shard_map (not bare GSPMD) is load-bearing here: vmap lowers the
    per-video convs to feature-grouped convs, and GSPMD cannot partition a
    grouped conv along the group axis (it emits an invalid conv when the
    video axis is sharded); inside a shard_map body the group count is the
    LOCAL video count, which never crosses a device boundary.

    Pallas kernels are forced OFF here, same reason as
    ``sharding.maybe_disable_pallas``: the body is vmapped over the local
    video axis, and the Mosaic batching rule turns the fused train tail's
    scalar-ish operands (head bias et al.) into untileable BlockSpecs —
    on-chip lowering fails with "block shape (Squeezed(), Blocked(3))"
    whenever a device holds more than one video.  The XLA step is the
    right trade anyway: the whole point of parallel mode is batching the
    dispatches across videos, which already amortizes the latency floor
    the Pallas tail exists to dodge.

    The gate is deliberately unconditional, including the one-video-per-
    device case where the size-1 vmap could in principle be squeezed out
    and the Pallas tail kept: the measured cost of the XLA step is bounded
    (parallel mode ran 1.41x slower than sequential on ONE chip at local
    V=2, BENCHMARKS "Parallel suite mode on metal", and the fused tail's
    step win on the current backend is ~4% — "fused epilogue backward"),
    while a squeezed path would add a second Mosaic lowering shape that
    only a multi-chip run can validate.  Sequential mode remains the
    single-chip recommendation.
    """
    import dataclasses

    xla_cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, use_pallas_train=False, use_pallas_decode=False
        ),
    )
    step_fn = build_train_step_fn(
        xla_cfg, steps_per_epoch, with_msssim, pallas_ok=False
    )

    def one_video_epoch(state: TrainState, video_u8, perm, t_all):
        def body(st, rows):
            frames = video_u8[rows].astype(jnp.float32) / 255.0
            return step_fn(st, frames, t_all[rows], None)

        return jax.lax.scan(body, state, perm)

    vepoch = jax.vmap(one_video_epoch)
    if mesh is not None and "video" in mesh.axis_names:
        vepoch = jax.shard_map(
            vepoch,
            mesh=mesh,
            in_specs=(P("video"), P("video"), P("video"), P("video")),
            out_specs=(P("video"), P("video")),
            check_vma=False,
        )
    return jax.jit(vepoch, donate_argnums=(0,))


def suite_perms(
    cfg: TrainConfig,
    n_videos: int,
    n_frames,
    steps_per_epoch: int,
    epoch: int,
) -> np.ndarray:
    """Per-video shuffled batch matrices [V, steps, B].  Seeds AND index
    sets match the sequential driver's: loop.run_fused_epoch shuffles the
    gap-strided ``FrameStore.sample_indices()`` (= arange(N//gap)*gap) with
    seed*100003+epoch, the suite adds a per-video seed offset — so parallel
    == sequential for every ``frame_gap``, and test-gap frames never leak
    into training.

    ``n_frames`` may be one int (all videos equal) or a per-video sequence
    (UVG-style unequal lengths, e.g. ShakeNDry's 300 vs 600 frames).  SPMD
    needs the same step count on every device, so a video shorter than
    ``steps*B`` samples cycles through additional shuffled permutations of
    its OWN true frames within the epoch — padded stack rows are never
    sampled, and the first permutation matches the equal-length case
    index-for-index."""
    b = cfg.data.batch_size
    gap = cfg.data.frame_gap
    if np.isscalar(n_frames):
        n_frames = [int(n_frames)] * n_videos
    need = steps_per_epoch * b
    out = np.empty((n_videos, need), np.int32)
    for v in range(n_videos):
        rng = np.random.default_rng(
            (cfg.manual_seed + v) * 100003 + epoch
        )
        n_samples = n_frames[v] // gap
        if n_samples <= 0:
            raise ValueError(
                f"suite video {v} has {n_frames[v]} frames < frame_gap "
                f"{gap}: no trainable samples (the cycling draw below "
                "would never terminate)"
            )
        # rng.permutation(n) draws identically to rng.shuffle(arange(n)),
        # so scaling by gap reproduces run_fused_epoch's shuffled
        # sample_indices() exactly
        chunks = []
        got = 0
        while got < need:
            idx = rng.permutation(n_samples) * gap
            chunks.append(idx)
            got += len(idx)
        out[v] = np.concatenate(chunks)[:need]
    return out.reshape(n_videos, steps_per_epoch, b)


def run_suite_epoch(
    states: TrainState,
    epoch_fn,
    videos_u8: jnp.ndarray,
    t_all: jnp.ndarray,
    cfg: TrainConfig,
    epoch: int,
    steps_per_epoch: int,
    mesh: Optional[Mesh] = None,
    n_frames=None,
) -> Tuple[TrainState, Dict[str, np.ndarray]]:
    """One parallel epoch over every video; returns per-video metrics.

    ``n_frames``: per-video TRUE frame counts when the stacked ``videos_u8``
    is zero-padded to a common length (unequal suites); defaults to the
    stack's frame axis."""
    if n_frames is None:
        n_frames = videos_u8.shape[1]
    perms = jnp.asarray(
        suite_perms(
            cfg, videos_u8.shape[0], n_frames, steps_per_epoch, epoch
        )
    )
    perms = shard_suite(perms, mesh)
    states, aux = epoch_fn(states, videos_u8, perms, t_all)
    psnr = np.asarray(aux["psnr"])  # [V, steps, n_stage]
    metrics = {
        "psnr": psnr.mean(axis=1),
        "loss": np.asarray(aux["loss"]).mean(axis=1),
        "lr": np.asarray(aux["lr"])[:, -1],
    }
    if "msssim" in aux:
        metrics["msssim"] = np.asarray(aux["msssim"]).mean(axis=1)
    return states, metrics


def extract_video_params(states: TrainState, v: int) -> Params:
    """Pull one video's params out of the stacked suite state (host-side)."""
    return jax.tree.map(lambda x: np.asarray(x[v]), states.params)
