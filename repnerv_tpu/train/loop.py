"""Training loop — jitted whole-batch steps, Adam, per-step LR, metrics.

Parity target: the reference train loop (main_train.py:222-290): forward,
multi-scale adaptive-pool targets, weighted Fusion loss, per-iteration LR
adjustment, Adam(betas=(beta, 0.999)), PSNR/MS-SSIM accumulation, periodic
eval, train/deploy checkpointing.

TPU-first deltas:

* ONE jitted ``train_step`` carries forward + loss + backward + Adam + LR +
  metrics; the whole GOP batch of frames trains per step (the reference
  steps one frame at a time at b=1).
* The LR schedule is traced (a function of the step counter carried in the
  train state) — no host-side optimizer mutation per iteration.
* Optional pruning masks ride along as a pytree: gradients and updated
  params are masked, which reproduces torch's reparametrized
  ``weight = weight_orig * mask`` training exactly (main_eval.py:450-531).
* Buffers donate: params/opt_state are consumed and re-emitted in-place.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig, TrainConfig
from ..data.frames import FrameStore, adaptive_avg_pool
from ..models.embedding import positional_encoding
from ..models.generator import apply_generator, init_generator
from ..ops.losses import multi_scale_loss
from ..ops.metrics import msssim_fn, psnr_fn
from .schedule import lr_at_step

Params = Dict[str, Any]


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray  # global step counter (drives the LR schedule)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    # torch.optim.Adam(betas=(beta, 0.999), eps=1e-8) — main_train.py:196.
    return optax.scale_by_adam(b1=cfg.beta, b2=0.999, eps=1e-8)


def init_train_state(key, cfg: TrainConfig) -> TrainState:
    params = init_generator(key, cfg.model)
    tx = make_optimizer(cfg)
    return TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))


def _apply_mask(tree, masks):
    if masks is None:
        return tree
    return jax.tree.map(
        lambda x, m: x * m.astype(x.dtype) if m is not None else x,
        tree,
        masks,
        is_leaf=lambda x: x is None,
    )


def build_train_step_fn(
    cfg: TrainConfig,
    steps_per_epoch: int,
    with_msssim: bool = True,
    param_transform=None,
    pallas_ok: bool = True,
):
    """The raw (unjitted) train step:
    (state, frames [B,H,W,3] f32, t [B], masks|None) -> (state, aux dict).
    ``make_train_step`` jits it; parallel/sharding.py jits it over a mesh.

    ``param_transform`` (params -> params, traced into the step) is applied
    before the forward only — gradients flow through it to the latent
    params (compress/qat.py uses this for straight-through fake
    quantization).
    """
    mcfg = cfg.model
    tx = make_optimizer(cfg)
    warmup_epochs = cfg.warmup_epochs()
    # "sample" reproduces the reference's adjust_lr denominator at b>1
    samples_per_epoch = (
        steps_per_epoch * cfg.data.batch_size
        if cfg.lr_frac_mode == "sample"
        else None
    )

    def loss_and_outputs(params, frames, t):
        if param_transform is not None:
            params = param_transform(params)
        embed = positional_encoding(t, mcfg.embed)
        outs = apply_generator(params, embed, mcfg, train=True)
        targets = [adaptive_avg_pool(frames, o.shape[1:3]) for o in outs]
        loss = multi_scale_loss(outs, targets, cfg.loss_type, cfg.lw, pallas_ok)
        return loss, (outs, targets)

    def step_fn(state: TrainState, frames, t, masks):
        lr = lr_at_step(
            state.step,
            base_lr=cfg.lr,
            steps_per_epoch=steps_per_epoch,
            epochs=cfg.epochs,
            warmup_epochs=warmup_epochs,
            lr_type=cfg.lr_type,
            lr_steps=cfg.lr_steps,
            samples_per_epoch=samples_per_epoch,
        )
        (loss, (outs, targets)), grads = jax.value_and_grad(
            loss_and_outputs, has_aux=True
        )(state.params, frames, t)
        grads = _apply_mask(grads, masks)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p - lr * u.astype(p.dtype), state.params, updates
        )
        new_params = _apply_mask(new_params, masks)

        # metrics reduce to per-stage rows [n_stage] INSIDE the jitted step:
        # full reductions are replicated under GSPMD, so every process of a
        # multi-host run can fetch them (per-sample [B, n_stage] rows would
        # be sharded over "data" and unfetchable off-process); values are
        # identical (psnr_fn broadcasts the batch-mean row, utils.py:191-199)
        aux = {
            "loss": loss,
            "lr": lr,
            "psnr": jnp.mean(psnr_fn(outs, targets), axis=0),
        }
        if with_msssim:
            aux["msssim"] = jnp.mean(msssim_fn(outs, targets, pallas_ok), axis=0)
        return TrainState(new_params, opt_state, state.step + 1), aux

    return step_fn


def make_train_step(
    cfg: TrainConfig,
    steps_per_epoch: int,
    with_msssim: bool = True,
    param_transform=None,
):
    """Jitted single-host train step (buffers donated in-place)."""
    step_fn = build_train_step_fn(
        cfg, steps_per_epoch, with_msssim, param_transform=param_transform
    )
    donate = (0,) if cfg.donate else ()
    return jax.jit(step_fn, donate_argnums=donate)


def make_epoch_fn(
    cfg: TrainConfig,
    steps_per_epoch: int,
    with_msssim: bool = False,
    param_transform=None,
):
    """Whole-epoch jitted step: ``lax.scan`` over the shuffled batch order
    with the uint8 video resident in HBM.

    One host->device dispatch per EPOCH instead of per step — the decisive
    win over the reference's frame-at-a-time loop (main_train.py:229), and
    doubly so on tunneled backends where every dispatch pays an RTT.

    Call: (state, video_u8 [N,H,W,3], perm [steps, B] int32, t_all [N])
    -> (state, aux) where aux entries are stacked per-step.
    """
    step_fn = build_train_step_fn(
        cfg, steps_per_epoch, with_msssim, param_transform=param_transform
    )

    def epoch_fn(state: TrainState, video_u8, perm, t_all, masks):
        def body(state, rows):
            frames = video_u8[rows].astype(jnp.float32) / 255.0
            t = t_all[rows]
            state, aux = step_fn(state, frames, t, masks)
            return state, aux

        return jax.lax.scan(body, state, perm)

    return jax.jit(epoch_fn, donate_argnums=(0,))


def make_streaming_epoch_fn(
    cfg: TrainConfig,
    steps_per_epoch: int,
    with_msssim: bool = False,
    param_transform=None,
):
    """Fused-epoch variant for HOST-resident videos (out-of-core): scans a
    pre-gathered uint8 batch stack instead of indexing an HBM-resident
    video.  :func:`run_fused_epoch` slices the epoch into chunks sized by
    ``DataConfig.stream_chunk_mb`` — one H2D transfer + one scan dispatch
    per chunk, so peak HBM holds a chunk of pixels, never the video.

    Call: (state, frames_u8 [S, B, H, W, 3], t [S, B], masks) -> (state, aux).
    ``steps_per_epoch`` still sizes the LR schedule (the full epoch, not the
    chunk).
    """
    step_fn = build_train_step_fn(
        cfg, steps_per_epoch, with_msssim, param_transform=param_transform
    )

    def epoch_fn(state: TrainState, frames_u8, t_mat, masks):
        def body(state, xs):
            frames, t = xs
            state, aux = step_fn(
                state, frames.astype(jnp.float32) / 255.0, t, masks
            )
            return state, aux

        return jax.lax.scan(body, state, (frames_u8, t_mat))

    jitted = jax.jit(epoch_fn, donate_argnums=(0,))

    def run(state, frames_u8, t_mat, masks):
        return jitted(state, frames_u8, t_mat, masks)

    run.streaming = True  # run_fused_epoch dispatches on this tag
    return run


def run_fused_epoch(
    state: TrainState,
    epoch_fn,
    store: FrameStore,
    cfg: TrainConfig,
    epoch: int,
    masks=None,
    max_steps: Optional[int] = None,
) -> Tuple[TrainState, EpochMetrics]:
    """Drive :func:`make_epoch_fn`: build the epoch's shuffled batch matrix
    on the host, run ONE device dispatch, reduce the stacked metrics."""
    b = cfg.data.batch_size
    idx = store.sample_indices()
    rng = np.random.default_rng(cfg.manual_seed * 100003 + epoch)
    rng.shuffle(idx)
    n_steps = len(idx) // b
    if max_steps is not None:
        n_steps = min(n_steps, max_steps)
    if getattr(epoch_fn, "streaming", False):
        # out-of-core: the video lives on the host (or on disk, DirFrames);
        # stream pre-gathered batch chunks — one H2D + one scan per chunk,
        # peak HBM = one chunk of pixels.  epoch_fn is the streaming flavor
        # (make_streaming_epoch_fn); resident-flavor fns take the whole
        # video + perm regardless of where the store array lives.
        h, w = store.hw
        per_step = b * h * w * 3  # uint8 bytes per batch
        chunk = max(1, (cfg.data.stream_chunk_mb << 20) // max(per_step, 1))
        rows_mat = idx[: n_steps * b].reshape(n_steps, b)
        auxes = []
        for s0 in range(0, n_steps, chunk):
            rows = rows_mat[s0 : s0 + chunk]
            pixels = np.stack([store.frames[r] for r in rows])  # [S,B,H,W,3]
            t_mat = store.t[rows]
            state, aux = epoch_fn(
                state, jnp.asarray(pixels), jnp.asarray(t_mat, jnp.float32), masks
            )
            auxes.append(jax.tree.map(np.asarray, aux))
        aux = jax.tree.map(lambda *xs: np.concatenate(xs, 0), *auxes)
    else:
        perm = jnp.asarray(idx[: n_steps * b].reshape(n_steps, b), jnp.int32)
        t_all = jnp.asarray(store.t, jnp.float32)
        # pass store.frames AS-IS: the mesh epoch runner caches its one-time
        # replication by source identity (parallel/sharding.py
        # _replicate_once), so minting a fresh jnp array here every epoch
        # would re-transfer the full video each call; plain jit transfers
        # host arrays itself.
        state, aux = epoch_fn(state, store.frames, perm, t_all, masks)
    psnr = np.asarray(aux["psnr"]).reshape(n_steps, -1).mean(0)
    msssim = (
        np.asarray(aux["msssim"]).reshape(n_steps, -1).mean(0)
        if "msssim" in aux
        else np.zeros_like(psnr)
    )
    return state, EpochMetrics(
        psnr, msssim, float(np.mean(np.asarray(aux["loss"]))), float(np.asarray(aux["lr"])[-1])
    )


def make_eval_step(cfg: TrainConfig, with_msssim: bool = True, pallas_ok: bool = True):
    mcfg = cfg.model

    def eval_fn(params, frames, t):
        embed = positional_encoding(t, mcfg.embed)
        outs = apply_generator(params, embed, mcfg, train=False)
        targets = [adaptive_avg_pool(frames, o.shape[1:3]) for o in outs]
        aux = {"psnr": psnr_fn(outs, targets)}
        if with_msssim:
            aux["msssim"] = msssim_fn(outs, targets, pallas_ok)
        return outs, aux

    return jax.jit(eval_fn)


def make_decode_fn(cfg: TrainConfig):
    """Jitted decode: t [B] -> final frame batch (the FPS surface,
    reference main_eval.py:753-784)."""
    mcfg = cfg.model

    def decode(params, t):
        embed = positional_encoding(t, mcfg.embed)
        return apply_generator(params, embed, mcfg, train=False)[-1]

    return jax.jit(decode)


def make_video_decode_fn(cfg: TrainConfig, *, keep_frames: bool = True):
    """Whole-video decode in ONE dispatch: ``lax.scan`` over frame batches.

    (params, t [n_batches, B]) -> frames [n_batches, B, H, W, 3] (f32) when
    ``keep_frames``, else a per-batch checksum [n_batches] (decode-and-
    discard, the pure-throughput serving measurement).  One host round-trip
    for the entire video vs one per frame in the reference.
    """
    mcfg = cfg.model

    def decode_all(params, t_batches):
        def body(_, t):
            embed = positional_encoding(t, mcfg.embed)
            out = apply_generator(params, embed, mcfg, train=False)[-1]
            return None, (out if keep_frames else jnp.sum(out))

        _, ys = jax.lax.scan(body, None, t_batches)
        return ys

    return jax.jit(decode_all)


def decode_batch_cap(h: int, w: int, base: int = 8) -> int:
    """HBM-safe decode batch size: amortize dispatch but cap activation
    memory — stage buffers scale with bsz*H*W, and a 1080p batch of 8
    exhausted the chip during the whole-video scan (RESOURCE_EXHAUSTED,
    round 2).  Shared by the eval and serving CLIs so the cap cannot
    drift between them."""
    return min(max(base, 1), max(base * 921600 // (h * w), 1))


def measure_decode_fps(
    params, cfg: TrainConfig, t_all, bsz: int, reps: int = 3, mesh=None
) -> float:
    """Whole-video decode throughput: ONE ``lax.scan`` dispatch per rep,
    scalar checksum fetch per rep (``block_until_ready`` returns early on
    tunneled backends — the 4-byte fetch forces completion).  The t
    perturbation defeats any result cache between reps.  With ``mesh``,
    each scan step's batch column shards over the mesh's data axis
    (``parallel.sharding.make_sharded_video_decode_fn``) — bsz must then
    divide by the axis size."""
    import time

    t_all = np.asarray(t_all, np.float32)
    n_batches = max(len(t_all) // bsz, 1)
    t_mat = jnp.asarray(t_all[: n_batches * bsz]).reshape(n_batches, bsz)
    if mesh is not None:
        from ..parallel.sharding import make_sharded_video_decode_fn

        decode_all = make_sharded_video_decode_fn(cfg, mesh, keep_frames=False)
    else:
        decode_all = make_video_decode_fn(cfg, keep_frames=False)
    float(jnp.sum(decode_all(params, t_mat)))  # compile
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(decode_all(params, t_mat + i * 1e-7)))
        times.append(time.perf_counter() - t0)
    return n_batches * bsz / min(times)


@dataclass
class EpochMetrics:
    psnr: np.ndarray  # [n_stage]
    msssim: np.ndarray  # [n_stage]
    loss: float
    lr: float


def run_epoch(
    state: TrainState,
    train_step,
    store: FrameStore,
    cfg: TrainConfig,
    epoch: int,
    masks=None,
    max_steps: Optional[int] = None,
) -> Tuple[TrainState, EpochMetrics]:
    psnrs, msssims, losses = [], [], []
    lr = 0.0
    for i, (rows, t) in enumerate(
        store.epoch_batches(
            cfg.data.batch_size,
            shuffle=True,
            seed=cfg.manual_seed * 100003 + epoch,
            drop_last=True,
        )
    ):
        if max_steps is not None and i >= max_steps:
            break
        if jax.process_count() > 1:
            # every process draws the SAME deterministic global permutation
            # (seeded above); each gathers only its slice of the global
            # batch — the sharded step assembles the global array from the
            # per-process shards (parallel/sharding.py shard_batch)
            from ..parallel.sharding import process_local_slice

            sl = process_local_slice(len(rows))
            rows, t = rows[sl], t[sl]
        frames = store.gather(rows)
        state, aux = train_step(state, frames, jnp.asarray(t), masks)
        psnrs.append(np.atleast_2d(np.asarray(aux["psnr"])))
        if "msssim" in aux:
            msssims.append(np.atleast_2d(np.asarray(aux["msssim"])))
        losses.append(float(aux["loss"]))
        lr = float(aux["lr"])
    psnr = np.concatenate(psnrs, 0).mean(0) if psnrs else np.zeros(1)
    msssim = np.concatenate(msssims, 0).mean(0) if msssims else np.zeros_like(psnr)
    return state, EpochMetrics(psnr, msssim, float(np.mean(losses)), lr)


def evaluate(
    params: Params,
    eval_step,
    store: FrameStore,
    cfg: TrainConfig,
    max_steps: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Validation sweep -> (psnr [n_stage], msssim [n_stage]);
    mirrors main_train.py:377-438 minus the host-side timing."""
    psnrs, msssims = [], []
    for i, (rows, t) in enumerate(
        store.epoch_batches(
            cfg.data.batch_size, shuffle=False, seed=0, drop_last=False
        )
    ):
        if max_steps is not None and i >= max_steps:
            break
        frames = store.gather(rows)
        _, aux = eval_step(params, frames, jnp.asarray(t))
        psnrs.append(np.asarray(aux["psnr"]))
        if "msssim" in aux:
            msssims.append(np.asarray(aux["msssim"]))
    psnr = np.concatenate(psnrs, 0).mean(0)
    msssim = (
        np.concatenate(msssims, 0).mean(0) if msssims else np.zeros_like(psnr)
    )
    return psnr, msssim
