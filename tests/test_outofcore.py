"""Out-of-core video path (VERDICT r3 item 4).

The reference never materializes the video — each sample is a per-item PIL
load (reference model.py:52-70), so videos larger than RAM/HBM train fine.
Our ladder (data/frames.py make_frame_store):

  1. fits the HBM budget  -> uint8 resident in HBM (the fast default)
  2. exceeds HBM budget   -> host RAM; run_fused_epoch streams batch chunks
  3. exceeds host budget  -> DirFrames: frames stay on disk, lazy decode

These tests drive each rung with budgets faked tiny so a small synthetic
video is "over budget", and assert exact numerical parity with the resident
path (same seed => same shuffles => identical training trajectory).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repnerv_tpu.config import DataConfig, ModelConfig, TrainConfig
from repnerv_tpu.data.frames import (
    DirFrames,
    FrameStore,
    make_frame_store,
    synthetic_video,
)
from repnerv_tpu.train.loop import (
    evaluate,
    init_train_state,
    make_epoch_fn,
    make_eval_step,
    make_streaming_epoch_fn,
    run_fused_epoch,
)

TINY = dict(
    model=ModelConfig(
        embed="1.25_4",
        stem_dim_num="16_1",
        fc_hw_dim="3_4_8",
        strides=(2, 2),
        lower_width=6,
        branch_type="ERB",
        act="swish",
        single_res=True,
    ),
    loss_type="L2",
    epochs=3,
    lr=5e-3,
)


def _cfg(**data_kw) -> TrainConfig:
    return TrainConfig(
        data=DataConfig(
            dataset="synth", synthetic_frames=8, synthetic_hw=(12, 16),
            batch_size=4, **data_kw,
        ),
        **TINY,
    )


def test_hbm_budget_spills_to_host():
    """Auto-spill: under budget -> HBM-resident; over budget -> host numpy."""
    small = make_frame_store(_cfg(hbm_budget_mb=1).data)  # 4.6 KiB < 1 MiB
    assert isinstance(small.frames, jax.Array)
    cfg = _cfg(hbm_budget_mb=1)
    cfg.data.synthetic_hw = (256, 512)  # 8*256*512*3 = 3 MiB > 1 MiB
    big = make_frame_store(cfg.data)
    assert isinstance(big.frames, np.ndarray)


def test_streaming_fused_epoch_matches_resident():
    """Chunked host-streaming epochs == HBM-resident fused epochs, exactly."""
    cfg_dev = _cfg(hbm_budget_mb=0)  # never spill
    store_dev = make_frame_store(cfg_dev.data)
    assert isinstance(store_dev.frames, jax.Array)

    # stream_chunk_mb=0 floors the chunk at ONE step — maximum chunking
    # stress: state threads across a chunk boundary at every step
    cfg_host = _cfg(hbm_budget_mb=1, stream_chunk_mb=0)
    frames, t = synthetic_video(8, 12, 16)
    store_host = FrameStore(frames=frames, t=t)  # plain numpy = host-resident

    steps = store_dev.num_samples // cfg_dev.data.batch_size
    fn_dev = make_epoch_fn(cfg_dev, steps)
    fn_host = make_streaming_epoch_fn(cfg_host, steps)

    s_dev = init_train_state(jax.random.PRNGKey(0), cfg_dev)
    s_host = init_train_state(jax.random.PRNGKey(0), cfg_host)
    for epoch in range(2):
        s_dev, m_dev = run_fused_epoch(s_dev, fn_dev, store_dev, cfg_dev, epoch)
        s_host, m_host = run_fused_epoch(s_host, fn_host, store_host, cfg_host, epoch)
        np.testing.assert_allclose(m_dev.psnr, m_host.psnr, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_dev.params), jax.tree.leaves(s_host.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(s_host.step) == 2 * steps


def _write_frame_dir(root, frames):
    from PIL import Image

    d = os.path.join(root, "lazyvid")
    os.makedirs(d, exist_ok=True)
    for i, fr in enumerate(frames):
        Image.fromarray(fr).save(os.path.join(d, f"f{i:04d}.png"))
    return d


def test_dirframes_lazy_matches_eager(tmp_path):
    # 6 frames at 256x512 = 2.25 MiB decoded > the 1 MiB host budget
    frames, t = synthetic_video(6, 256, 512, seed=3)
    _write_frame_dir(tmp_path, frames)
    cfg = DataConfig(dataset="lazyvid", data_dir=str(tmp_path), host_budget_mb=0)
    eager = make_frame_store(dataclasses.replace(cfg, hbm_budget_mb=0))
    lazy = make_frame_store(dataclasses.replace(cfg, host_budget_mb=1, hbm_budget_mb=1))
    assert isinstance(lazy.frames, DirFrames), "tiny host budget must go lazy"
    assert lazy.frames.shape == tuple(np.asarray(eager.frames).shape)
    rows = np.array([0, 3, 5])
    np.testing.assert_array_equal(lazy.frames[rows], np.asarray(eager.frames)[rows])
    np.testing.assert_array_equal(lazy.frames[2], np.asarray(eager.frames)[2])
    np.testing.assert_allclose(lazy.t, eager.t)


def test_train_and_eval_from_disk(tmp_path):
    """Rung 3 end-to-end: train (streaming fused) + evaluate straight from a
    lazy on-disk store; PSNR must improve over the first epoch's."""
    # 12 frames at 160x192 = 1.05 MiB decoded > the 1 MiB host budget
    frames, t = synthetic_video(12, 160, 192, seed=5)
    _write_frame_dir(tmp_path, frames)
    cfg = _cfg(hbm_budget_mb=1, host_budget_mb=1, stream_chunk_mb=1)
    cfg = dataclasses.replace(
        cfg,
        epochs=10,
        model=dataclasses.replace(
            cfg.model, fc_hw_dim="5_6_8", strides=(4, 4, 2)
        ),
        data=dataclasses.replace(
            cfg.data, dataset="lazyvid", data_dir=str(tmp_path),
            synthetic_frames=0,
        ),
    )
    store = make_frame_store(cfg.data)
    assert isinstance(store.frames, DirFrames)
    steps = store.num_samples // cfg.data.batch_size
    fn = make_streaming_epoch_fn(cfg, steps)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    first = None
    for epoch in range(cfg.epochs):
        state, m = run_fused_epoch(state, fn, store, cfg, epoch)
        if first is None:
            first = float(m.psnr[-1])
    psnr, _ = evaluate(state.params, make_eval_step(cfg, with_msssim=False), store, cfg)
    assert float(psnr[-1]) > first + 1.0, (
        f"lazy-store training failed to fit: first {first}, final {psnr}"
    )


def test_train_cli_outofcore(tmp_path):
    """The CLI end-to-end on rung 2: --hbm_budget_mb forces the host store
    and the streaming fused epoch; checkpoints still land.

    Geometry picked to cover the RAGGED final chunk: 12 frames at 160x192,
    b=4 -> 3 steps/epoch; 1 MiB chunk budget holds 2 steps (360 KiB each)
    -> chunks of [2, 1] steps per epoch."""
    from repnerv_tpu.cli import train_main

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        train_main.main([
            "--dataset", "synth", "--synthetic_frames", "12",
            "--synthetic_hw", "160", "192",  # 12*160*192*3 = 1.05 MiB > 1 MiB
            "--embed", "1.25_4", "--stem_dim_num", "16_1",
            "--fc_hw_dim", "5_6_8", "--strides", "4", "4", "2",
            "--lower_width", "6", "--branch_type", "ERB",
            "-b", "4", "-e", "2", "--lr", "5e-3", "--loss_type", "L2",
            "--act", "swish", "--single_res",
            "--hbm_budget_mb", "1", "--stream_chunk_mb", "1",
            "--outf", "ooc", "--suffix", "smoke",
        ])
        out = os.path.join("result", "ooc", "smoke")
        assert os.path.exists(os.path.join(out, "model_latest.pth"))
        log = open(os.path.join(out, "rank0.txt")).read()
        assert "Epoch[2/2]" in log
    finally:
        os.chdir(cwd)


def test_compress_finetune_from_host_store():
    """PATH A (prune -> masked finetune) works from a host-resident store:
    the finetune epoch streams chunks instead of replicating the video."""
    from repnerv_tpu.compress.pipeline import compress
    from repnerv_tpu.models.generator import init_generator

    cfg = _cfg(hbm_budget_mb=1, stream_chunk_mb=0)
    cfg = dataclasses.replace(
        cfg, prune_ratio=0.5, quant_bit=8, finetune=True, finetune_epochs=2
    )
    frames, t = synthetic_video(8, 12, 16)
    store = FrameStore(frames=frames, t=t)  # numpy = host-resident
    params = init_generator(jax.random.PRNGKey(0), cfg.model)
    out_params, report = compress(params, cfg, store, deploy_after=False)
    assert report.finetune_epochs == 2
    assert np.isfinite(report.bpp) and report.bpp > 0
