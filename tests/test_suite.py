"""Multi-video suite tests (VERDICT r2 next-step #6): the parallel
one-fit-per-device mode on the virtual 8-device mesh equals sequential
per-video fits, and the CLI driver emits the aggregate JSON table.

Reference workflow being covered: one ``main_train.py`` run per UVG video
(reference README.md:63-111, model.py:37-49 vid_list)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from repnerv_tpu.data.frames import FrameStore, synthetic_video
from repnerv_tpu.parallel.suite import (
    extract_video_params,
    init_suite_states,
    make_suite_epoch_fn,
    run_suite_epoch,
    shard_suite,
    suite_perms,
)
from repnerv_tpu.train.loop import init_train_state, make_epoch_fn, run_fused_epoch

from test_model_train import make_store, tiny_model, tiny_train

import dataclasses

from jax.sharding import Mesh


def _stores(cfg, n_videos):
    h, w = cfg.data.synthetic_hw
    out = []
    for v in range(n_videos):
        frames, t = synthetic_video(
            cfg.data.synthetic_frames, h, w, seed=cfg.manual_seed + v
        )
        out.append(FrameStore(jnp.asarray(frames), t, 1))
    return out


def test_suite_videos_are_distinct():
    cfg = tiny_train()
    a, b = _stores(cfg, 2)
    assert not np.array_equal(np.asarray(a.frames), np.asarray(b.frames))


def test_parallel_suite_matches_sequential_fits():
    """4 videos fitted in ONE vmapped program over a ('video',) mesh equal
    4 independent sequential fits leaf-for-leaf (same keys, same perms)."""
    n_videos, epochs = 4, 3
    cfg = tiny_train(epochs=10)
    stores = _stores(cfg, n_videos)
    steps = stores[0].num_samples // cfg.data.batch_size

    # sequential reference: same per-video keys/seed offsets as the driver
    vkeys = jax.random.split(jax.random.PRNGKey(cfg.manual_seed), n_videos)
    seq_params, seq_losses = [], []
    for v, store in enumerate(stores):
        state = init_train_state(vkeys[v], cfg)
        vcfg = dataclasses.replace(cfg, manual_seed=cfg.manual_seed + v)
        epoch_fn = make_epoch_fn(cfg, steps, with_msssim=False)
        for epoch in range(epochs):
            state, m = run_fused_epoch(state, epoch_fn, store, vcfg, epoch)
        seq_params.append(jax.tree.map(np.asarray, state.params))
        seq_losses.append(m.loss)

    mesh = Mesh(np.asarray(jax.devices()[:n_videos]), ("video",))
    videos = shard_suite(jnp.stack([s.frames for s in stores]), mesh)
    t_all = shard_suite(
        jnp.asarray(np.stack([s.t for s in stores]), jnp.float32), mesh
    )
    states = shard_suite(
        init_suite_states(jax.random.PRNGKey(cfg.manual_seed), cfg, n_videos),
        mesh,
    )
    epoch_fn = make_suite_epoch_fn(cfg, steps, mesh=mesh, with_msssim=False)
    for epoch in range(epochs):
        states, metrics = run_suite_epoch(
            states, epoch_fn, videos, t_all, cfg, epoch, steps, mesh
        )

    assert metrics["psnr"].shape[0] == n_videos
    for v in range(n_videos):
        par = extract_video_params(states, v)
        for a, b in zip(jax.tree.leaves(par), jax.tree.leaves(seq_params[v])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5
            )
        assert metrics["loss"][v] == pytest.approx(seq_losses[v], rel=1e-4)


def test_suite_perms_match_sequential_shuffles():
    """suite_perms reproduces run_fused_epoch's per-epoch shuffle for the
    per-video seed offsets the sequential driver uses."""
    cfg = tiny_train()
    perms = suite_perms(cfg, 3, 8, 2, epoch=5)
    for v in range(3):
        rng = np.random.default_rng((cfg.manual_seed + v) * 100003 + 5)
        idx = rng.permutation(8)
        np.testing.assert_array_equal(
            perms[v], idx[: 2 * cfg.data.batch_size].reshape(2, -1)
        )


def test_suite_perms_respect_frame_gap():
    """With frame_gap > 1 suite_perms shuffles the gap-strided
    sample_indices() exactly as run_fused_epoch does — the parallel mode
    must never train on the reference's held-out test-gap frames."""
    cfg = tiny_train()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, frame_gap=2)
    )
    n_frames, steps = 16, 2
    perms = suite_perms(cfg, 2, n_frames, steps, epoch=3)
    b = cfg.data.batch_size
    for v in range(2):
        # sequential reference: shuffle FrameStore.sample_indices()
        store = FrameStore(np.zeros((n_frames, 1, 1, 3), np.uint8),
                           np.arange(n_frames, dtype=np.float32), 2)
        idx = store.sample_indices()
        rng = np.random.default_rng((cfg.manual_seed + v) * 100003 + 3)
        rng.shuffle(idx)
        np.testing.assert_array_equal(
            perms[v], idx[: steps * b].reshape(steps, b)
        )
        assert (perms[v] % 2 == 0).all()  # only train-gap frames


def test_suite_parallel_trains_each_video():
    """Every video's loss decreases over epochs of the parallel fit."""
    n_videos = 8
    cfg = tiny_train(epochs=12, model=tiny_model(branch_type="ERB"))
    stores = _stores(cfg, n_videos)
    steps = stores[0].num_samples // cfg.data.batch_size
    mesh = Mesh(np.asarray(jax.devices()), ("video",))
    videos = shard_suite(jnp.stack([s.frames for s in stores]), mesh)
    t_all = shard_suite(
        jnp.asarray(np.stack([s.t for s in stores]), jnp.float32), mesh
    )
    states = shard_suite(
        init_suite_states(jax.random.PRNGKey(1), cfg, n_videos), mesh
    )
    epoch_fn = make_suite_epoch_fn(cfg, steps, mesh=mesh, with_msssim=False)
    first = last = None
    for epoch in range(cfg.epochs):
        states, m = run_suite_epoch(
            states, epoch_fn, videos, t_all, cfg, epoch, steps, mesh
        )
        if first is None:
            first = m["loss"].copy()
        last = m["loss"]
    assert np.isfinite(last).all()
    assert (last < first).all()


def test_suite_perms_unequal_lengths_cycle():
    """UVG-style unequal suites (ShakeNDry: 300 vs 600 frames): a short
    video's perm cycles fresh shuffles of its OWN frames — padded stack rows
    are never referenced, every true frame is visited, and the first
    permutation matches the equal-length draw index-for-index."""
    cfg = tiny_train()
    b = cfg.data.batch_size
    steps = 16 // b  # steps sized to the LONG video
    perms = suite_perms(cfg, 2, [16, 8], steps, epoch=5)
    # long video: identical to the scalar-n_frames draw
    np.testing.assert_array_equal(
        perms[0], suite_perms(cfg, 1, 16, steps, epoch=5)[0]
    )
    # short video: only true frames, all of them, first-perm prefix matches
    assert perms[1].max() < 8 and perms[1].min() >= 0
    flat = perms[1].reshape(-1)
    assert set(flat.tolist()) == set(range(8))
    rng = np.random.default_rng((cfg.manual_seed + 1) * 100003 + 5)
    np.testing.assert_array_equal(flat[:8], rng.permutation(8))


def test_suite_cli_parallel_unequal_lengths(tmp_path):
    """Parallel one-fit-per-device over per-video subdirs of DIFFERENT
    lengths (the real UVG layout) runs end-to-end: the stack zero-pads,
    perms index true frames only, and every video reaches a finite PSNR."""
    from PIL import Image

    from repnerv_tpu.cli.suite_main import main

    root = tmp_path / "uvgtiny"
    for v, n_frames in enumerate([8, 4]):
        d = root / f"vid{v}"
        d.mkdir(parents=True)
        rng = np.random.default_rng(v)
        for n in range(n_frames):
            img = rng.integers(0, 255, (8, 8, 3), np.uint8)
            Image.fromarray(img).save(d / f"f{n:02d}.png")
    out = tmp_path / "suite.json"
    result = main(
        [
            "--dataset", "uvgtiny", "--data_dir", str(tmp_path),
            "--embed", "1.25_8",
            "--stem_dim_num", "16_1", "--fc_hw_dim", "2_2_4",
            "--expansion", "1", "--strides", "2", "2",
            "--lower_width", "4", "-e", "4", "-b", "4",
            "--lr", "5e-3", "--loss", "L2", "--act", "swish",
            "--single_res", "--branch_type", "NeRV_vanilla",
            "--n_videos", "2", "--suite_mode", "parallel",
            "--suite_out", str(out),
        ]
    )
    assert result["mode"] == "parallel" and len(result["videos"]) == 2
    assert all(np.isfinite(r["psnr"]) for r in result["videos"])


def test_suite_cli_sequential_unequal_lengths(tmp_path):
    """Sequential mode builds one epoch fn PER step count so a short video's
    LR schedule paces over ITS OWN steps (not the first video's)."""
    from PIL import Image

    from repnerv_tpu.cli.suite_main import main

    root = tmp_path / "uvgtiny"
    for v, n_frames in enumerate([8, 4]):
        d = root / f"vid{v}"
        d.mkdir(parents=True)
        rng = np.random.default_rng(v)
        for n in range(n_frames):
            img = rng.integers(0, 255, (8, 8, 3), np.uint8)
            Image.fromarray(img).save(d / f"f{n:02d}.png")
    out = tmp_path / "suite.json"
    result = main(
        [
            "--dataset", "uvgtiny", "--data_dir", str(tmp_path),
            "--embed", "1.25_8",
            "--stem_dim_num", "16_1", "--fc_hw_dim", "2_2_4",
            "--expansion", "1", "--strides", "2", "2",
            "--lower_width", "4", "-e", "4", "-b", "4",
            "--lr", "5e-3", "--loss", "L2", "--act", "swish",
            "--single_res", "--branch_type", "NeRV_vanilla",
            "--n_videos", "2", "--suite_out", str(out),
        ]
    )
    assert len(result["videos"]) == 2
    assert all(np.isfinite(r["psnr"]) for r in result["videos"])


def test_suite_stores_real_dir_layouts(tmp_path):
    """Real-data suite semantics: a dataset dir of per-video SUBDIRECTORIES
    maps one subdir per video (the reference's UVG layout — one frame dir
    per video, reference README.md:63-111); a FLAT frame dir splits into
    n_videos contiguous chunks."""
    from PIL import Image

    from repnerv_tpu.cli.suite_main import _suite_stores
    from repnerv_tpu.config import DataConfig

    # subdir layout: 2 videos x 4 frames, pixel value encodes (video, frame)
    root = tmp_path / "uvgtiny"
    for v in range(2):
        d = root / f"vid{v}"
        d.mkdir(parents=True)
        for n in range(4):
            img = np.full((8, 10, 3), 40 * v + n, np.uint8)
            Image.fromarray(img).save(d / f"f{n:02d}.png")
    cfg = tiny_train()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, dataset="uvgtiny", data_dir=str(tmp_path),
            synthetic_frames=0, cache_device=False,
        ),
    )
    stores = _suite_stores(cfg, 2)
    assert len(stores) == 2
    for v, s in enumerate(stores):
        assert s.frames.shape == (4, 8, 10, 3)
        np.testing.assert_array_equal(
            np.asarray(s.frames)[:, 0, 0, 0], 40 * v + np.arange(4)
        )

    # flat layout: 6 frames -> 2 videos of 3 contiguous frames
    flat = tmp_path / "flattiny"
    flat.mkdir()
    for n in range(6):
        Image.fromarray(np.full((8, 10, 3), n, np.uint8)).save(
            flat / f"f{n:02d}.png"
        )
    cfg2 = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, dataset="flattiny")
    )
    stores2 = _suite_stores(cfg2, 2)
    np.testing.assert_array_equal(
        np.asarray(stores2[0].frames)[:, 0, 0, 0], [0, 1, 2]
    )
    np.testing.assert_array_equal(
        np.asarray(stores2[1].frames)[:, 0, 0, 0], [3, 4, 5]
    )
    # t stays normalized over the FULL flat sequence (reference model.py:37)
    assert stores2[1].t[0] == pytest.approx(3 / 6)


def test_suite_cli_sequential_writes_json(tmp_path):
    """The CLI driver end-to-end (sequential, 2 tiny videos, prune+quant):
    per-video PSNR/BPP rows plus aggregate means land in the JSON."""
    from repnerv_tpu.cli.suite_main import main

    out = tmp_path / "suite.json"
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        result = main(
            [
                "--dataset", "synth", "--synthetic_frames", "8",
                "--synthetic_hw", "8", "8", "--embed", "1.25_8",
                "--stem_dim_num", "16_1", "--fc_hw_dim", "2_2_4",
                "--expansion", "1", "--strides", "2", "2",
                "--lower_width", "4", "-e", "4", "-b", "4",
                "--lr", "5e-3", "--loss", "L2", "--act", "swish",
                "--single_res", "--branch_type", "ERB",
                "--prune_ratio", "0.5", "--quant_bit", "8",
                "--n_videos", "2", "--suite_out", str(out),
            ]
        )
    finally:
        os.chdir(cwd)
    assert out.exists()
    saved = json.loads(out.read_text())
    assert saved["n_videos"] == 2 and len(saved["videos"]) == 2
    for row in saved["videos"]:
        assert np.isfinite(row["psnr"]) and row["bpp"] > 0
    assert saved["mean_psnr"] == pytest.approx(
        np.mean([r["psnr"] for r in saved["videos"]])
    )
    assert result["mean_bpp"] > 0


def test_suite_cli_parallel_mode(tmp_path):
    """Parallel mode over the 8-device mesh through the CLI."""
    from repnerv_tpu.cli.suite_main import main

    out = tmp_path / "suite.json"
    result = main(
        [
            "--dataset", "synth", "--synthetic_frames", "8",
            "--synthetic_hw", "8", "8", "--embed", "1.25_8",
            "--stem_dim_num", "16_1", "--fc_hw_dim", "2_2_4",
            "--expansion", "1", "--strides", "2", "2",
            "--lower_width", "4", "-e", "4", "-b", "4",
            "--lr", "5e-3", "--loss", "L2", "--act", "swish",
            "--single_res", "--branch_type", "NeRV_vanilla",
            "--n_videos", "8", "--suite_mode", "parallel",
            "--suite_out", str(out),
        ]
    )
    assert result["mode"] == "parallel" and len(result["videos"]) == 8
    assert all(np.isfinite(r["psnr"]) for r in result["videos"])


def test_suite_perms_rejects_video_shorter_than_gap():
    """A video with fewer frames than frame_gap has zero trainable samples;
    the cycling draw must raise, not spin forever (code-review r3)."""
    import dataclasses

    cfg = tiny_train()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, frame_gap=4)
    )
    with pytest.raises(ValueError, match="frame_gap"):
        suite_perms(cfg, 2, [16, 3], 2, epoch=0)
