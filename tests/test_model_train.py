"""M1/M3 tests: generator shapes, train step, overfit smoke, checkpoints."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from repnerv_tpu.config import DataConfig, ModelConfig, TrainConfig, output_hw, stage_channels
from repnerv_tpu.data.frames import FrameStore, adaptive_avg_pool, synthetic_video
from repnerv_tpu.models.embedding import positional_encoding
from repnerv_tpu.models.generator import (
    apply_generator,
    generator_to_deploy,
    init_generator,
    param_count,
)
from repnerv_tpu.train.loop import (
    init_train_state,
    make_eval_step,
    make_train_step,
    run_epoch,
)


def tiny_model(**over) -> ModelConfig:
    kw = dict(
        embed="1.25_8",
        stem_dim_num="16_1",
        fc_hw_dim="2_2_4",
        expansion=1.0,
        reduction=2,
        strides=(2, 2),
        num_blocks=1,
        lower_width=4,
        act="swish",
        norm="none",
        single_res=True,
        branch_type="NeRV_vanilla",
    )
    kw.update(over)
    return ModelConfig(**kw)


def tiny_train(**over) -> TrainConfig:
    mc = over.pop("model", tiny_model())
    dc = DataConfig(synthetic_frames=8, synthetic_hw=(8, 8), batch_size=4, cache_device=False)
    kw = dict(model=mc, data=dc, epochs=20, warmup=0.2, lr=5e-3, loss_type="L2")
    kw.update(over)
    return TrainConfig(**kw)


def make_store(cfg: TrainConfig) -> FrameStore:
    h, w = cfg.data.synthetic_hw
    frames, t = synthetic_video(cfg.data.synthetic_frames, h, w)
    return FrameStore(frames=frames, t=t, frame_gap=1)


# ---------------------------------------------------------------------------
# Generator shapes / schedule (reference model.py:571-625)
# ---------------------------------------------------------------------------


def test_paper_config_schedule():
    """Bunny 720p schedule from SURVEY.md: channels 26->26->96x4, out 720x1280."""
    cfg = ModelConfig()  # paper defaults
    assert stage_channels(cfg) == [
        (26, 26, 5),
        (26, 96, 2),
        (96, 96, 2),
        (96, 96, 2),
        (96, 96, 2),
    ]
    assert output_hw(cfg) == (720, 1280)
    assert cfg.embed_length == 80


def test_generator_forward_shapes_single_res():
    cfg = tiny_model()
    params = init_generator(jax.random.PRNGKey(0), cfg)
    emb = positional_encoding(jnp.asarray([0.1, 0.5]), cfg.embed)
    outs = apply_generator(params, emb, cfg)
    assert len(outs) == 1
    assert outs[0].shape == (2, 8, 8, 3)
    assert float(outs[0].min()) >= 0.0 and float(outs[0].max()) <= 1.0


def test_generator_multi_res_heads():
    cfg = tiny_model(single_res=False)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    emb = positional_encoding(jnp.asarray([0.3]), cfg.embed)
    outs = apply_generator(params, emb, cfg)
    assert [o.shape for o in outs] == [(1, 4, 4, 3), (1, 8, 8, 3)]


def test_generator_num_blocks_stride_placement():
    cfg = tiny_model(num_blocks=2)
    # only the first block of each stage carries the stride
    assert [s for (_, _, s) in stage_channels(cfg)] == [2, 1, 2, 1]
    params = init_generator(jax.random.PRNGKey(0), cfg)
    emb = positional_encoding(jnp.asarray([0.3]), cfg.embed)
    assert apply_generator(params, emb, cfg)[0].shape == (1, 8, 8, 3)


def test_generator_sigmoid_output():
    cfg = tiny_model(sigmoid=True)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    emb = positional_encoding(jnp.asarray([0.3]), cfg.embed)
    out = apply_generator(params, emb, cfg)[0]
    assert float(out.min()) > 0.0 and float(out.max()) < 1.0


def test_expansion_and_lower_width():
    cfg = tiny_model(expansion=2.0, lower_width=2, fc_hw_dim="2_2_8")
    plan = stage_channels(cfg)
    assert plan[0] == (8, 16, 2)  # stage0 expands 8 -> 16
    assert plan[1] == (16, 8, 2)  # 16 // 2 = 8 >= lower_width


def test_deploy_generator_equivalence():
    cfg = tiny_model(branch_type="ERB")
    params = init_generator(jax.random.PRNGKey(1), cfg)
    emb = positional_encoding(jnp.asarray([0.25, 0.75]), cfg.embed)
    out_train = apply_generator(params, emb, cfg, train=False)[0]
    dep_params, dep_cfg = generator_to_deploy(params, cfg)
    assert dep_cfg.deploy
    out_dep = apply_generator(dep_params, emb, dep_cfg, train=False)[0]
    np.testing.assert_allclose(
        np.asarray(out_train), np.asarray(out_dep), atol=1e-5
    )
    assert param_count(dep_params) < param_count(params)


# ---------------------------------------------------------------------------
# Data layer
# ---------------------------------------------------------------------------


def test_synthetic_video_deterministic():
    f1, t1 = synthetic_video(4, 8, 8, seed=3)
    f2, t2 = synthetic_video(4, 8, 8, seed=3)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_allclose(t1, [0, 0.25, 0.5, 0.75])


def test_photo_video_real_content():
    """``--dataset photo``: deterministic pan over a real photograph with
    far more high-frequency energy than the synthetic texture (the
    real-content quality-evidence clip, data/frames.py photo_video)."""
    from repnerv_tpu.data.frames import make_frame_store, photo_video
    from repnerv_tpu.config import DataConfig

    f1, t1 = photo_video(4, 48, 64, seed=1)
    f2, _ = photo_video(4, 48, 64, seed=1)
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape == (4, 48, 64, 3) and f1.dtype == np.uint8
    np.testing.assert_allclose(t1, [0, 0.25, 0.5, 0.75])

    def lap_energy(img):
        g = img.astype(np.float32).mean(-1)
        return np.abs(
            4 * g[1:-1, 1:-1]
            - g[:-2, 1:-1] - g[2:, 1:-1] - g[1:-1, :-2] - g[1:-1, 2:]
        ).mean()

    # at real resolutions the photo carries far more high-frequency energy
    # than the synthetic texture (at tiny sizes the comparison inverts:
    # the noise octaves scale with resolution, photo crops downscale smooth)
    photo_hi, _ = photo_video(1, 240, 320)
    synth_hi, _ = synthetic_video(1, 240, 320)
    assert lap_energy(photo_hi[0]) > 2 * lap_energy(synth_hi[0])

    # suite diversity: seeds give distinct CONTENT (rotation/mirror of the
    # source photo, suite_main.py one seed per video), not just camera paths
    f_s0, _ = photo_video(1, 64, 64, seed=0)
    f_s1, _ = photo_video(1, 64, 64, seed=1)
    assert np.abs(f_s0.astype(int) - f_s1.astype(int)).mean() > 5

    store = make_frame_store(
        DataConfig(dataset="photo", synthetic_frames=3, synthetic_hw=(16, 16),
                   cache_device=False)
    )
    assert store.frames.shape == (3, 16, 16, 3)


def test_frame_store_gap_sampling():
    frames, t = synthetic_video(10, 4, 4)
    store = FrameStore(frames=frames, t=t, frame_gap=2)
    assert store.num_samples == 5
    np.testing.assert_array_equal(store.sample_indices(), [0, 2, 4, 6, 8])
    batches = list(store.epoch_batches(2, shuffle=False, seed=0, drop_last=True))
    assert len(batches) == 2
    rows, tt = batches[0]
    assert store.gather(rows).shape == (2, 4, 4, 3)
    np.testing.assert_allclose(tt, t[rows])


def test_adaptive_avg_pool_integer_ratio():
    x = jnp.arange(1 * 4 * 4 * 1, dtype=jnp.float32).reshape(1, 4, 4, 1)
    y = adaptive_avg_pool(x, (2, 2))
    np.testing.assert_allclose(
        np.asarray(y[0, :, :, 0]), [[2.5, 4.5], [10.5, 12.5]]
    )


def test_frame_dir_loading(tmp_path):
    from PIL import Image

    from repnerv_tpu.data.frames import load_frame_dir

    for i in range(3):
        arr = np.full((6, 8, 3), i * 40, np.uint8)
        Image.fromarray(arr).save(tmp_path / f"f{i:03d}.png")
    # portrait frame gets transposed
    Image.fromarray(np.zeros((8, 6, 3), np.uint8)).save(tmp_path / "f003.png")
    frames, t = load_frame_dir(str(tmp_path))
    assert frames.shape == (4, 6, 8, 3)
    np.testing.assert_allclose(t, [0, 0.25, 0.5, 0.75])
    assert frames[1, 0, 0, 0] == 40


# ---------------------------------------------------------------------------
# Train step + overfit smoke (SURVEY.md §4: highest-value test)
# ---------------------------------------------------------------------------


def test_train_step_decreases_loss():
    cfg = tiny_train()
    store = make_store(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, steps_per_epoch=2, with_msssim=False)
    rows, t = next(store.epoch_batches(4, shuffle=False, seed=0, drop_last=True))
    frames = store.gather(rows)
    t = jnp.asarray(t)
    losses = []
    for _ in range(30):
        state, aux = step(state, frames, t, None)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    assert int(state.step) == 30


@pytest.mark.parametrize("branch_type", ["NeRV_vanilla", "ERB"])
def test_overfit_smoke(branch_type):
    """A few synthetic frames must overfit to rising PSNR on CPU."""
    cfg = tiny_train(model=tiny_model(branch_type=branch_type), epochs=40, lr=1e-2)
    store = make_store(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, steps_per_epoch=2, with_msssim=False)
    first = last = None
    for epoch in range(cfg.epochs):
        state, m = run_epoch(state, step, store, cfg, epoch)
        if first is None:
            first = m.psnr[-1]
        last = m.psnr[-1]
    assert last > first + 3.0, (first, last)
    assert last > 14.0, last


def test_eval_matches_train_forward():
    cfg = tiny_train()
    store = make_store(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    eval_step = make_eval_step(cfg, with_msssim=False)
    rows, t = next(store.epoch_batches(4, shuffle=False, seed=0, drop_last=False))
    outs, aux = eval_step(state.params, store.gather(rows), jnp.asarray(t))
    assert outs[-1].shape == (4, 8, 8, 3)
    assert np.isfinite(np.asarray(aux["psnr"])).all()


def test_lr_follows_schedule_inside_step():
    cfg = tiny_train(epochs=10, warmup=0.2, lr=1e-3)
    store = make_store(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, steps_per_epoch=2, with_msssim=False)
    rows, t = next(store.epoch_batches(4, shuffle=False, seed=0, drop_last=True))
    frames, t = store.gather(rows), jnp.asarray(t)
    state, aux = step(state, frames, t, None)
    # step 0 -> frac_epoch 0 -> warmup mult 0.1
    assert float(aux["lr"]) == pytest.approx(1e-3 * 0.1, rel=1e-5)
    state, aux = step(state, frames, t, None)
    # step 1 -> frac_epoch 0.5, warmup = 2 epochs -> 0.1 + 0.9*0.25
    assert float(aux["lr"]) == pytest.approx(1e-3 * (0.1 + 0.9 * 0.25), rel=1e-5)


# ---------------------------------------------------------------------------
# Checkpoint round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("branch_type", ["NeRV_vanilla", "ERB", "ECB"])
def test_pth_roundtrip(branch_type, tmp_path):
    from repnerv_tpu.train.checkpoint import load_pth, save_pth

    cfg = tiny_model(branch_type=branch_type)
    params = init_generator(jax.random.PRNGKey(2), cfg)
    path = str(tmp_path / "model_latest.pth")
    save_pth(path, params, cfg, extra={"epoch": 5})
    params2, extra = load_pth(path, cfg)
    assert extra["epoch"] == 5
    emb = positional_encoding(jnp.asarray([0.4]), cfg.embed)
    o1 = apply_generator(params, emb, cfg)[0]
    o2 = apply_generator(params2, emb, cfg)[0]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_pth_names_match_reference_scheme(tmp_path):
    """Key names must be what read_pth.py's heuristics look for
    (read_pth.py:148-162): ERB branch names in train state, rbr_reparam in
    deploy state."""
    from repnerv_tpu.train.checkpoint import params_to_torch_state

    cfg = tiny_model(branch_type="ERB")
    params = init_generator(jax.random.PRNGKey(2), cfg)
    names = set(params_to_torch_state(params, cfg))
    assert "stem.0.weight" in names
    assert "layers.0.rbr_3x3_branch.weight" in names
    assert "layers.0.rbr_1x1_3x3_1x1_branch_1x1_1.weight" in names
    assert "head_layers.1.weight" in names
    dep, dep_cfg = generator_to_deploy(params, cfg)
    dep_names = set(params_to_torch_state(dep, dep_cfg))
    assert "layers.0.rbr_reparam.weight" in dep_names
    assert not any("rbr_3x3_branch" in n for n in dep_names)


def test_orbax_roundtrip(tmp_path):
    from repnerv_tpu.train.checkpoint import load_orbax, save_orbax

    cfg = tiny_train()
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    save_orbax(str(tmp_path), "ckpt", {"params": state.params, "step": 7})
    like = {"params": state.params, "step": 0}
    restored = load_orbax(str(tmp_path), "ckpt", like)
    assert restored["step"] == 7
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored["params"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_fused_epoch_matches_per_step():
    """The whole-epoch lax.scan path must produce the same params/metrics as
    the per-step loop (same shuffle seed => same batch order)."""
    from repnerv_tpu.train.loop import make_epoch_fn, run_fused_epoch

    cfg = tiny_train(epochs=10)
    store = make_store(cfg)

    s1 = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, steps_per_epoch=2, with_msssim=False)
    s1, m1 = run_epoch(s1, step, store, cfg, epoch=0)

    s2 = init_train_state(jax.random.PRNGKey(0), cfg)
    epoch_fn = make_epoch_fn(cfg, steps_per_epoch=2, with_msssim=False)
    s2, m2 = run_fused_epoch(s2, epoch_fn, store, cfg, epoch=0)

    assert m2.psnr[-1] == pytest.approx(m1.psnr[-1], abs=1e-4)
    assert m2.loss == pytest.approx(m1.loss, rel=1e-5)
    assert int(s2.step) == int(s1.step) == 2
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_epoch_respects_max_steps():
    from repnerv_tpu.train.loop import make_epoch_fn, run_fused_epoch

    cfg = tiny_train()
    store = make_store(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    epoch_fn = make_epoch_fn(cfg, steps_per_epoch=2, with_msssim=False)
    state, m = run_fused_epoch(state, epoch_fn, store, cfg, 0, max_steps=1)
    assert int(state.step) == 1


def test_mixed_precision_mode():
    """'mixed' = f32 activations, bf16 MXU inputs + f32 accumulation on
    every conv/matmul; output finite f32 (see test_mixed_precision.py)."""
    cfg = tiny_model(branch_type="ERB", compute_dtype="mixed")
    params = init_generator(jax.random.PRNGKey(0), cfg)
    emb = positional_encoding(jnp.asarray([0.2, 0.8]), cfg.embed)
    out = apply_generator(params, emb, cfg)[0]
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
    # close to the f32 graph (bf16 stage rounding only)
    f32 = apply_generator(
        params, emb, dataclasses.replace(cfg, compute_dtype="float32")
    )[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(f32), atol=0.05)


def test_corpus_video_classes():
    """``--dataset corpus``: seed k -> content class k % 4 (photo / MRI /
    terrain / rendered text; data/frames.py corpus_video) — every class
    deterministic, non-degenerate, and pairwise distinct (the quality-
    evidence corpus spans real photograph, medical, terrain, and hard-edge
    glyph content; VERDICT r3 weak #3)."""
    from repnerv_tpu.config import DataConfig
    from repnerv_tpu.data.frames import CORPUS_CLASSES, corpus_video, make_frame_store

    clips = []
    for seed in range(len(CORPUS_CLASSES)):
        f1, t1 = corpus_video(3, 48, 64, seed=seed)
        f2, _ = corpus_video(3, 48, 64, seed=seed)
        np.testing.assert_array_equal(f1, f2)
        assert f1.shape == (3, 48, 64, 3) and f1.dtype == np.uint8
        assert f1.std() > 3.0, f"degenerate {CORPUS_CLASSES[seed]} content"
        # temporal motion: the camera pan must actually move pixels
        assert np.abs(f1[2].astype(int) - f1[0].astype(int)).mean() > 0.5
        clips.append(f1[0].astype(int))
    for i in range(len(clips)):
        for j in range(i + 1, len(clips)):
            assert np.abs(clips[i] - clips[j]).mean() > 5, (
                f"classes {CORPUS_CLASSES[i]} and {CORPUS_CLASSES[j]} look alike"
            )
    # within-class variants (seed // 4) differ too
    a, _ = corpus_video(1, 48, 64, seed=1)
    b, _ = corpus_video(1, 48, 64, seed=5)
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 1

    store = make_frame_store(
        DataConfig(dataset="corpus", synthetic_frames=2, synthetic_hw=(16, 16),
                   cache_device=False)
    )
    assert store.frames.shape == (2, 16, 16, 3)

    # --content_seed reproduces exactly the content the suite driver assigns
    # video v (cli/suite_main.py uses manual_seed + v)
    keyed = make_frame_store(
        DataConfig(dataset="corpus", synthetic_frames=2, synthetic_hw=(16, 16),
                   cache_device=False, content_seed=5)
    )
    direct, _ = corpus_video(2, 16, 16, seed=5)
    np.testing.assert_array_equal(np.asarray(keyed.frames), direct)
