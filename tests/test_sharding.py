"""M5 tests: mesh sharding on the 8-device virtual CPU platform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from repnerv_tpu.parallel.sharding import (
    batch_spec,
    make_mesh,
    make_sharded_decode,
    make_sharded_train_state,
    make_sharded_train_step,
    params_specs,
    shard_batch,
    shard_params,
)
from repnerv_tpu.train.loop import init_train_state, make_train_step

from test_model_train import make_store, tiny_model, tiny_train


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.shape["data"] == 8
    mesh2 = make_mesh((4, 2), ("data", "model"))
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh((16,))


def test_batch_shards_over_data():
    mesh = make_mesh((8,), ("data",))
    frames = jnp.zeros((8, 4, 4, 3))
    t = jnp.zeros((8,))
    f, tt = shard_batch(frames, t, mesh)
    assert f.sharding.spec == P("data")
    assert len(f.sharding.device_set) == 8


def test_tp_specs_shard_divisible_dims():
    cfg = tiny_model(stem_dim_num="16_1")
    from repnerv_tpu.models.generator import init_generator

    params = init_generator(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh((4, 2), ("data", "model"))
    specs = params_specs(params, mesh, tensor_parallel=True)
    # first stem linear [embed, 16] -> column parallel over model
    assert specs["stem"][0]["w"] == P(None, "model")
    # second stem linear [16, h*w*c] -> row parallel
    assert specs["stem"][1]["w"] == P("model", None)
    sharded = shard_params(params, mesh)
    assert len(jax.tree.leaves(sharded)[0].sharding.device_set) == 8


def test_sharded_train_step_runs_and_matches_single_device():
    """The dp-sharded step must produce the same numbers as single-device
    (same global batch, same init)."""
    cfg = tiny_train()
    store = make_store(cfg)
    rows, t = next(store.epoch_batches(8, shuffle=False, seed=0, drop_last=False))
    frames = store.gather(rows)
    t = jnp.asarray(t)

    ref_state = init_train_state(jax.random.PRNGKey(0), cfg)
    ref_step = make_train_step(cfg, steps_per_epoch=1, with_msssim=False)
    ref_state, ref_aux = ref_step(ref_state, frames, t, None)

    mesh = make_mesh((8,), ("data",))
    state = make_sharded_train_state(jax.random.PRNGKey(0), cfg, mesh)
    step = make_sharded_train_step(cfg, steps_per_epoch=1, mesh=mesh)
    state, aux = step(state, frames, t)

    assert float(aux["loss"]) == pytest.approx(float(ref_aux["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_train_step_dp_tp_mesh():
    """Full step over a 2D (data x model) mesh with tp-sharded stem."""
    cfg = tiny_train(model=tiny_model(branch_type="ERB", stem_dim_num="16_1"))
    store = make_store(cfg)
    rows, t = next(store.epoch_batches(8, shuffle=False, seed=0, drop_last=False))
    frames = store.gather(rows)

    mesh = make_mesh((4, 2), ("data", "model"))
    state = make_sharded_train_state(jax.random.PRNGKey(0), cfg, mesh)
    step = make_sharded_train_step(cfg, steps_per_epoch=1, mesh=mesh)
    state, aux = step(state, frames, jnp.asarray(t))
    assert np.isfinite(float(aux["loss"]))
    state, aux2 = step(state, frames, jnp.asarray(t))
    assert float(aux2["loss"]) < float(aux["loss"]) * 1.5  # sane second step


def test_sharded_decode():
    cfg = tiny_train()
    mesh = make_mesh((8,), ("data",))
    from repnerv_tpu.models.generator import init_generator

    params = shard_params(init_generator(jax.random.PRNGKey(0), cfg.model), mesh)
    decode = make_sharded_decode(cfg, mesh)
    out = decode(params, jnp.linspace(0, 1, 16))
    assert out.shape == (16, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_shard_train_state_preserves_resumed_values():
    """Resume + mesh: sharding an existing state must keep its values (the
    round-1 ADVICE medium: re-initializing discarded the restored params)."""
    from repnerv_tpu.parallel.sharding import shard_train_state

    cfg = tiny_train()
    state = init_train_state(jax.random.PRNGKey(3), cfg)
    # simulate a resumed state: non-zero params drift + step counter
    bumped = jax.tree.map(lambda x: x + 0.25, state.params)
    state = state._replace(params=bumped, step=jnp.asarray(42, jnp.int32))

    mesh = make_mesh((8,), ("data",))
    sharded = shard_train_state(state, mesh)
    assert int(sharded.step) == 42
    for a, b in zip(jax.tree.leaves(sharded.params), jax.tree.leaves(bumped)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # and the sharded step still trains from those exact values
    store = make_store(cfg)
    rows, t = next(store.epoch_batches(8, shuffle=False, seed=0, drop_last=False))
    step = make_sharded_train_step(cfg, steps_per_epoch=1, mesh=mesh)
    new_state, aux = step(sharded, store.gather(rows), jnp.asarray(t))
    assert np.isfinite(float(aux["loss"]))
    assert int(new_state.step) == 43


def test_sharded_fused_epoch_matches_single_device():
    """The whole-epoch scan over the 8-device data mesh equals the
    single-device fused epoch: same state, same metrics, ONE dispatch per
    epoch (VERDICT r2 weak #3 / next-step #5)."""
    from repnerv_tpu.parallel.sharding import make_sharded_epoch_fn
    from repnerv_tpu.train.loop import make_epoch_fn, run_fused_epoch

    cfg = tiny_train()
    cfg.data.batch_size = 8  # divisible by the data axis
    store = make_store(cfg)
    steps = max(store.num_samples // cfg.data.batch_size, 1)

    ref_state = init_train_state(jax.random.PRNGKey(0), cfg)
    ref_epoch = make_epoch_fn(cfg, steps, with_msssim=False)
    ref_state, ref_m = run_fused_epoch(ref_state, ref_epoch, store, cfg, epoch=0)

    mesh = make_mesh((8,), ("data",))
    state = make_sharded_train_state(jax.random.PRNGKey(0), cfg, mesh)
    epoch_fn = make_sharded_epoch_fn(cfg, steps, mesh, with_msssim=False)
    state, m = run_fused_epoch(state, epoch_fn, store, cfg, epoch=0)

    np.testing.assert_allclose(m.psnr, ref_m.psnr, atol=1e-4)
    assert m.loss == pytest.approx(ref_m.loss, rel=1e-5)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_fused_epoch_trains_over_dp_tp_mesh():
    """Whole-epoch scan compiles and trains over a 2D (data x model) mesh."""
    from repnerv_tpu.parallel.sharding import make_sharded_epoch_fn
    from repnerv_tpu.train.loop import run_fused_epoch

    cfg = tiny_train(model=tiny_model(branch_type="ERB", stem_dim_num="16_1"))
    cfg.data.batch_size = 4
    store = make_store(cfg)
    steps = max(store.num_samples // cfg.data.batch_size, 1)
    mesh = make_mesh((4, 2), ("data", "model"))
    state = make_sharded_train_state(jax.random.PRNGKey(0), cfg, mesh)
    epoch_fn = make_sharded_epoch_fn(cfg, steps, mesh, with_msssim=False)
    losses = []
    for epoch in range(3):
        state, m = run_fused_epoch(state, epoch_fn, store, cfg, epoch)
        losses.append(m.loss)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_video_decode_matches_single_device():
    """The whole-video decode scan over the 8-device data mesh renders the
    SAME frames as the single-device scan (params replicated, batch column
    sharded), and the checksum (throughput) variant agrees too."""
    from repnerv_tpu.parallel.sharding import make_sharded_video_decode_fn
    from repnerv_tpu.train.loop import make_video_decode_fn

    cfg = tiny_train()
    from repnerv_tpu.models.generator import init_generator

    params = init_generator(jax.random.PRNGKey(3), cfg.model)
    t_mat = jnp.linspace(0, 1, 32).reshape(4, 8)  # 4 scan steps x B=8

    ref = make_video_decode_fn(cfg, keep_frames=True)(params, t_mat)
    out = make_sharded_video_decode_fn(cfg, mesh=make_mesh((8,), ("data",)), keep_frames=True)(
        params, t_mat
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    ref_sum = make_video_decode_fn(cfg, keep_frames=False)(params, t_mat)
    out_sum = make_sharded_video_decode_fn(cfg, mesh=make_mesh((8,), ("data",)))(
        params, t_mat
    )
    np.testing.assert_allclose(np.asarray(out_sum), np.asarray(ref_sum), rtol=1e-5)


def test_decode_cli_mesh(tmp_path):
    """decode_main --mesh_shape 8: the standalone serving CLI measures
    throughput over the virtual 8-device mesh from a .rnvb artifact."""
    from repnerv_tpu.cli.decode_main import main
    from repnerv_tpu.compress.bitstream import write_bitstream
    from repnerv_tpu.models.generator import init_generator

    mcfg = tiny_model()
    params = init_generator(jax.random.PRNGKey(4), mcfg)
    path = str(tmp_path / "model.rnvb")
    write_bitstream(path, params, mcfg, quant_bit=8)

    r = main([path, "--frames", "16", "--mesh_shape", "8"])
    assert np.isfinite(r["fps"]) and r["fps"] > 0
    assert r["batch"] % 8 == 0


def test_sharded_epoch_never_traces_pallas_blur(monkeypatch):
    """GSPMD cannot partition a Mosaic pallas_call: the sharded train step
    must trace the SSIM loss through the plain-XLA blur.  INTERPRET=True
    makes the gate *want* the kernel; the poisoned kernel entry proves the
    >1-device factory never reaches it (a 1-device mesh still may)."""
    from repnerv_tpu.ops import ssim as ssim_mod
    from repnerv_tpu.pallas_kernels import ssim_blur as sb
    from repnerv_tpu.parallel.sharding import make_sharded_epoch_fn
    from repnerv_tpu.train.loop import run_fused_epoch
    from repnerv_tpu.config import DataConfig

    monkeypatch.setattr(sb, "INTERPRET", True)

    def _boom(*a, **k):
        raise AssertionError("pallas blur traced inside a sharded graph")

    monkeypatch.setattr(ssim_mod, "_ssim_maps_pallas", _boom)

    # control: single-device ssim at >=96x96 WOULD take the kernel path
    big = jnp.zeros((1, 96, 96, 3), jnp.float32)
    with pytest.raises(AssertionError, match="sharded graph"):
        ssim_mod.ssim(big, big)

    cfg = tiny_train(
        model=tiny_model(fc_hw_dim="6_6_4", strides=(4, 4)),
        data=DataConfig(
            synthetic_frames=8, synthetic_hw=(96, 96), batch_size=8,
            cache_device=False,
        ),
        loss_type="Fusion6",
    )
    store = make_store(cfg)
    mesh = make_mesh((8,), ("data",))
    state = make_sharded_train_state(jax.random.PRNGKey(0), cfg, mesh)
    epoch_fn = make_sharded_epoch_fn(cfg, steps_per_epoch=1, mesh=mesh)
    state, m = run_fused_epoch(state, epoch_fn, store, cfg, epoch=0)
    assert np.isfinite(np.asarray(m.loss)).all()
