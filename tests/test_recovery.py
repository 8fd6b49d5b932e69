"""In-run divergence guard: detection, restore-best recovery, finalize.

Motivated by two recorded mid-training collapses (BENCHMARKS "mid-training
collapse"): the round-4 suite's 6.96 dB video and the round-5 static-text
probe (39.81 dB at epoch 73 -> frozen 11.07 for the remaining 215 epochs,
``result/q5_text_static/rank0.txt``).  The guard is the in-run half of
SURVEY §5.3 failure recovery; the suite driver's post-hoc flag+refit
(test_divergence.py) is the other half."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from repnerv_tpu.config import DataConfig, ModelConfig, TrainConfig
from repnerv_tpu.train.loop import init_train_state, make_optimizer
from repnerv_tpu.train.recovery import DivergenceGuard


def tiny_cfg(**over) -> TrainConfig:
    mc = ModelConfig(
        embed="1.25_4",
        stem_dim_num="8_1",
        fc_hw_dim="2_2_4",
        strides=(2, 2),
        lower_width=4,
        act="swish",
        norm="none",
        single_res=True,
        branch_type="NeRV_vanilla",
    )
    dc = DataConfig(synthetic_frames=8, synthetic_hw=(8, 8), batch_size=4)
    kw = dict(model=mc, data=dc, epochs=10, lr=5e-3, loss_type="L2")
    kw.update(over)
    return TrainConfig(**kw)


def snap(p):
    return jax.tree.map(lambda x: x + 0, p)


def bump(state, delta):
    """A distinguishable params mutation standing in for an epoch's update."""
    return state._replace(
        params=jax.tree.map(lambda x: x + delta, state.params),
        step=state.step + 1,
    )


def leaves_allclose(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return all(np.allclose(x, y) for x, y in zip(la, lb))


def test_healthy_trajectory_never_recovers():
    cfg = tiny_cfg()
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    guard = DivergenceGuard(cfg, snap, log=lambda m: None)
    for epoch, psnr in enumerate([10.0, 18.0, 25.0, 24.1, 30.0, 29.5]):
        state, recovered = guard.observe(epoch, psnr, state)
        assert not recovered
        state = bump(state, 0.01)
    final, restored = guard.finalize(state)
    assert not restored and final is state


def test_collapse_restores_best_params_and_fresh_optimizer():
    cfg = tiny_cfg()
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    guard = DivergenceGuard(cfg, snap, log=lambda m: None)
    best_params = None
    for epoch, psnr in enumerate([10.0, 20.0, 30.0]):
        state, recovered = guard.observe(epoch, psnr, state)
        assert not recovered
        best_params = snap(state.params)  # epoch 2 (30 dB) is the best
        state = bump(state, 0.5)
    # collapse: 30 -> 11 (> 6 dB below best), mirroring q5_text_static
    step_before = int(state.step)
    state, recovered = guard.observe(3, 11.0, state)
    assert recovered
    assert leaves_allclose(state.params, best_params)
    # fresh Adam moments: all-zero, not the pre-collapse moments
    fresh = make_optimizer(cfg).init(state.params)
    assert leaves_allclose(state.opt_state, fresh)
    # LR-schedule position preserved
    assert int(state.step) == step_before


def test_nan_psnr_triggers_recovery():
    cfg = tiny_cfg()
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    guard = DivergenceGuard(cfg, snap, log=lambda m: None)
    state, _ = guard.observe(0, 25.0, state)
    state, recovered = guard.observe(1, float("nan"), bump(state, 1.0))
    assert recovered


def test_bounded_retries_then_finalize_restores():
    cfg = tiny_cfg(max_recoveries=1)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    logs = []
    guard = DivergenceGuard(cfg, snap, log=logs.append)
    state, _ = guard.observe(0, 30.0, state)
    best_params = snap(state.params)
    state, rec1 = guard.observe(1, 11.0, bump(state, 1.0))
    assert rec1
    # second collapse: budget spent -> no restore, loud log
    state2 = bump(state, 1.0)
    state3, rec2 = guard.observe(2, 10.0, state2)
    assert not rec2 and state3 is state2
    assert any("budget is spent" in m for m in logs)
    # finalize still refuses to return the collapsed endpoint
    final, restored = guard.finalize(state3)
    assert restored
    assert leaves_allclose(final.params, best_params)


def test_disabled_guard_is_inert():
    cfg = tiny_cfg(recover_drop_db=0.0)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    guard = DivergenceGuard(cfg, snap, log=lambda m: None)
    state, _ = guard.observe(0, 30.0, state)
    s2 = bump(state, 1.0)
    s3, recovered = guard.observe(1, 5.0, s2)
    assert not recovered and s3 is s2
    final, restored = guard.finalize(s3)
    assert not restored


def test_small_dips_below_best_tolerated():
    """Healthy runs dip ~1.5 dB below best (bf16 eval noise, LR bumps) —
    must not trigger."""
    cfg = tiny_cfg()
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    guard = DivergenceGuard(cfg, snap, log=lambda m: None)
    for epoch, psnr in enumerate([30.0, 28.6, 25.0, 29.0]):
        state, recovered = guard.observe(epoch, psnr, state)
        assert not recovered, f"dip at epoch {epoch} wrongly flagged"


def test_run_training_recovers_from_injected_collapse(tmp_path, monkeypatch):
    """End-to-end wiring: blow up the params mid-run and check the driver
    logs a recovery and finishes with a healthy (non-collapsed) PSNR."""
    import os

    from repnerv_tpu.cli import train_main

    real_run_epoch = train_main.run_epoch
    blown = {"done": False}

    def sabotaged_run_epoch(state, step_fn, store, cfg, epoch, max_steps=None):
        # blow the params at epoch ENTRY so the epoch's reported PSNR is
        # the collapsed one (keeping the metric<->params association the
        # guard's snapshot relies on, as in a real collapse)
        if epoch == 5 and not blown["done"]:
            blown["done"] = True
            state = state._replace(
                params=jax.tree.map(lambda x: x * 1e4, state.params)
            )
        return real_run_epoch(state, step_fn, store, cfg, epoch, max_steps=max_steps)

    monkeypatch.setattr(train_main, "run_epoch", sabotaged_run_epoch)
    cfg = tiny_cfg(
        epochs=10,
        fused_epoch=False,
        eval_freq=100,
        ckpt_freq=10,
        outf=str(tmp_path / "rec"),
        # the 8x8 toy model only reaches ~9 dB, so the blown-params epoch
        # lands ~4 dB below best — tighten the threshold to exercise the
        # wiring (the 6 dB default is calibrated for real runs)
        recover_drop_db=3.0,
    )
    monkeypatch.chdir(tmp_path)
    out = train_main.run_training(cfg)
    log = open(
        os.path.join(out["outf"], "rank0.txt"), encoding="utf-8"
    ).read()
    assert "DIVERGED" in log and "restoring the best snapshot" in log
    # the run must end healthy: the final logged epoch is back at (or past)
    # the pre-collapse level, not frozen at the collapsed ~5 dB
    last_psnr = float(log.rsplit("PSNR: ", 2)[1].split()[0])
    assert last_psnr > 9.0, log
    assert out["bests"]["train_best_psnr"] > 9.0
