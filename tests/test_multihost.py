"""Multi-host data path — 2-process CPU simulation + unit tests.

The reference's distributed path is dead code (``dist.init_process_group``
is never called, reference utils.py:69-107, main_train.py:95-99).  Ours is
real: these tests prove a 2-process run (Gloo collectives between
processes, 4 virtual devices each) trains to the SAME losses as a
single-process run over the same global batch.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from repnerv_tpu.config import DataConfig, ModelConfig, TrainConfig
from repnerv_tpu.data.frames import FrameStore, synthetic_video
from repnerv_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_train_state,
    make_sharded_train_step,
    maybe_initialize_distributed,
    process_local_slice,
)
from repnerv_tpu.train.loop import run_epoch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_multihost_child.py")


def _mirror_cfg() -> TrainConfig:
    # MUST mirror tests/_multihost_child.py
    return TrainConfig(
        model=ModelConfig(
            embed="1.25_8",
            stem_dim_num="16_1",
            fc_hw_dim="2_2_4",
            strides=(2, 2),
            lower_width=4,
            act="swish",
            branch_type="ERB",
        ),
        data=DataConfig(
            synthetic_frames=8, synthetic_hw=(8, 8), batch_size=8, cache_device=False
        ),
        epochs=20,
        warmup=0.2,
        lr=5e-3,
        loss_type="L2",
    )


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def single_process_reference():
    """Same config/seed/global batch on this process's 8 virtual devices."""
    cfg = _mirror_cfg()
    frames, t = synthetic_video(8, 8, 8)
    store = FrameStore(frames=frames, t=t, frame_gap=1)
    mesh = make_mesh((8,), ("data",))
    state = make_sharded_train_state(jax.random.PRNGKey(0), cfg, mesh)
    step = make_sharded_train_step(cfg, steps_per_epoch=1, mesh=mesh)
    losses, psnrs = [], []
    for epoch in range(3):
        state, m = run_epoch(state, step, store, cfg, epoch)
        losses.append(m.loss)
        psnrs.append(float(m.psnr[-1]))
    checksum = float(
        sum(
            jnp.sum(jnp.abs(x.astype(jnp.float32)))
            for x in jax.tree.leaves(state.params)
        )
    )
    return {"losses": losses, "psnrs": psnrs, "checksum": checksum}


def test_two_process_training_matches_single_process(
    tmp_path, single_process_reference
):
    port = _free_port()
    out_prefix = str(tmp_path / "mh")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, "-u", CHILD, str(port), str(pid), out_prefix],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host child timed out")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"

    results = [
        json.load(open(f"{out_prefix}.{pid}.json")) for pid in (0, 1)
    ]
    # both processes observe the same (replicated) metrics and params
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"], rtol=1e-6)
    assert results[0]["checksum"] == pytest.approx(results[1]["checksum"], rel=1e-6)

    # and the 2-process run equals the single-process run on the same
    # global batch (the VERDICT round-1 done-condition for multi-host)
    ref = single_process_reference
    np.testing.assert_allclose(results[0]["losses"], ref["losses"], rtol=2e-4)
    np.testing.assert_allclose(results[0]["psnrs"], ref["psnrs"], rtol=2e-4)
    assert results[0]["checksum"] == pytest.approx(ref["checksum"], rel=1e-4)


def test_process_local_slice_partitions():
    # single-process: identity slice
    assert process_local_slice(16) == slice(0, 16)


def test_maybe_initialize_distributed_env_parsing(monkeypatch):
    calls = {}

    def fake_init(coordinator_address, num_processes, process_id):
        calls.update(
            addr=coordinator_address, n=num_processes, pid=process_id
        )

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert maybe_initialize_distributed() is False
    assert not calls

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    assert maybe_initialize_distributed() is True
    assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 3}
