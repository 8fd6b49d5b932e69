"""Child process for the 2-process multi-host simulation test.

Spawned twice by tests/test_multihost.py with
``XLA_FLAGS=--xla_force_host_platform_device_count=4``:
each process contributes 4 virtual CPU devices to a global 8-device
"data" mesh (Gloo collectives between processes — the CPU stand-in for
DCN).  Trains the tiny config for 3 epochs through the exact library
path (run_epoch -> make_sharded_train_step -> shard_batch with
``jax.make_array_from_process_local_data``) and writes the loss/PSNR
trajectory + a param checksum for the parent to compare.

usage: python _multihost_child.py PORT PROCESS_ID OUT_PREFIX
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

port, pid, out_prefix = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2
assert len(jax.devices()) == 8, len(jax.devices())

import jax.numpy as jnp  # noqa: E402

from repnerv_tpu.config import DataConfig, ModelConfig, TrainConfig  # noqa: E402
from repnerv_tpu.data.frames import FrameStore, synthetic_video  # noqa: E402
from repnerv_tpu.parallel.sharding import (  # noqa: E402
    make_mesh,
    make_sharded_train_state,
    make_sharded_train_step,
)
from repnerv_tpu.train.loop import run_epoch  # noqa: E402

# MUST mirror the config in tests/test_multihost.py
cfg = TrainConfig(
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

# full video on every host (uint8, host-resident); each process only
# gathers/uploads its process_local_slice of every global batch
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
    sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in jax.tree.leaves(state.params))
)
with open(f"{out_prefix}.{pid}.json", "w") as f:
    json.dump({"losses": losses, "psnrs": psnrs, "checksum": checksum}, f)
print(f"proc {pid} done", flush=True)
