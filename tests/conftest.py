"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise real meshes without TPU hardware.

NOTE: on this image a sitecustomize imports jax at interpreter start, so
JAX_PLATFORMS set via os.environ here is too late (jax's config captured the
env at import).  ``jax.config.update`` works until the first backend
initialization, which is what we rely on.  XLA_FLAGS is read by the CPU
client at creation time, so the env assignment below still takes effect.
"""

import os

# 1-core box: torch's OpenMP pool and XLA's thread pool deadlock when both
# spin; pinning to one thread avoids torch-then-jax conv hangs
os.environ.setdefault("OMP_NUM_THREADS", "1")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU platform, got "
    + jax.devices()[0].platform
)
