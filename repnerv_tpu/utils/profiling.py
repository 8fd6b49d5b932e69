"""Tracing / profiling — the TPU-native upgrade of the reference's timing.

The reference only has ``datetime.now()`` deltas and CUDA-synchronized FPS
loops (SURVEY.md §5.1; main_train.py:225,284-287,396-405).  Here:

* :func:`trace` captures a real JAX profiler trace (TensorBoard-viewable,
  includes XLA op timelines) around any code block;
* :class:`StepTimer` gives forced-completion wall timing — it fetches a
  tiny ride-along scalar so asynchronous dispatch (and tunneled backends
  whose ``block_until_ready`` returns early) can't fake the numbers;
* :func:`device_memory_stats` snapshots live HBM usage.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace into ``log_dir`` (TensorBoard format)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with forced completion.

    Usage::

        timer = StepTimer()
        with timer.measure():
            state, aux = step(...)
            timer.sync(aux["loss"])   # fetches a scalar -> real completion
        print(timer.best_ms, timer.mean_ms)
    """

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    @contextlib.contextmanager
    def measure(self):
        self._t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - self._t0)

    @staticmethod
    def sync(x) -> float:
        """Force completion by fetching a scalar reduction to the host."""
        if hasattr(x, "ndim") and getattr(x, "ndim", 0) > 0:
            x = jnp.sum(x)
        return float(x)

    @property
    def best_ms(self) -> float:
        return min(self.times) * 1e3 if self.times else float("nan")

    @property
    def mean_ms(self) -> float:
        return sum(self.times) / len(self.times) * 1e3 if self.times else float("nan")


def device_memory_stats() -> Dict[str, float]:
    """Live/peak HBM bytes for device 0 (empty dict when unsupported)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {
            "bytes_in_use": float(stats.get("bytes_in_use", 0)),
            "peak_bytes_in_use": float(stats.get("peak_bytes_in_use", 0)),
            "bytes_limit": float(stats.get("bytes_limit", 0)),
        }
    except Exception:
        return {}
