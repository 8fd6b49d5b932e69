"""Small utilities from the reference surface."""

from __future__ import annotations

import os
from typing import List


def enable_compilation_cache(cache_dir: str = ".jax_cache") -> None:
    """Persistent XLA compilation cache — repeat CLI/bench invocations skip
    the (tens of seconds to minutes) compile step entirely."""
    import jax

    try:
        path = os.path.abspath(cache_dir)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache


def split_channels(num_channels: int, num_splits: int = 6) -> List[int]:
    """Even channel split with remainder spread over the first groups
    (reference utils.py:270-278; unused by the paper config but part of the
    public surface)."""
    base = num_channels // num_splits
    remain = num_channels % num_splits
    sizes = [base] * num_splits
    for i in range(remain):
        sizes[i] += 1
    return sizes
