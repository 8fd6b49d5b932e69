"""Small utilities from the reference surface."""

from __future__ import annotations

from typing import List


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
