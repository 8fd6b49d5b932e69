"""Post-training linear quantization — nonzero-aware, per-tensor or per-axis.

Parity target: ``quantize_per_tensor`` (reference utils.py:11-67) and the
state-dict sweep in main_eval.py:652-669:

* min/max statistics are taken over *non-zero* elements only (so pruned zeros
  do not widen the range);
* ``scale = (max - min) / 2**bit``; ``q = round((t - min) / (scale + 1e-19))``;
* 2D/4D weight tensors quantize per-axis (``quant_axis`` 0 or 1); everything
  else (biases, scalars) per-tensor (axis=-1);
* the dequantized values are written back for quality evaluation.

Data-dependent boolean masking keeps this OUT of jit (SURVEY.md §7 "hard
parts") — it runs host-side on numpy at compression time, never in the
compiled train/decode path.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def quantize_per_tensor(
    t: np.ndarray, bit: int = 8, axis: int = -1
) -> Tuple[np.ndarray, np.ndarray]:
    """Return (integer codes, dequantized array).  axis=-1: global; 0/1: per-slice."""
    t = np.asarray(t, dtype=np.float32)
    if axis == -1:
        valid = t != 0
        if valid.any():
            t_min = t[valid].min()
            t_max = t[valid].max()
        else:
            t_min = np.float32(0.0)
            t_max = np.float32(0.0)
        scale = (t_max - t_min) / 2**bit
        tmin_b, scale_b = t_min, scale
    elif axis in (0, 1):
        n = t.shape[axis]
        mins = np.zeros(n, np.float32)
        maxs = np.zeros(n, np.float32)
        for i in range(n):
            sl = np.take(t, i, axis=axis)
            valid = sl != 0
            if valid.any():
                mins[i] = sl[valid].min()
                maxs[i] = sl[valid].max()
        scale = (maxs - mins) / 2**bit
        shape = [1] * t.ndim
        shape[axis] = n
        tmin_b = mins.reshape(shape)
        scale_b = scale.reshape(shape)
    else:
        raise ValueError(f"unsupported quant axis {axis}")

    quant = np.round((t - tmin_b) / (scale_b + 1e-19))
    dequant = tmin_b + scale_b * quant
    return quant, dequant.astype(np.float32)


def quantize_state(
    flat_params: Dict[str, np.ndarray],
    bit: int,
    axis: int = 0,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray], List[np.ndarray]]:
    """Quantize every tensor of a flattened param dict.

    Mirrors main_eval.py:657-669: tensors with ndim in {2, 4} whose key is not
    a bias quantize along ``axis``; the rest per-tensor.  Returns
    (dequantized params, integer codes, list of nonzero code vectors for
    entropy-coding statistics).
    """
    dequant: Dict[str, np.ndarray] = {}
    codes: Dict[str, np.ndarray] = {}
    nonzero_codes: List[np.ndarray] = []
    for k, v in flat_params.items():
        v = np.asarray(v)
        large = v.ndim in (2, 4) and "b" != k.rsplit("/", 1)[-1] and "bias" not in k
        q, dq = quantize_per_tensor(v, bit, axis if large else -1)
        codes[k] = q
        dequant[k] = dq
        nonzero_codes.append(q[np.asarray(v) != 0].flatten())
    return dequant, codes, nonzero_codes
