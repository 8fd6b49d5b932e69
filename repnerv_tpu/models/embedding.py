"""Frame-index positional encoding.

Semantics match the reference ``PositionalEncoding`` (utils.py:110-129):
``PE(t)[2i] = sin(t * base**i * pi)``, ``PE(t)[2i+1] = cos(...)`` for
``i < levels`` (interleaved sin/cos via stack on axis 1), or the raw scalar
for spec ``'none'``.  Implemented as a pure jit-safe function — the per-level
Python loop of the reference becomes a single vectorized outer product.
"""

from __future__ import annotations

import math
from functools import partial

import jax.numpy as jnp


def embed_length(pe_spec: str) -> int:
    if pe_spec.lower() == "none":
        return 1
    _, levels = pe_spec.split("_")
    return 2 * int(levels)


def parse_pe_spec(pe_spec: str):
    """Return (base, levels) or None for 'none'."""
    if pe_spec.lower() == "none":
        return None
    base, levels = pe_spec.split("_")
    return float(base), int(levels)


def positional_encoding(t: jnp.ndarray, pe_spec: str, dtype=jnp.float32) -> jnp.ndarray:
    """Encode normalized frame indices ``t`` of shape [B] to [B, embed_length].

    The reference computes this on CPU per batch (main_train.py:234); here it
    is a traced fn that fuses into the jitted train step.
    """
    t = jnp.asarray(t, dtype=jnp.float32)
    if t.ndim == 0:
        t = t[None]
    spec = parse_pe_spec(pe_spec)
    if spec is None:
        return t[:, None].astype(dtype)
    base, levels = spec
    # Match the reference's float32 rounding order exactly:
    # temp = (pos * base**i) * pi with each product rounded to f32
    # (utils.py:127).  At level 39 the phase is ~2.3e4, so the rounding
    # order is observable in the sin/cos outputs.
    bases = jnp.asarray([base**i for i in range(levels)], dtype=jnp.float32)
    phase = (t[:, None] * bases[None, :]) * jnp.float32(math.pi)  # [B, levels]
    sin = jnp.sin(phase)
    cos = jnp.cos(phase)
    # interleave: [sin0, cos0, sin1, cos1, ...] == torch.stack(pe_list, 1)
    out = jnp.stack([sin, cos], axis=-1).reshape(t.shape[0], 2 * levels)
    return out.astype(dtype)


def transformer_positional_table(d_model: int, max_len: int) -> jnp.ndarray:
    """Sinusoidal table of ``PositionalEncodingTrans`` (utils.py:280-294).

    Unused by the paper config but part of the reference surface.
    """
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


def transformer_positional_encoding(t: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    max_len = table.shape[0]
    index = jnp.round(t * max_len).astype(jnp.int32)
    return table[index]
