"""rANS codec (compress/rans.py + native/rans.cpp) — round-trip, backend
bitstream equality, and the coding-efficiency claim vs Huffman."""

import os

import numpy as np
import pytest

from repnerv_tpu.compress import native as nat
from repnerv_tpu.compress.huffman import entropy_stats
from repnerv_tpu.compress.rans import (
    RansCodec,
    entropy_stats_rans,
    quantize_freqs,
)


def _gaussian_codes(n=20000, levels=256, seed=0):
    """Quantized-weight-like symbol stream: discretized gaussian."""
    rng = np.random.default_rng(seed)
    v = np.clip(np.round(rng.normal(levels / 2, levels / 10, n)), 0, levels - 1)
    return v.astype(np.float64).tolist()


def test_quantize_freqs_sums_to_scale():
    syms, f = quantize_freqs({1.0: 5, 2.0: 90000, 3.0: 1}, 12)
    assert syms == [1.0, 2.0, 3.0]
    assert f.sum() == 1 << 12
    assert (f >= 1).all()


def test_roundtrip_native():
    codes = _gaussian_codes()
    codec = RansCodec.from_data(codes)
    blob, nbits = codec.encode(codes)
    assert nbits == len(blob) * 8
    out = codec.decode(blob, len(codes))
    assert out == codes


def test_roundtrip_python_fallback(monkeypatch):
    monkeypatch.setattr(nat, "_RANS_LIB", None)
    monkeypatch.setattr(nat, "_RANS_TRIED", True)
    codes = _gaussian_codes(n=3000, seed=1)
    codec = RansCodec.from_data(codes)
    blob, _ = codec.encode(codes)
    assert codec.decode(blob, len(codes)) == codes


def test_backends_produce_identical_bitstream(monkeypatch):
    if not nat.native_available() or os.environ.get("REPNERV_NO_NATIVE"):
        pytest.skip("no native toolchain")
    codes = _gaussian_codes(n=5000, seed=2)
    codec = RansCodec.from_data(codes)
    blob_native, _ = codec.encode(codes)
    idx = np.asarray([codec._index[v] for v in codes], np.int32)
    blob_py = codec._encode_py(idx)
    assert blob_native == blob_py
    # and the python decoder reads the native stream
    slot2sym = np.repeat(
        np.arange(len(codec.syms), dtype=np.int32), codec.freq.astype(np.int64)
    )
    assert codec._decode_py(blob_native, slot2sym, len(codes)) == [
        codec._index[v] for v in codes
    ]


def test_rans_beats_huffman_on_weight_like_histograms():
    codes = _gaussian_codes(n=50000, seed=3)
    h = entropy_stats(codes, 8)
    r = entropy_stats_rans(codes, 8)
    # entropy lower bound
    vals, counts = np.unique(np.asarray(codes), return_counts=True)
    p = counts / counts.sum()
    entropy = float(-(p * np.log2(p)).sum())
    assert r["avg_bits"] < h["avg_bits"]
    assert r["avg_bits"] < entropy * 1.02 + 0.01  # within ~2% of entropy
    assert r["avg_bits"] > entropy - 1e-6  # no free lunch


def test_degenerate_single_symbol():
    codes = [7.0] * 100
    codec = RansCodec.from_data(codes)
    blob, _ = codec.encode(codes)
    assert codec.decode(blob, 100) == codes
