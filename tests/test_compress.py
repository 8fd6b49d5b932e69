"""M4 tests: pruning, Huffman coding (python + native), BPP, full pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from repnerv_tpu.compress.huffman import (
    HuffmanCodec,
    bits_per_pixel,
    entropy_stats,
)
from repnerv_tpu.compress.prune import (
    apply_masks,
    global_l1_masks,
    sparsity_report,
    verify_ratio,
)
from repnerv_tpu.compress.pipeline import CompressionReport, compress, prune_params
from repnerv_tpu.models.generator import apply_generator, init_generator
from repnerv_tpu.models.embedding import positional_encoding

from test_model_train import make_store, tiny_model, tiny_train


# ---------------------------------------------------------------------------
# Pruning (main_eval.py:211-648)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("branch_type", ["NeRV_vanilla", "ERB"])
def test_global_l1_prune_ratio(branch_type):
    cfg = tiny_model(branch_type=branch_type)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    masks, actual = global_l1_masks(params, branch_type, 0.3)
    assert verify_ratio(actual, 0.3), actual
    rep = sparsity_report(params, masks)
    assert rep["ratio"] == pytest.approx(actual)
    pruned = apply_masks(params, masks)
    # pruned weights are exactly zero; biases untouched
    w = np.asarray(pruned["blocks"][0][list(k for k in pruned["blocks"][0] if k != "norm")[0]]["w"])
    assert (w == 0).any()
    for layer, orig in zip(pruned["stem"], params["stem"]):
        if "b" in layer:
            np.testing.assert_array_equal(np.asarray(layer["b"]), np.asarray(orig["b"]))


def test_prune_threshold_is_global():
    """A tensor of tiny weights should be pruned away entirely before a
    tensor of large weights loses anything (global, not per-tensor)."""
    params = {
        "stem": [{"w": jnp.full((4, 4), 1e-6), "b": jnp.zeros(4)}],
        "blocks": [{"branch": {"w": jnp.full((3, 3, 2, 2), 1.0), "b": jnp.zeros(2)}, "norm": {}}],
        "heads": [None],
    }
    masks, actual = global_l1_masks(params, "NeRV_vanilla", 16 / (16 + 36))
    pruned = apply_masks(params, masks)
    assert np.all(np.asarray(pruned["stem"][0]["w"]) == 0)
    assert np.all(np.asarray(pruned["blocks"][0]["branch"]["w"]) == 1.0)


def test_deploy_state_prunes_rbr_reparam():
    from repnerv_tpu.models.generator import generator_to_deploy

    cfg = tiny_model(branch_type="ERB")
    params = init_generator(jax.random.PRNGKey(1), cfg)
    dep, _ = generator_to_deploy(params, cfg)
    masks, actual = global_l1_masks(dep, "ERB", 0.25)
    assert verify_ratio(actual, 0.25)
    # the mask must target rbr_reparam
    assert masks["blocks"][0]["rbr_reparam"]["w"] is not None


def test_prune_zero_and_full():
    cfg = tiny_model()
    params = init_generator(jax.random.PRNGKey(0), cfg)
    masks, actual = global_l1_masks(params, "NeRV_vanilla", 0.0)
    assert actual == 0.0
    masks, actual = global_l1_masks(params, "NeRV_vanilla", 1.0)
    assert actual == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Huffman (replaces dahuffman; main_eval.py:673-698)
# ---------------------------------------------------------------------------


def test_huffman_table_and_bits():
    data = [0.0] * 50 + [1.0] * 30 + [2.0] * 15 + [3.0] * 5
    codec = HuffmanCodec.from_data(data)
    table = codec.get_code_table()
    assert len(table) == 4
    # most frequent symbol gets the shortest code
    lens = {s: l for s, (l, _) in table.items()}
    assert lens[0.0] <= lens[1.0] <= lens[2.0] <= lens[3.0]
    from collections import Counter

    total = codec.total_bits(Counter(data))
    # optimal for these freqs: 50*1 + 30*2 + 15*3 + 5*3 = 170
    assert total == 170


def test_huffman_roundtrip_python_and_native():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 17, size=5000).astype(np.float64).tolist()
    codec = HuffmanCodec.from_data(data)
    import repnerv_tpu.compress.native as native_mod

    blob, nbits = codec.encode(data)
    assert len(blob) == (nbits + 7) // 8
    decoded = codec.decode(blob, len(data))
    assert decoded == data
    # force the pure-python path and compare bitstreams
    lib, tried = native_mod._LIB, native_mod._TRIED
    native_mod._LIB, native_mod._TRIED = None, True
    try:
        blob_py, nbits_py = codec.encode(data)
        decoded_py = codec.decode(blob_py, len(data))
    finally:
        native_mod._LIB, native_mod._TRIED = lib, tried
    assert blob_py == blob and nbits_py == nbits
    assert decoded_py == data


def test_native_backend_builds():
    from repnerv_tpu.compress.native import native_available

    assert native_available(), "C++ huffman backend failed to build"


def test_entropy_stats_and_bpp():
    data = [1.0] * 8 + [2.0] * 8
    stats = entropy_stats(data, quant_bit=8)
    assert stats["avg_bits"] == 1.0
    assert stats["efficiency"] == 1.0 / 8
    assert stats["total_bits"] == 16
    assert bits_per_pixel(stats["total_bits"], 2, 2, 2) == 2.0
    assert bits_per_pixel(100, 0, 2, 2) == 0.0


def test_huffman_single_symbol():
    codec = HuffmanCodec.from_data([5.0, 5.0, 5.0])
    blob, nbits = codec.encode([5.0] * 3)
    assert nbits == 3
    assert codec.decode(blob, 3) == [5.0] * 3


# ---------------------------------------------------------------------------
# Full pipeline (PATH A / PATH B parity)
# ---------------------------------------------------------------------------


def test_pipeline_path_b_no_finetune():
    """prune -> deploy -> quantize, no finetune (main_eval.py:551-729)."""
    cfg = tiny_train(model=tiny_model(branch_type="ERB"))
    import dataclasses

    cfg = dataclasses.replace(cfg, prune_ratio=0.2, quant_bit=8, finetune=False)
    store = make_store(cfg)
    params = init_generator(jax.random.PRNGKey(0), cfg.model)
    out_params, report = compress(params, cfg, store)
    assert report.prune_ok
    assert report.quant_bit == 8
    assert report.bpp > 0
    assert 0 < report.efficiency <= 1.0
    # result must be deploy-form and runnable
    assert "rbr_reparam" in out_params["blocks"][0]
    emb = positional_encoding(jnp.asarray([0.5]), cfg.model.embed)
    import dataclasses as dc

    dep_cfg = dc.replace(cfg.model, deploy=True)
    out = apply_generator(out_params, emb, dep_cfg)[0]
    assert np.isfinite(np.asarray(out)).all()


def test_pipeline_path_a_finetune_recovers_psnr():
    """prune -> masked finetune -> deploy -> quantize (main_eval.py:214-545).
    Finetuning must keep pruned weights at exactly zero (the quantizer's
    zero-skip depends on it) and improve quality over no-finetune."""
    import dataclasses as dc

    from repnerv_tpu.ops.metrics import psnr_fn
    from repnerv_tpu.data.frames import adaptive_avg_pool
    from repnerv_tpu.train.loop import init_train_state, make_train_step, run_epoch

    cfg = tiny_train(model=tiny_model(branch_type="ERB"), epochs=30, lr=1e-2)
    store = make_store(cfg)
    # quick pre-train so pruning has something to destroy
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, steps_per_epoch=2, with_msssim=False)
    for epoch in range(cfg.epochs):
        state, _ = run_epoch(state, step, store, cfg, epoch)

    def val_psnr(params, mcfg):
        rows = store.sample_indices()
        emb = positional_encoding(jnp.asarray(store.t[rows]), mcfg.embed)
        outs = apply_generator(params, emb, mcfg, train=False)
        frames = store.gather(rows)
        tgts = [adaptive_avg_pool(frames, o.shape[1:3]) for o in outs]
        return float(np.asarray(psnr_fn(outs, tgts))[0, -1])

    base = val_psnr(state.params, cfg.model)

    heavy = dc.replace(cfg, prune_ratio=0.5, quant_bit=-1, finetune=False)
    pruned_params, rep0 = compress(state.params, heavy, store)
    dep_cfg = dc.replace(cfg.model, deploy=True)
    pruned_psnr = val_psnr(pruned_params, dep_cfg)

    ft = dc.replace(cfg, prune_ratio=0.5, quant_bit=-1, finetune=True, finetune_epochs=10)
    ft_params, rep1 = compress(state.params, ft, store)
    ft_psnr = val_psnr(ft_params, dep_cfg)

    assert rep1.finetune_epochs == 10
    assert ft_psnr > pruned_psnr, (base, pruned_psnr, ft_psnr)


def test_finetune_keeps_masked_weights_zero():
    import dataclasses as dc

    cfg = tiny_train(model=tiny_model(branch_type="NeRV_vanilla"), epochs=5)
    cfg = dc.replace(cfg, prune_ratio=0.4, finetune=True, finetune_epochs=3)
    store = make_store(cfg)
    params = init_generator(jax.random.PRNGKey(0), cfg.model)
    report = CompressionReport()
    pruned, masks = prune_params(params, cfg, report)
    from repnerv_tpu.compress.pipeline import finetune

    tuned = finetune(pruned, masks, cfg, store, report)
    m = masks["blocks"][0]["branch"]["w"]
    w = np.asarray(tuned["blocks"][0]["branch"]["w"])
    assert np.all(w[np.asarray(m) == 0] == 0.0)
    # unmasked weights did move
    assert not np.allclose(
        w[np.asarray(m) == 1],
        np.asarray(pruned["blocks"][0]["branch"]["w"])[np.asarray(m) == 1],
    )


def test_pipeline_rans_codec_smaller_bpp():
    """--codec rans: same pipeline, fractional-bit entropy coding -> BPP
    strictly below Huffman's on the same quantized weights."""
    import dataclasses

    cfg = tiny_train(model=tiny_model(branch_type="ERB"))
    cfg = dataclasses.replace(cfg, prune_ratio=0.2, quant_bit=8, finetune=False)
    store = make_store(cfg)
    params = init_generator(jax.random.PRNGKey(0), cfg.model)
    _, rep_huff = compress(params, cfg, store)
    _, rep_rans = compress(
        params, dataclasses.replace(cfg, codec="rans"), store
    )
    assert 0 < rep_rans.bpp < rep_huff.bpp
    assert rep_rans.efficiency < rep_huff.efficiency


# ---------------------------------------------------------------------------
# Bitstream artifact (compress/bitstream.py) — save -> load -> bit-exact
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("codec", ["huffman", "rans"])
@pytest.mark.parametrize("branch_type", ["NeRV_vanilla", "ERB"])
def test_bitstream_roundtrip_bit_exact(tmp_path, codec, branch_type):
    """save_bitstream -> read_bitstream reproduces the pipeline's dequantized
    params BIT-exactly (incl. pruned zeros whose codes decode from QuantParams
    alone), and the file size stays within the symbol-bits + measured
    metadata budget (VERDICT r2 next-step #4)."""
    import dataclasses

    from repnerv_tpu.compress.bitstream import (
        all_in_bpp,
        read_bitstream,
        write_bitstream,
    )

    mcfg = tiny_model(branch_type=branch_type)
    cfg = tiny_train(model=mcfg, prune_ratio=0.3, quant_bit=6, codec=codec)
    params = init_generator(jax.random.PRNGKey(2), mcfg)
    store = make_store(cfg)

    path = str(tmp_path / "model.rnvb")
    out_params, report = compress(params, cfg, store, bitstream_path=path)
    acct = report.extras["bitstream"]
    assert acct["file_bytes"] > 0

    loaded, loaded_cfg, header = read_bitstream(path)
    # the artifact records the DEPLOY config for reparam branches
    assert loaded_cfg.deploy == (branch_type != "NeRV_vanilla")
    flat_a = jax.tree.leaves(out_params)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # size accounting: file = 16B magic/lens + header + qparams + bitmaps
    # + ceil(payload_bits/8)
    expected = (
        acct["header_bytes"]
        + acct["qparams_bytes"]
        + acct["bitmap_bytes"]
        + int(np.ceil(acct["payload_bits"] / 8))
    )
    assert acct["file_bytes"] == expected
    # symbol-only bits agree with the pipeline's Huffman estimate for the
    # huffman codec (rans measures real fractional-bit output <= huffman's)
    if codec == "huffman":
        assert acct["payload_bits"] == report.total_bits
    else:
        assert acct["payload_bits"] <= report.total_bits * 1.02
    bpp = all_in_bpp(acct["file_bytes"], store.frames.shape[0], *store.hw)
    assert bpp > report.bpp  # honest BPP includes the metadata


def test_bitstream_decode_matches_quality(tmp_path):
    """Decoding the artifact and running the generator yields the SAME frames
    as the pipeline's in-memory dequantized params (save -> load -> same
    PSNR, by bit-identical weights)."""
    mcfg = tiny_model(branch_type="ERB")
    cfg = tiny_train(model=mcfg, prune_ratio=0.5, quant_bit=8)
    params = init_generator(jax.random.PRNGKey(3), mcfg)
    store = make_store(cfg)
    path = str(tmp_path / "model.rnvb")
    out_params, _ = compress(params, cfg, store, bitstream_path=path)

    from repnerv_tpu.compress.bitstream import read_bitstream

    loaded, loaded_cfg, _ = read_bitstream(path)
    emb = positional_encoding(jnp.asarray(store.t[:2]), mcfg.embed)
    import dataclasses

    dcfg = dataclasses.replace(mcfg, deploy=True, use_pallas_decode=False)
    a = apply_generator(out_params, emb, dcfg, train=False)[-1]
    b = apply_generator(loaded, emb, dcfg, train=False)[-1]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_decode_cli_standalone(tmp_path):
    """decode_main serves an .rnvb with NO checkpoint/flags: dump mode writes
    pred PNGs matching the generator's frames to 8-bit rounding; throughput
    mode reports finite fps.  PATH-A-style train-state artifacts fuse to the
    deploy graph inside the CLI."""
    import dataclasses

    from PIL import Image

    from repnerv_tpu.cli.decode_main import main
    from repnerv_tpu.compress.bitstream import write_bitstream

    mcfg = tiny_model(branch_type="ERB")
    params = init_generator(jax.random.PRNGKey(4), mcfg)
    path = str(tmp_path / "model.rnvb")
    write_bitstream(path, params, mcfg, quant_bit=8)  # train-state artifact

    out_dir = str(tmp_path / "frames")
    n = 3
    r = main([path, "--frames", str(n), "--out", out_dir])
    assert r["frames"] == n
    files = sorted(f for f in __import__("os").listdir(out_dir))
    assert files == [f"pred_{i}.png" for i in range(n)]

    # PNGs match a direct decode of the dequantized deploy params
    from repnerv_tpu.compress.bitstream import read_bitstream
    from repnerv_tpu.models.generator import generator_to_deploy

    loaded, lcfg, _ = read_bitstream(path)
    dparams, dcfg = generator_to_deploy(loaded, lcfg)
    t = jnp.arange(n, dtype=jnp.float32) / n
    emb = positional_encoding(t, dcfg.embed)
    ref = np.clip(
        np.asarray(apply_generator(dparams, emb, dcfg, train=False)[-1]) * 255,
        0, 255,
    )
    for i in range(n):
        got = np.asarray(Image.open(f"{out_dir}/pred_{i}.png"), np.float64)
        np.testing.assert_allclose(got, ref[i], atol=1.0)

    r2 = main([path, "--frames", "4"])
    assert np.isfinite(r2["fps"]) and r2["fps"] > 0


def test_huffman_encode_rejects_unknown_symbols():
    """encode() must raise on symbols absent from the codec table — the
    searchsorted fast path silently mapped them to a neighboring symbol
    (corrupt bitstream that decodes without error; code-review r3)."""
    codec = HuffmanCodec.from_frequencies({1.0: 3, 2.0: 2, 4.0: 1})
    blob, _ = codec.encode(np.asarray([1.0, 2.0, 4.0]))  # in-table ok
    assert blob
    with pytest.raises(KeyError):
        codec.encode(np.asarray([1.0, 3.0, 4.0]))  # 3.0 not in table
    with pytest.raises(KeyError):
        codec.encode(np.asarray([5.0]))  # above the table's range
