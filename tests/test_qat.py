"""Quantization-aware finetuning (compress/qat.py).

The fake quantizer must be the in-graph mirror of the host-side
``quantize_state`` sweep (reference semantics: utils.py:27-61 quantizer,
main_eval.py:652-669 per-axis grouping over OIHW/[out,in] layouts), with a
straight-through gradient; the pipeline integration must deploy reparam
branches BEFORE the finetune so the adapted tensors are the ones the final
quantizer sees."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from repnerv_tpu.compress.pipeline import compress
from repnerv_tpu.compress.prune import apply_masks, global_l1_masks
from repnerv_tpu.compress.qat import fake_quant_leaf, make_fake_quant
from repnerv_tpu.compress.quantize import quantize_state
from repnerv_tpu.models.embedding import positional_encoding
from repnerv_tpu.models.generator import apply_generator, init_generator
from repnerv_tpu.train.checkpoint import (
    params_to_torch_state,
    torch_state_to_params,
)

from test_model_train import make_store, tiny_model, tiny_train


@pytest.mark.parametrize("ref_axis", [0, 1])
@pytest.mark.parametrize("deploy", [False, True])
def test_fake_quant_matches_quantize_state(ref_axis, deploy):
    """make_fake_quant == the host-side quantize_state dequant, leaf for
    leaf, through the torch-layout bridge — incl. pruned zeros (which must
    fake-quantize to dequant(code_of_zero), exactly what the deployed
    artifact decodes them to)."""
    mcfg = tiny_model(branch_type="ERB")
    params = init_generator(jax.random.PRNGKey(0), mcfg)
    if deploy:
        from repnerv_tpu.models.generator import generator_to_deploy

        params, mcfg = generator_to_deploy(params, mcfg)
    masks, _ = global_l1_masks(params, "ERB", 0.3)
    params = apply_masks(params, masks)

    bit = 6
    fq = make_fake_quant(bit, ref_axis)(params)

    state = params_to_torch_state(params, mcfg)
    dequant, _, _, _ = quantize_state(state, bit, ref_axis)
    expected = torch_state_to_params(dequant, mcfg)

    la = jax.tree.leaves_with_path(fq)
    lb = jax.tree.leaves(expected)
    assert len(la) == len(lb)
    for (path, a), b in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=0,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fake_quant_gradient_is_straight_through():
    w = jnp.asarray(np.random.default_rng(1).standard_normal((3, 4, 2, 8)),
                    jnp.float32)
    g = jax.grad(lambda t: jnp.sum(fake_quant_leaf(t, 4, 3)))(w)
    np.testing.assert_array_equal(np.asarray(g), np.ones_like(w))


def test_fake_quant_all_zero_slice():
    """A fully-pruned output channel must not produce NaN/inf stats."""
    w = np.random.default_rng(2).standard_normal((3, 3, 4, 4)).astype(np.float32)
    w[..., 1] = 0.0
    out = np.asarray(fake_quant_leaf(jnp.asarray(w), 8, 3))
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[..., 1], 0.0)


def _train_tiny(cfg, store, epochs):
    from repnerv_tpu.train.loop import (
        init_train_state,
        make_epoch_fn,
        run_fused_epoch,
    )

    steps = max(store.num_samples // cfg.data.batch_size, 1)
    epoch_fn = make_epoch_fn(cfg, steps, with_msssim=False)
    state = init_train_state(jax.random.PRNGKey(5), cfg)
    for epoch in range(epochs):
        state, m = run_fused_epoch(state, epoch_fn, store, cfg, epoch)
    return jax.tree.map(np.asarray, state.params), m


def _psnr(params, mcfg, store):
    frames = jnp.asarray(np.asarray(store.frames), jnp.float32) / 255.0
    emb = positional_encoding(jnp.asarray(store.t), mcfg.embed)
    out = apply_generator(params, emb, mcfg, train=False)[-1]
    mse = jnp.mean((out - frames) ** 2)
    return float(10 * jnp.log10(1.0 / mse))


def test_qat_pipeline_recovers_quantization_loss():
    """PATH A vs PATH A + --qat at a coarse 3-bit grid.  The QAT claim is
    that the final QUANTIZATION STEP becomes (near-)lossless because the
    finetune already trained on the grid: the pre->post-quantize PSNR drop
    must shrink by a large factor, and the post-quantize quality must not
    regress.  (Measured on this config: drop 0.139 -> 0.007 dB; on trained
    full-size models the absolute post-quantize win follows.)"""
    from repnerv_tpu.compress.pipeline import (
        CompressionReport,
        finetune,
        prune_params,
        quantize_params,
    )

    mcfg = tiny_model(branch_type="NeRV_vanilla")
    cfg = tiny_train(model=mcfg, epochs=40)
    store = make_store(cfg)
    params, _ = _train_tiny(cfg, store, cfg.epochs)

    results = {}
    for qat in (False, True):
        base = dataclasses.replace(
            cfg, prune_ratio=0.2, quant_bit=3, finetune=True,
            finetune_epochs=15, finetune_qat=qat,
        )
        report = CompressionReport()
        p, masks = prune_params(jax.tree.map(jnp.asarray, params), base, report)
        ft = finetune(p, masks, base, store, report)
        pre = _psnr(ft, mcfg, store)
        q = quantize_params(
            ft, base, report, frame_hw=store.hw,
            n_frames=store.frames.shape[0],
        )
        results[qat] = (pre, _psnr(q, mcfg, store))

    drop_plain = results[False][0] - results[False][1]
    drop_qat = results[True][0] - results[True][1]
    assert drop_qat < 0.5 * drop_plain, (drop_qat, drop_plain)
    assert results[True][1] >= results[False][1] - 0.02, results


def test_qat_deploys_reparam_before_finetune():
    """For reparam branches the QAT pipeline fuses to deploy FIRST (the
    quantizer sees rbr_reparam tensors), and still returns deploy-form
    params; without qat the deploy happens after the finetune as before."""
    mcfg = tiny_model(branch_type="ERB")
    cfg = tiny_train(model=mcfg, epochs=4)
    store = make_store(cfg)
    params = init_generator(jax.random.PRNGKey(7), mcfg)

    qcfg = dataclasses.replace(
        cfg, prune_ratio=0.5, quant_bit=8, finetune=True,
        finetune_epochs=2, finetune_qat=True,
    )
    out, report = compress(jax.tree.map(jnp.asarray, params), qcfg, store)
    assert report.extras.get("qat") is True
    assert all("rbr_reparam" in b for b in out["blocks"])
    # QAT without pruning is also valid (prune gate relaxed)
    q2 = dataclasses.replace(qcfg, prune_ratio=1.0)
    out2, r2 = compress(jax.tree.map(jnp.asarray, params), q2, store)
    assert r2.finetune_epochs == 2 and r2.extras.get("qat") is True


def test_finetune_fused_epoch_matches_per_step():
    """finetune() under the whole-epoch scan (one dispatch/epoch, the
    trainer's dispatch-overhead win now applied to PATH A/QAT) equals the
    per-step path leaf-for-leaf — same shuffle seeds, same masks, same
    fake-quant transform."""
    from repnerv_tpu.compress.pipeline import (
        CompressionReport,
        finetune,
        prune_params,
    )

    mcfg = tiny_model(branch_type="NeRV_vanilla")
    cfg = tiny_train(model=mcfg, epochs=8)
    store = make_store(cfg)
    params = init_generator(jax.random.PRNGKey(3), mcfg)

    outs = {}
    for fused in (True, False):
        base = dataclasses.replace(
            cfg, prune_ratio=0.3, quant_bit=4, finetune=True,
            finetune_epochs=3, finetune_qat=True, fused_epoch=fused,
        )
        report = CompressionReport()
        p, masks = prune_params(jax.tree.map(jnp.asarray, params), base, report)
        outs[fused] = finetune(p, masks, base, store, report)
    for a, b in zip(jax.tree.leaves(outs[True]), jax.tree.leaves(outs[False])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_qat_args_mapping():
    from repnerv_tpu.cli.args import args_to_config, build_parser

    p = build_parser(eval_mode=True)
    a = p.parse_args(
        ["--dataset", "synth", "--quant_bit", "8", "--finetune", "--qat"]
    )
    cfg = args_to_config(a)
    assert cfg.finetune_qat and cfg.finetune and cfg.quant_bit == 8
