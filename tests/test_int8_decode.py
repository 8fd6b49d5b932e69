"""int8 fused decode kernel (pallas_kernels/decode_int8.py) — interpret-mode
exactness vs an emulated integer reference, plus the calibrated end-to-end
generator path."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import repnerv_tpu.pallas_kernels.decode_int8 as d8
from repnerv_tpu.models.layers import activation, conv2d, pixel_shuffle
from repnerv_tpu.pallas_kernels.decode_int8 import (
    fused_conv_ps_act_int8,
    quantize_act_int8,
    quantize_weight_int8,
)


def _mk_q(B=2, H=8, W=16, Cin=8, C=4, s=2, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    cout = C * s * s
    x_q = jax.random.randint(ks[0], (B, H, W, Cin), -127, 128, jnp.int8)
    w_q = jax.random.randint(ks[1], (3, 3, Cin, cout), -127, 128, jnp.int8)
    scale = jax.random.uniform(ks[2], (cout,), jnp.float32, 1e-3, 2e-3)
    b = jax.random.normal(ks[3], (cout,), jnp.float32) * 0.05
    return x_q, w_q, scale, b


def _ref_int8_block(x_q, w_q, scale, b, s, act, out_scale=None, head=None,
                    squash="tanh"):
    """Emulated reference: exact int32 conv (via f32 of small ints), then the
    same f32 epilogue the kernel applies."""
    acc = conv2d(x_q.astype(jnp.float32), w_q.astype(jnp.float32))
    out = acc * scale + b
    out = activation(pixel_shuffle(out, s), act)
    if head is not None:
        hw, hb = head
        out = conv2d(out, hw, hb)
        out = jax.nn.sigmoid(out) if squash == "sigmoid" else (jnp.tanh(out) + 1) / 2
        return out
    return jnp.clip(jnp.round(out / out_scale), -127, 127).astype(jnp.int8)


@pytest.mark.parametrize("stride", [2, 5])
def test_int8_kernel_matches_integer_reference(stride):
    x_q, w_q, scale, b = _mk_q(C=3, s=stride)
    out_scale = jnp.float32(0.017)
    out = fused_conv_ps_act_int8(
        x_q, w_q, scale, b, stride, "swish", out_scale=out_scale, interpret=True
    )
    ref = _ref_int8_block(x_q, w_q, scale, b, stride, "swish", out_scale=out_scale)
    assert out.dtype == jnp.int8
    # integer matmul is exact; the f32 epilogue may round the .5 boundary
    # differently in rare cases — allow 1 count of slack
    diff = np.abs(np.asarray(out, np.int32) - np.asarray(ref, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_int8_kernel_fused_head():
    x_q, w_q, scale, b = _mk_q(C=4, s=2, seed=1)
    kh = jax.random.split(jax.random.PRNGKey(9), 2)
    hw = jax.random.normal(kh[0], (1, 1, 4, 3), jnp.float32) * 0.2
    hb = jax.random.normal(kh[1], (3,), jnp.float32) * 0.1
    out = fused_conv_ps_act_int8(
        x_q, w_q, scale, b, 2, "swish",
        head_w=hw, head_b=hb, out_squash="tanh", interpret=True,
    )
    ref = _ref_int8_block(x_q, w_q, scale, b, 2, "swish", head=(hw, hb))
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_quantize_weight_int8_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 6, 12), jnp.float32)
    w_q, sw = quantize_weight_int8(w)
    back = w_q.astype(jnp.float32) * sw
    assert np.abs(np.asarray(w_q)).max() <= 127
    # max error is half a quantization step per channel
    err = np.abs(np.asarray(back - w))
    step = np.asarray(sw)
    assert (err <= 0.5 * step[None, None, None, :] + 1e-7).all()


def test_generator_int8_path_end_to_end(monkeypatch):
    """calibrate -> int8 decode on the trailing 2 blocks tracks the f32
    deploy decode closely on a tiny ERB generator."""
    from repnerv_tpu.models.embedding import positional_encoding
    from repnerv_tpu.models.generator import (
        apply_generator,
        calibrate_int8,
        generator_to_deploy,
        init_generator,
    )
    import repnerv_tpu.models.generator as gen
    from test_model_train import tiny_model

    orig = d8.fused_conv_ps_act_int8
    monkeypatch.setattr(
        d8,
        "fused_conv_ps_act_int8",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    monkeypatch.setattr(gen, "PALLAS_REQUIRE_TPU", False)

    cfg = tiny_model(
        branch_type="ERB", fc_hw_dim="6_8_8", strides=(2, 2, 2), lower_width=8
    )
    params = init_generator(jax.random.PRNGKey(3), cfg)
    dep, dep_cfg = generator_to_deploy(params, cfg)
    dep_cfg = dataclasses.replace(dep_cfg, use_pallas_decode=False)
    emb = positional_encoding(jnp.asarray([0.1, 0.5, 0.9]), cfg.embed)

    ref = apply_generator(dep, emb, dep_cfg, train=False)[0]
    dep8 = calibrate_int8(dep, dep_cfg, emb)
    assert set(dep8["int8"].keys()) == {"1", "2"}
    i8_cfg = dataclasses.replace(dep_cfg, decode_int8=True)
    out = apply_generator(dep8, emb, i8_cfg, train=False)[0]

    assert out.dtype == jnp.float32
    assert out.shape == ref.shape
    # int8 activations at two stages: small quantization noise on a [0,1]
    # output, far below any dimension/scale bug
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 0.08, err
    psnr = -10.0 * float(jnp.log10(jnp.mean((out - ref) ** 2) + 1e-12))
    assert psnr > 35.0, psnr


def test_int8_sharded_video_decode_matches_single_device(monkeypatch):
    """The int8 serving path composes with the mesh-sharded whole-video
    scan: per-device shard_map bodies run the (interpret-mode) int8 kernels
    and the sharded frames equal the single-device decode exactly."""
    from repnerv_tpu.config import TrainConfig
    from repnerv_tpu.models.embedding import positional_encoding
    from repnerv_tpu.models.generator import (
        calibrate_int8,
        generator_to_deploy,
        init_generator,
    )
    import repnerv_tpu.models.generator as gen
    from repnerv_tpu.parallel.sharding import make_mesh, make_sharded_video_decode_fn
    from repnerv_tpu.train.loop import make_video_decode_fn
    from test_model_train import tiny_model

    orig = d8.fused_conv_ps_act_int8
    monkeypatch.setattr(
        d8,
        "fused_conv_ps_act_int8",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    monkeypatch.setattr(gen, "PALLAS_REQUIRE_TPU", False)

    mcfg = tiny_model(
        branch_type="ERB", fc_hw_dim="6_8_8", strides=(2, 2, 2), lower_width=8
    )
    params = init_generator(jax.random.PRNGKey(5), mcfg)
    dep, dep_cfg = generator_to_deploy(params, mcfg)
    dep_cfg = dataclasses.replace(dep_cfg, use_pallas_decode=False)
    calib = positional_encoding(jnp.linspace(0, 1, 4), mcfg.embed)
    dep8 = calibrate_int8(dep, dep_cfg, calib)
    assert "int8" in dep8
    cfg = TrainConfig(model=dataclasses.replace(dep_cfg, decode_int8=True))

    t_mat = jnp.linspace(0, 1, 16).reshape(2, 8)
    ref = make_video_decode_fn(cfg, keep_frames=True)(dep8, t_mat)
    mesh = make_mesh((8,), ("data",))
    out = make_sharded_video_decode_fn(cfg, mesh, keep_frames=True)(dep8, t_mat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
