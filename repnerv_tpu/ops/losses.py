"""Loss library — all 16 variants of the reference table (utils.py:139-189).

Keyed by ``loss_type``; the paper config uses ``Fusion6`` =
``0.7 * L1 + 0.3 * (1 - SSIM)``.  All losses take NHWC predictions/targets in
[0, 1] and return a scalar.  ``target`` is treated as a constant
(``lax.stop_gradient``), matching ``target.detach()`` in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .ssim import ms_ssim, ssim


def _l2(pred, target):
    return jnp.mean((pred - target) ** 2)


def _l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def _ssim_loss(pred, target, pallas_ok=True):
    return 1.0 - ssim(
        pred, target, data_range=1.0, size_average=True, pallas_ok=pallas_ok
    )


def _msssim_loss(pred, target, pallas_ok=True):
    return 1.0 - ms_ssim(
        pred, target, data_range=1.0, size_average=True, pallas_ok=pallas_ok
    )


def _freq_l1(pred, target):
    """Per-image mean |FFT2(pred) - FFT2(target)| over stacked (real, imag),
    then batch mean — matches the Fusion13/15 construction (utils.py:173-188)
    where the per-image means are later reduced by ``sum`` over the batch via
    broadcasting into the scalar loss.  The reference keeps a [B] vector and
    adds it to a scalar, yielding a [B] loss summed by autograd's implicit
    reduction at ``loss_sum.backward()`` — with b=1 this equals a scalar; we
    take the batch mean for well-defined semantics at any batch size.
    """
    pf = jnp.fft.fft2(pred, axes=(1, 2))
    tf = jnp.fft.fft2(target, axes=(1, 2))
    diff = jnp.abs(pf.real - tf.real) + jnp.abs(pf.imag - tf.imag)
    per_image = jnp.mean(diff.reshape(diff.shape[0], -1), axis=1) * 0.5
    # the torch version stacks (real, imag) as an extra dim then means over it,
    # i.e. mean of the two |.| terms -> 0.5 * (|dr| + |di|)
    return jnp.mean(per_image)


def loss_fn(
    pred: jnp.ndarray, target: jnp.ndarray, loss_type: str, pallas_ok: bool = True
) -> jnp.ndarray:
    target = lax.stop_gradient(target)
    if loss_type == "L2":
        return _l2(pred, target)
    if loss_type == "L1":
        return _l1(pred, target)
    if loss_type == "SSIM":
        return _ssim_loss(pred, target, pallas_ok)
    if loss_type == "Fusion1":
        return 0.3 * _l2(pred, target) + 0.7 * _ssim_loss(pred, target, pallas_ok)
    if loss_type == "Fusion2":
        return 0.3 * _l1(pred, target) + 0.7 * _ssim_loss(pred, target, pallas_ok)
    if loss_type == "Fusion3":
        return 0.5 * _l2(pred, target) + 0.5 * _ssim_loss(pred, target, pallas_ok)
    if loss_type == "Fusion4":
        return 0.5 * _l1(pred, target) + 0.5 * _ssim_loss(pred, target, pallas_ok)
    if loss_type == "Fusion5":
        return 0.7 * _l2(pred, target) + 0.3 * _ssim_loss(pred, target, pallas_ok)
    if loss_type == "Fusion6":
        return 0.7 * _l1(pred, target) + 0.3 * _ssim_loss(pred, target, pallas_ok)
    if loss_type == "Fusion7":
        return 0.7 * _l2(pred, target) + 0.3 * _l1(pred, target)
    if loss_type == "Fusion8":
        return 0.5 * _l2(pred, target) + 0.5 * _l1(pred, target)
    if loss_type == "Fusion9":
        return 0.9 * _l1(pred, target) + 0.1 * _ssim_loss(pred, target, pallas_ok)
    if loss_type == "Fusion10":
        return 0.7 * _l1(pred, target) + 0.3 * _msssim_loss(pred, target, pallas_ok)
    if loss_type == "Fusion11":
        return 0.9 * _l1(pred, target) + 0.1 * _msssim_loss(pred, target, pallas_ok)
    if loss_type == "Fusion12":
        return 0.8 * _l1(pred, target) + 0.2 * _msssim_loss(pred, target, pallas_ok)
    if loss_type == "Fusion13":
        return 60.0 * (
            0.7 * _l1(pred, target) + 0.3 * _ssim_loss(pred, target, pallas_ok)
        ) + _freq_l1(pred, target)
    if loss_type == "Fusion15":
        return 60.0 * (
            0.7 * _l1(pred, target) + 0.3 * _msssim_loss(pred, target, pallas_ok)
        ) + _freq_l1(pred, target)
    raise KeyError(f"Unknown loss_type {loss_type}")


def multi_scale_loss(
    outputs, targets, loss_type: str, lw: float = 1.0, pallas_ok: bool = True
) -> jnp.ndarray:
    """Weighted sum over multi-resolution heads: weight ``lw`` on all but the
    last output (reference main_train.py:242-244)."""
    n = len(outputs)
    total = jnp.asarray(0.0, jnp.float32)
    for i, (o, t) in enumerate(zip(outputs, targets)):
        li = loss_fn(o.astype(jnp.float32), t.astype(jnp.float32), loss_type, pallas_ok)
        total = total + li * (lw if i < n - 1 else 1.0)
    return total
