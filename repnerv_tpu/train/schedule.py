"""Learning-rate schedule — fractional-epoch warmup + cosine/step/const.

Parity target: ``adjust_lr`` (reference utils.py:240-259) with warmup measured
in epochs = ``int(warmup_ratio * epochs)`` (main_train.py:111):

* ``frac_epoch = epoch + iter/steps_per_epoch``
* warmup (frac_epoch < warmup): ``lr_mult = 0.1 + 0.9 * frac_epoch / warmup``
* cosine: ``0.5 * (cos(pi * (frac_epoch - warmup) / (epochs - warmup)) + 1)``
* step: ``0.1 ** sum(frac_epoch >= lr_steps)``; const/plateau: 1.

Implemented as a pure function of the *global step* so it can be traced into
the jitted train step (the reference mutates optimizer.param_groups per-iter
on the host).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def lr_multiplier(
    frac_epoch: jnp.ndarray,
    *,
    epochs: int,
    warmup_epochs: float,
    lr_type: str = "cosine",
    lr_steps: Sequence[float] = (),
) -> jnp.ndarray:
    frac_epoch = jnp.asarray(frac_epoch, jnp.float32)
    if lr_type == "cosine":
        denom = max(epochs - warmup_epochs, 1e-9)
        mult = 0.5 * (jnp.cos(math.pi * (frac_epoch - warmup_epochs) / denom) + 1.0)
    elif lr_type == "step":
        steps = jnp.asarray(list(lr_steps), jnp.float32)
        n = jnp.sum(frac_epoch[..., None] >= steps, axis=-1) if len(lr_steps) else 0
        mult = jnp.asarray(0.1, jnp.float32) ** n
    elif lr_type in ("const", "plateau"):
        mult = jnp.ones_like(frac_epoch)
    else:
        raise NotImplementedError(lr_type)

    if warmup_epochs > 0:
        warm = 0.1 + 0.9 * frac_epoch / warmup_epochs
        mult = jnp.where(frac_epoch < warmup_epochs, warm, mult)
    return mult


def lr_at_step(
    step: jnp.ndarray,
    *,
    base_lr: float,
    steps_per_epoch: int,
    epochs: int,
    warmup_epochs: float,
    lr_type: str = "cosine",
    lr_steps: Sequence[float] = (),
    samples_per_epoch: int | None = None,
) -> jnp.ndarray:
    """LR as a function of the global step (step = epoch*steps_per_epoch+i).

    Default (``samples_per_epoch=None``): the intra-epoch fraction advances by
    1/steps_per_epoch per BATCH, so the schedule is continuous in wall-time at
    any batch size.  The reference instead advances by 1/len(dataset) per
    batch (``adjust_lr(…, cur_iter, data_size)``, utils.py:241 with
    ``data_size = len(train_dataset)``) — identical at b=1, but at b>1 its
    intra-epoch fraction only reaches 1/b before jumping at the epoch
    boundary.  Pass ``samples_per_epoch`` (= dataset length) to reproduce
    that reference behavior exactly for A/B parity runs.
    """
    step = jnp.asarray(step, jnp.float32)
    if samples_per_epoch is None:
        frac_epoch = step / float(steps_per_epoch)
    else:
        ep = jnp.floor(step / float(steps_per_epoch))
        frac_epoch = ep + (step - ep * steps_per_epoch) / float(samples_per_epoch)
    return base_lr * lr_multiplier(
        frac_epoch,
        epochs=epochs,
        warmup_epochs=warmup_epochs,
        lr_type=lr_type,
        lr_steps=lr_steps,
    )
