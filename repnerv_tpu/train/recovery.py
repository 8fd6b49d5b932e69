"""In-run divergence detection and restore-best recovery (SURVEY §5.3).

Two recorded mid-training collapses motivate this guard:

* round 4's corpus suite shipped video 4 at 6.96 dB after an init-draw
  collapse (``results/uvg_suite_1080p_150e.json`` pre-refit; diagnosis in
  BENCHMARKS "MRI variant-1 collapse") — caught only AFTER the run by the
  suite driver's post-hoc detector + refit (``cli/suite_main.py``);
* the round-5 static-camera text probe reached 39.81 dB at epoch 73, then
  froze at 11.07 dB / MS-SSIM 0.066 for the remaining 215 epochs
  (``result/q5_text_static/rank0.txt``) — a degenerate fixed point the
  cosine-decaying Adam never escaped, burning 72% of the schedule.

The reference has no analogue: its training loop carries no quality
feedback (``/root/reference/main_train.py:221-330`` just iterates), so a
collapsed run silently wastes the rest of its wall-clock and the user
discovers it in the final PSNR.  This guard is the in-run half of the
recovery story; the suite driver's flag+refit is the post-hoc half.

Mechanism (host-side, zero device cost on the healthy path):

* every improving epoch snapshots the params ON DEVICE (a jitted ``x + 0``
  copy — no host transfer, no disk write);
* an epoch whose train PSNR is NaN or more than ``recover_drop_db`` below
  the running best is a collapse: restore the snapshot and re-init the
  optimizer (fresh Adam moments — the collapsed moments are what pin the
  degenerate point), keeping the global step so the LR schedule position
  is preserved.  Bounded by ``max_recoveries``;
* ``finalize`` guarantees the RETURNED state is never a collapsed one:
  if the last observed epoch sits below best - drop_db, the best snapshot
  is restored (matching what the post-run checkpoints already keep as
  ``train_best``).

The threshold default (6 dB) is calibrated against the recorded traces:
healthy 300-epoch runs never dip more than ~1.5 dB below their running
best after warmup (flagship/anchor rank0 logs), while both recorded
collapses fell >20 dB within ~10 epochs.
"""

from __future__ import annotations

from typing import Callable, Optional

import math

from ..config import TrainConfig
from .loop import TrainState, make_optimizer


class DivergenceGuard:
    """Host-side collapse detector + restore-best recovery for one run.

    Parameters
    ----------
    cfg:
        The run config; ``cfg.recover_drop_db <= 0`` disables the guard.
    snap:
        Device-copy function ``params -> params`` (fresh buffers, so the
        snapshot survives donated updates).  The train driver passes its
        jitted ``x + 0`` copy.
    log:
        Sink for the loud recovery messages (defaults to ``print``).
    """

    def __init__(
        self,
        cfg: TrainConfig,
        snap: Callable,
        log: Optional[Callable[[str], None]] = None,
    ):
        self.drop_db = float(cfg.recover_drop_db)
        self.max_recoveries = int(cfg.max_recoveries)
        self.enabled = self.drop_db > 0
        self._snap = snap
        self._log = log if log is not None else print
        self._tx = make_optimizer(cfg)
        self.best_psnr = -math.inf
        self.best_epoch = -1
        self._best_params = None
        self.recoveries = 0
        self.last_psnr = -math.inf

    def _collapsed(self, psnr: float) -> bool:
        if self._best_params is None:
            return False
        return math.isnan(psnr) or psnr < self.best_psnr - self.drop_db

    def _restore(self, state: TrainState) -> TrainState:
        # Fresh optimizer moments: the collapsed Adam state is part of the
        # degenerate fixed point (the frozen-PSNR tail of q5_text_static
        # shows the update direction itself is dead).  The step counter is
        # kept so the LR schedule resumes where the collapse happened —
        # the same position the suite refit loses (it restarts from init).
        return TrainState(
            self._best_params, self._tx.init(self._best_params), state.step
        )

    def observe(self, epoch: int, psnr: float, state: TrainState):
        """Feed one epoch's train PSNR; returns ``(state, recovered)``.

        ``state`` is returned unchanged on the healthy path; on a detected
        collapse (and remaining retry budget) it is the restored state.
        """
        if not self.enabled:
            return state, False
        psnr = float(psnr)
        self.last_psnr = psnr
        if self._collapsed(psnr):
            if self.recoveries >= self.max_recoveries:
                self._log(
                    f"DIVERGED at epoch {epoch + 1}: train PSNR {psnr:.2f} dB "
                    f"is {self.best_psnr - psnr:.2f} dB below the best "
                    f"({self.best_psnr:.2f} at epoch {self.best_epoch + 1}) "
                    f"but the {self.max_recoveries} recovery budget is spent; "
                    "continuing unrecovered (finalize still restores best)"
                )
                return state, False
            self.recoveries += 1
            self._log(
                f"DIVERGED at epoch {epoch + 1}: train PSNR {psnr:.2f} dB "
                f"fell {self.best_psnr - psnr:.2f} dB below the best "
                f"({self.best_psnr:.2f} at epoch {self.best_epoch + 1}); "
                f"restoring the best snapshot with fresh optimizer state "
                f"(recovery {self.recoveries}/{self.max_recoveries})"
            )
            return self._restore(state), True
        if psnr > self.best_psnr:
            self.best_psnr = psnr
            self.best_epoch = epoch
            self._best_params = self._snap(state.params)
        return state, False

    def finalize(self, state: TrainState):
        """Never return a collapsed endpoint: ``(state, restored)``.

        If the last observed epoch is a collapse (recovery budget spent, or
        the collapse happened on the final epochs), the best snapshot is
        restored so downstream eval/compression see the best params — the
        same contract the ``train_best`` checkpoint already provides on
        disk, applied to the in-memory endpoint.
        """
        if not self.enabled or not self._collapsed(self.last_psnr):
            return state, False
        self._log(
            f"final epoch train PSNR {self.last_psnr:.2f} dB is collapsed; "
            f"returning the best snapshot ({self.best_psnr:.2f} dB from "
            f"epoch {self.best_epoch + 1}) instead"
        )
        return self._restore(state), True
