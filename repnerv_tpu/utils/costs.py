"""FLOP/MAC accounting — the thop replacement (reference main_train.py:410-412,
main_eval.py:787-790 use ``thop.profile`` for MACs/params).

Primary path: XLA's own cost model via ``jit(fn).lower(...).cost_analysis()``.
Fallback: an analytic count over the generator architecture (convs dominate;
matches thop's conv MACs = k*k*Cin*Cout*H*W and linear MACs = din*dout).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from ..config import ModelConfig, head_plan, stage_channels


def xla_cost_analysis(fn: Callable, *example_args) -> Optional[Dict[str, float]]:
    """FLOPs / bytes accessed as estimated by XLA for the jitted ``fn``."""
    try:
        lowered = jax.jit(fn).lower(*example_args)
        cost = lowered.compile().cost_analysis()
        if cost is None:
            cost = lowered.cost_analysis()
        if not cost:
            return None
        return {
            "flops": float(cost.get("flops", 0.0)),
            "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
        }
    except Exception:
        return None


def generator_macs(cfg: ModelConfig, deploy: bool = True) -> Dict[str, float]:
    """Analytic per-frame MACs for the generator (thop conventions).

    ``deploy``: count the fused single 3x3 conv per block; else count every
    training branch (the reference profiles whatever graph is loaded).
    """
    h, w, c = cfg.fc_hwd
    stem_dim, stem_num = cfg.stem_dims
    macs = 0.0
    dims = [cfg.embed_length] + [stem_dim] * stem_num + [h * w * c]
    for a, b in zip(dims[:-1], dims[1:]):
        macs += a * b

    sh, sw = h, w
    plan = stage_channels(cfg)
    for ngf, new_ngf, stride in plan:
        cout = new_ngf * stride * stride
        if deploy or cfg.branch_type == "NeRV_vanilla":
            macs += 9 * ngf * cout * sh * sw
        elif cfg.branch_type == "ERB":
            macs += (9 + 3 + 3) * ngf * cout * sh * sw
            macs += (ngf * 2 * ngf + 9 * 2 * ngf * cout + cout * cout) * sh * sw
        elif cfg.branch_type == "ACB":
            macs += (9 + 3 + 3) * ngf * cout * sh * sw
        elif cfg.branch_type == "RepVGG":
            macs += (9 + 1) * ngf * cout * sh * sw
        elif cfg.branch_type == "DBB":
            macs += (9 + 1) * ngf * cout * sh * sw
            macs += (ngf * 2 * ngf + 9 * 2 * ngf * cout) * sh * sw
            macs += (ngf * cout + 9 * cout) * sh * sw
        elif cfg.branch_type == "ECB":
            macs += 9 * ngf * cout * sh * sw
            macs += (ngf * 2 * ngf + 9 * 2 * ngf * cout) * sh * sw
            macs += 3 * (ngf * cout + 9 * cout) * sh * sw
        sh, sw = sh * stride, sw * stride

    widths = []
    ngf_track = c
    heads = head_plan(cfg)
    hh, ww = h, w
    for i, stride in enumerate(cfg.strides):
        hh, ww = hh * stride, ww * stride
        stage_out = plan[(i + 1) * cfg.num_blocks - 1][1]
        if heads[i]:
            macs += stage_out * 3 * hh * ww
    return {"macs": macs, "flops": 2 * macs}
