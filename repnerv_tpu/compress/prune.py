"""Global magnitude pruning as boolean mask pytrees.

Parity target: ``torch.nn.utils.prune.global_unstructured(L1Unstructured)``
over the reference's target-module selection (main_eval.py:211-648):

* NeRV_vanilla: stem Linear weights + each block's ``branch`` (train) or
  ``rbr_reparam`` (deploy) conv weight;
* ERB train-state: stem + all six ERB branch conv weights;
* ERB deploy-state: stem + ``rbr_reparam``;
* biases are never pruned.

Global L1 pruning keeps the (1 - ratio) largest |w| across the CONCATENATION
of all target tensors — one global threshold, computed here with a single
``np.partition`` instead of torch's topk.  Masks are a pytree aligned with
the params tree (None where untouched) so the train step can apply them
in-graph (repnerv_tpu/train/loop.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig

Params = Dict[str, Any]

# branch param names whose "w" participates in pruning, per branch type,
# matching main_eval.py's hasattr sweeps (242-273, 292-350, 571-587).
_PRUNE_BRANCH_KEYS = {
    "NeRV_vanilla": ("branch", "rbr_reparam"),
    "ERB": (
        "k3x3",
        "k3x1",
        "k1x3",
        "seq_1x1_a",
        "seq_3x3",
        "seq_1x1_b",
        "rbr_reparam",
    ),
    # the reference only implements vanilla/ERB selection; we extend the same
    # "all conv branches" rule to the remaining types.
    "ACB": ("k3x3", "k3x1", "k1x3", "rbr_reparam"),
    "RepVGG": ("k3x3", "k1x1", "rbr_reparam"),
    "DBB": ("k3x3", "k1x1", "seq_1x1", "seq_3x3", "avg_1x1", "rbr_reparam"),
    "ECB": ("k3x3", "seq_1x1", "seq_3x3", "rbr_reparam"),
}


def _target_paths(params: Params, branch_type: str) -> List[Tuple]:
    """(path tuples into the params tree) of every prunable weight array."""
    paths: List[Tuple] = []
    for i in range(len(params["stem"])):
        paths.append(("stem", i, "w"))
    keys = _PRUNE_BRANCH_KEYS[branch_type]
    for li, block in enumerate(params["blocks"]):
        for k in keys:
            if k in block and "w" in block[k]:
                paths.append(("blocks", li, k, "w"))
    return paths


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def global_l1_masks(
    params: Params, branch_type: str, prune_ratio: float
) -> Tuple[Any, float]:
    """Build the mask pytree and return (masks, actual_zero_ratio).

    masks mirrors ``params`` with float32 {0,1} arrays at pruned weights and
    ``None`` elsewhere (so ``jax.tree.map`` over (params, masks) with an
    is_leaf=None guard applies them cheaply).
    """
    paths = _target_paths(params, branch_type)
    flats = [np.abs(np.asarray(_get(params, p))).ravel() for p in paths]
    allw = np.concatenate(flats)
    k = int(round(prune_ratio * allw.size))
    if k <= 0:
        thresh = -np.inf
    elif k >= allw.size:
        thresh = np.inf
    else:
        # torch L1Unstructured removes the k smallest |w|; the threshold is
        # the k-th smallest magnitude (ties resolved by <=, matching topk of
        # the complement).
        thresh = np.partition(allw, k - 1)[k - 1]

    masks = jax.tree.map(lambda _: None, params, is_leaf=lambda x: x is None)
    total = 0
    zeros = 0
    for p in paths:
        w = np.asarray(_get(params, p))
        m = (np.abs(w) > thresh).astype(np.float32)
        total += m.size
        zeros += int(m.size - m.sum())
        masks = _set(masks, p, jnp.asarray(m))
    actual = zeros / max(total, 1)
    return masks, actual


def _set(tree, path, value):
    """Immutable set into a nested dict/list pytree."""
    head = path[0]
    if len(path) == 1:
        if isinstance(tree, dict):
            out = dict(tree)
            out[head] = value
            return out
        out = list(tree)
        out[head] = value
        return out
    if isinstance(tree, dict):
        out = dict(tree)
        out[head] = _set(tree[head], path[1:], value)
        return out
    out = list(tree)
    out[head] = _set(tree[head], path[1:], value)
    return out


def apply_masks(params: Params, masks) -> Params:
    return jax.tree.map(
        lambda p, m: p * m.astype(p.dtype) if m is not None else p,
        params,
        masks,
        is_leaf=lambda x: x is None,
    )


def verify_ratio(actual: float, requested: float, tol: float = 0.05) -> bool:
    """Mask-ratio self-check, reference tolerance (main_eval.py:276-287)."""
    return actual > 0 and abs(actual - requested) <= tol


def sparsity_report(params: Params, masks) -> Dict[str, float]:
    total = 0
    zeros = 0
    leaves = jax.tree.leaves(
        jax.tree.map(
            lambda p, m: (m.size, float(m.size - m.sum())) if m is not None else None,
            params,
            masks,
            is_leaf=lambda x: x is None,
        ),
        is_leaf=lambda x: isinstance(x, tuple),
    )
    for sz, z in leaves:
        total += sz
        zeros += z
    return {"target_elems": total, "zeros": zeros, "ratio": zeros / max(total, 1)}
