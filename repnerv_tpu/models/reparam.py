"""Structural-reparameterization fusion algebra — pure JAX, all 6 branch types.

The paper's core mechanism (reference model.py:450-516, "online structural
reparameterization"): each decoder conv trains as a multi-branch block, but
every forward pass *fuses the branch weights into one equivalent 3x3 kernel*
and runs a single conv.  Autodiff flows through the fusion algebra, so all
branches receive gradients while only one conv executes.

TPU-first design:

* Branch params live in a pytree; ``fuse_<type>()`` is a small pure function
  of weights only — a handful of pads/einsums that XLA constant-folds into
  the step graph.  Fusing is O(params), executed once per jitted step (the
  reference re-fuses per frame at batch size 1; we fuse once per GOP batch).
* Being pure functions, ``jax.grad`` differentiates through fusion with no
  ``retain_graph`` hazards (cf. reference main_eval.py:476-480).
* Weights are HWIO (kh, kw, cin, cout) — the native layout for NHWC convs.

Exactness notes (verified by property tests in tests/test_reparam.py):

* 1x3/3x1 -> zero-pad to 3x3 and add (reference model.py:480-497).
* 1x1 -> 3x3 -> 1x1 sequences fuse exactly *because the branch is bias-free
  by construction* (reference model.py:335-343): a bias-free 1x1 commutes
  with zero padding.
* DBB's avg-pool branch: AvgPool2d(3, 1, 1) with count_include_pad=True is a
  depthwise conv with constant 1/9 kernel, so (bias-free 1x1) ∘ avgpool fuses
  to K[u,v,i,o] = W1x1[i,o] / 9.
* ECB's SeqConv3x3 (reference model.py:191-300) pads the 1x1 output borders
  with the 1x1 *bias value* before the depthwise mask conv, which makes the
  biased 1x1 commute with padding — its exact fusion is
  K[u,v,i,o] = k0[i,o] * scale[o] * mask[u,v,o],
  b[o] = b0[o] * sum_uv(scale[o]*mask[u,v,o]) + bias[o].

The reference's ``get_equivalent_kernel_bias`` hardcodes ERB attributes, so
``switch_to_deploy`` would crash for ACB/RepVGG/DBB/ECB (SURVEY.md §2 #11);
here every branch type fuses, so deploy works for all of them.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# Sobel-x / Sobel-y / Laplacian masks of SeqConv3x3 (reference
# model.py:212-267), laid out (kh, kw) to match the HWIO convention.
SOBEL_X = jnp.asarray(
    [[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]], jnp.float32
)
SOBEL_Y = jnp.asarray(
    [[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]], jnp.float32
)
LAPLACIAN = jnp.asarray(
    [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], jnp.float32
)
EDGE_MASKS = {"sbx": SOBEL_X, "sby": SOBEL_Y, "lpl": LAPLACIAN}


def _pad_1x3_to_3x3(w: jnp.ndarray) -> jnp.ndarray:
    """[1,3,I,O] -> [3,3,I,O] zero-padded on the height axis."""
    return jnp.pad(w, ((1, 1), (0, 0), (0, 0), (0, 0)))


def _pad_3x1_to_3x3(w: jnp.ndarray) -> jnp.ndarray:
    """[3,1,I,O] -> [3,3,I,O] zero-padded on the width axis."""
    return jnp.pad(w, ((0, 0), (1, 1), (0, 0), (0, 0)))


def _pad_1x1_to_3x3(w: jnp.ndarray) -> jnp.ndarray:
    """[1,1,I,O] -> [3,3,I,O] centered."""
    return jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))


def fuse_seq_1x1_3x3(w1: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    """Fuse bias-free 1x1 [1,1,I,M] followed by 3x3 [3,3,M,O] -> [3,3,I,O].

    Same algebra as reference model.py:510 (a conv of the 3x3 weights with
    the permuted 1x1 weights) expressed as a single einsum over the middle
    channel.
    """
    return jnp.einsum("im,uvmo->uvio", w1[0, 0], w2)


def fuse_seq_3x3_1x1(w2: jnp.ndarray, w3: jnp.ndarray) -> jnp.ndarray:
    """Fuse 3x3 [3,3,I,M] followed by bias-free 1x1 [1,1,M,O] -> [3,3,I,O].

    Matches the repeat/matmul construction at reference model.py:513-515.
    """
    return jnp.einsum("uvim,mo->uvio", w2, w3[0, 0])


def fuse_seq_1x1_3x3_1x1(
    w1: jnp.ndarray, w2: jnp.ndarray, w3: jnp.ndarray
) -> jnp.ndarray:
    """The ERB expand-squeeze branch: 1x1(I->2I) . 3x3(2I->O) . 1x1(O->O)."""
    return fuse_seq_3x3_1x1(fuse_seq_1x1_3x3(w1, w2), w3)


def fuse_edge_branch(p: Params, mask2d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact fusion of a SeqConv3x3 edge branch (reference model.py:286-300).

    Branch forward = depthwise(scale*mask) ∘ border-bias-pad ∘ conv1x1(k0,b0),
    plus per-channel bias.  Params: k0 [1,1,I,O], b0 [O], scale [O], bias [O].
    """
    k0 = p["k0"][0, 0]  # [I, O]
    eff_mask = mask2d[:, :, None] * p["scale"][None, None, :]  # [3,3,O]
    kernel = k0[None, None, :, :] * eff_mask[:, :, None, :]  # [3,3,I,O]
    bias = p["b0"] * jnp.sum(eff_mask, axis=(0, 1)) + p["bias"]
    return kernel, bias


# ---------------------------------------------------------------------------
# Per-branch-type fusion: params pytree -> (kernel [3,3,I,O], bias [O]|None)
# ---------------------------------------------------------------------------


def fuse_vanilla(p: Params) -> Tuple[jnp.ndarray, jnp.ndarray | None]:
    return p["branch"]["w"], p["branch"].get("b")


def fuse_erb(p: Params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ERB: 3x3 + 1x3 + 3x1 + (1x1 -> 3x3 -> 1x1, bias-free).

    Mirrors reference get_equivalent_kernel_bias (model.py:450-478); the seq
    branch contributes no bias by construction.
    """
    k = (
        p["k3x3"]["w"]
        + _pad_1x3_to_3x3(p["k1x3"]["w"])
        + _pad_3x1_to_3x3(p["k3x1"]["w"])
        + fuse_seq_1x1_3x3_1x1(p["seq_1x1_a"]["w"], p["seq_3x3"]["w"], p["seq_1x1_b"]["w"])
    )
    b = p["k3x3"]["b"] + p["k1x3"]["b"] + p["k3x1"]["b"]
    return k, b


def fuse_acb(p: Params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    k = (
        p["k3x3"]["w"]
        + _pad_1x3_to_3x3(p["k1x3"]["w"])
        + _pad_3x1_to_3x3(p["k3x1"]["w"])
    )
    b = p["k3x3"]["b"] + p["k1x3"]["b"] + p["k3x1"]["b"]
    return k, b


def fuse_repvgg(p: Params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    k = p["k3x3"]["w"] + _pad_1x1_to_3x3(p["k1x1"]["w"])
    b = p["k3x3"]["b"] + p["k1x1"]["b"]
    return k, b


def fuse_dbb(p: Params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DBB: 3x3 + 1x1 + (1x1->3x3) + (1x1->avgpool3x3)."""
    k_seq = fuse_seq_1x1_3x3(p["seq_1x1"]["w"], p["seq_3x3"]["w"])
    # avgpool(3,1,1) == depthwise conv with 1/9 kernel (count_include_pad)
    w_avg = p["avg_1x1"]["w"][0, 0]  # [I, O]
    k_avg = jnp.broadcast_to(
        w_avg[None, None, :, :] / 9.0, (3, 3) + w_avg.shape
    )
    k = (
        p["k3x3"]["w"]
        + _pad_1x1_to_3x3(p["k1x1"]["w"])
        + k_seq
        + k_avg
    )
    b = p["k3x3"]["b"] + p["k1x1"]["b"]
    return k, b


def fuse_ecb(p: Params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ECB: 3x3 + (1x1->3x3) + Sobel-x + Sobel-y + Laplacian edge branches."""
    k = p["k3x3"]["w"] + fuse_seq_1x1_3x3(p["seq_1x1"]["w"], p["seq_3x3"]["w"])
    b = p["k3x3"]["b"]
    for name, mask in EDGE_MASKS.items():
        ek, eb = fuse_edge_branch(p[name], mask)
        k = k + ek
        b = b + eb
    return k, b


FUSERS = {
    "NeRV_vanilla": fuse_vanilla,
    "ERB": fuse_erb,
    "ACB": fuse_acb,
    "RepVGG": fuse_repvgg,
    "DBB": fuse_dbb,
    "ECB": fuse_ecb,
}


def fuse(branch_type: str, params: Params) -> Tuple[jnp.ndarray, jnp.ndarray | None]:
    """Fuse a block's branch params into an equivalent (3x3 kernel, bias)."""
    if "rbr_reparam" in params:  # already deployed
        return params["rbr_reparam"]["w"], params["rbr_reparam"].get("b")
    return FUSERS[branch_type](params)
