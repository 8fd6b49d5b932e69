"""M2 property tests: fusion algebra exactness for all 6 branch types.

The invariant (reference model.py:450-516 and SURVEY.md §4): for every branch
type, conv(x, fuse(params)) == branch-sum forward(x) — which also makes
deploy output == train output.  The reference only guarantees this for ERB;
our fusion must hold for ACB/RepVGG/DBB/ECB too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from repnerv_tpu.models import reparam
from repnerv_tpu.models.blocks import (
    apply_block,
    apply_branches_direct,
    block_to_deploy,
    init_block,
)
from repnerv_tpu.models.layers import conv2d, pixel_shuffle, pixel_unshuffle

BRANCHES = ["NeRV_vanilla", "ERB", "ACB", "RepVGG", "DBB", "ECB"]


def _rand_input(key, b=2, h=6, w=5, c=4):
    return jax.random.normal(key, (b, h, w, c), jnp.float32)


@pytest.mark.parametrize("branch_type", BRANCHES)
def test_fused_equals_branch_sum(branch_type):
    key = jax.random.PRNGKey(hash(branch_type) % 2**31)
    k1, k2 = jax.random.split(key)
    p = init_block(k1, ngf=4, new_ngf=3, stride=2, branch_type=branch_type)
    x = _rand_input(k2)
    direct = apply_branches_direct(p, x, branch_type)
    k, b = reparam.fuse(branch_type, p)
    fused = conv2d(x, k, b)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(fused), atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize("branch_type", BRANCHES)
def test_deploy_equals_train(branch_type):
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    p = init_block(k1, ngf=4, new_ngf=3, stride=2, branch_type=branch_type)
    x = _rand_input(k2)
    kw = dict(stride=2, branch_type=branch_type, norm="none", act="swish")
    train_out = apply_block(p, x, online_fuse=False, **kw)
    online_out = apply_block(p, x, online_fuse=True, **kw)
    dep = block_to_deploy(p, branch_type)
    assert "rbr_reparam" in dep
    deploy_out = apply_block(dep, x, **kw)
    np.testing.assert_allclose(
        np.asarray(train_out), np.asarray(online_out), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(online_out), np.asarray(deploy_out), atol=2e-5, rtol=1e-4
    )


def test_deploy_idempotent_and_smaller():
    p = init_block(jax.random.PRNGKey(0), ngf=4, new_ngf=3, stride=1, branch_type="ERB")
    dep = block_to_deploy(p, "ERB")
    dep2 = block_to_deploy(dep, "ERB")
    assert dep2 is dep
    n_train = sum(x.size for x in jax.tree.leaves(p))
    n_dep = sum(x.size for x in jax.tree.leaves(dep))
    assert n_dep < n_train
    # deploy kernel is exactly one 3x3 conv: [3,3,4,3] + [3]
    assert dep["rbr_reparam"]["w"].shape == (3, 3, 4, 3)
    assert dep["rbr_reparam"]["b"].shape == (3,)


def test_gradients_flow_to_all_branches():
    """Online reparam must deliver gradients to every branch param
    (the point of training multi-branch, reference model.py:533-539)."""
    p = init_block(jax.random.PRNGKey(1), ngf=3, new_ngf=2, stride=1, branch_type="ERB")
    x = _rand_input(jax.random.PRNGKey(2), c=3)

    def loss(p):
        out = apply_block(p, x, stride=1, branch_type="ERB", online_fuse=True)
        return jnp.sum(out**2)

    g = jax.grad(loss)(p)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert np.isfinite(np.asarray(leaf)).all()
        assert float(jnp.max(jnp.abs(leaf))) > 0, f"zero grad at {path}"


def test_seq_fusion_matches_composition():
    """1x1->3x3->1x1 fusion vs actually running three convs."""
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 4)
    w1 = jax.random.normal(ks[0], (1, 1, 4, 8))
    w2 = jax.random.normal(ks[1], (3, 3, 8, 6))
    w3 = jax.random.normal(ks[2], (1, 1, 6, 6))
    x = jax.random.normal(ks[3], (1, 7, 9, 4))
    direct = conv2d(conv2d(conv2d(x, w1), w2), w3)
    fused = conv2d(x, reparam.fuse_seq_1x1_3x3_1x1(w1, w2, w3))
    np.testing.assert_allclose(np.asarray(direct), np.asarray(fused), atol=1e-4)


def test_pixel_shuffle_matches_torch_semantics():
    """out[b, h*s+i, w*s+j, c] = in[b, h, w, c*s*s + i*s + j]"""
    s = 2
    x = jnp.arange(1 * 2 * 3 * 8, dtype=jnp.float32).reshape(1, 2, 3, 8)
    y = pixel_shuffle(x, s)
    assert y.shape == (1, 4, 6, 2)
    for h in range(2):
        for w in range(3):
            for c in range(2):
                for i in range(s):
                    for j in range(s):
                        assert float(y[0, h * s + i, w * s + j, c]) == float(
                            x[0, h, w, c * s * s + i * s + j]
                        )
    np.testing.assert_allclose(np.asarray(pixel_unshuffle(y, s)), np.asarray(x))


def test_edge_mask_values():
    """Sobel/Laplacian masks must match the reference's handwritten tables
    (model.py:212-267), transposed to (kh, kw)."""
    np.testing.assert_allclose(
        np.asarray(reparam.SOBEL_X),
        [[1, 0, -1], [2, 0, -2], [1, 0, -1]],
    )
    np.testing.assert_allclose(
        np.asarray(reparam.SOBEL_Y),
        [[1, 2, 1], [0, 0, 0], [-1, -2, -1]],
    )
    np.testing.assert_allclose(
        np.asarray(reparam.LAPLACIAN),
        [[0, 1, 0], [1, -4, 1], [0, 1, 0]],
    )
