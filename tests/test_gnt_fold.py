"""Sample-folded GNT view side == unfolded (same params, same inputs).

The fold packs adjacent sample pairs into the channel axis with
block-diagonal weights (models/gnt.py ViewAttention.fold) — a pure layout
transform of the view-side compute, so outputs must agree to f32 roundoff.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfool_tpu.models.gnt import GNTAggregator


def _inputs(v=3, r=4, s=8, c=35, seed=0):
    rng = np.random.RandomState(seed)
    rgb_feat = jnp.asarray(rng.rand(v, r, s, c).astype(np.float32))
    ray_diff = jnp.asarray((rng.rand(v, r, s, 4) - 0.5).astype(np.float32))
    mask = jnp.asarray((rng.rand(v, r, s, 1) > 0.2).astype(np.float32))
    pts = jnp.asarray(rng.rand(r, s, 3).astype(np.float32))
    ray_d = jnp.asarray((rng.rand(r, 3) - 0.5).astype(np.float32))
    return rgb_feat, ray_diff, mask, pts, ray_d


@pytest.mark.parametrize("ret_alpha", [True, False])
def test_folded_matches_unfolded(ret_alpha):
    args = _inputs()
    base = GNTAggregator(trans_depth=4, ret_alpha=ret_alpha, sample_fold=1)
    folded = GNTAggregator(trans_depth=4, ret_alpha=ret_alpha, sample_fold=2)
    params = base.init(jax.random.PRNGKey(0), *args)["params"]
    out0 = base.apply({"params": params}, *args)
    out1 = folded.apply({"params": params}, *args)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=0, atol=2e-6)


def test_fold_param_tree_identical():
    args = _inputs()
    p0 = GNTAggregator(trans_depth=2, sample_fold=1).init(
        jax.random.PRNGKey(1), *args)["params"]
    p1 = GNTAggregator(trans_depth=2, sample_fold=2).init(
        jax.random.PRNGKey(1), *args)["params"]
    s0 = jax.tree.map(lambda x: (x.shape, str(x.dtype)), p0)
    s1 = jax.tree.map(lambda x: (x.shape, str(x.dtype)), p1)
    assert s0 == s1
    # same rng -> same values: the fold changes apply-time math only
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), p0, p1)


def test_fold_odd_samples_falls_back():
    args = _inputs(s=7)
    m = GNTAggregator(trans_depth=2, sample_fold=2)
    params = m.init(jax.random.PRNGKey(2), *args)["params"]
    out = m.apply({"params": params}, *args)
    ref = GNTAggregator(trans_depth=2, sample_fold=1).apply({"params": params}, *args)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
