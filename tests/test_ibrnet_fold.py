"""Sample-folded IBRNet aggregator == unfolded (same params, same inputs).

The fold packs adjacent sample pairs into the channel axis with
block-diagonal weights (models/ibrnet.py IBRNetAggregator._folded) — a pure
layout transform of the view-side compute (every view-side op is pointwise
over (sample, channel) or reduces over V), so outputs must agree to f32
roundoff.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfool_tpu.models.ibrnet import IBRNetAggregator


def _inputs(v=3, r=4, s=8, c=35, seed=0):
    rng = np.random.RandomState(seed)
    rgb_feat = jnp.asarray(rng.rand(v, r, s, c).astype(np.float32))
    ray_diff = jnp.asarray((rng.rand(v, r, s, 4) - 0.5).astype(np.float32))
    mask = jnp.asarray((rng.rand(v, r, s, 1) > 0.2).astype(np.float32))
    return rgb_feat, ray_diff, mask


@pytest.mark.parametrize("anti_alias", [True, False])
def test_folded_matches_unfolded(anti_alias):
    args = _inputs()
    base = IBRNetAggregator(anti_alias_pooling=anti_alias, sample_fold=1)
    folded = IBRNetAggregator(anti_alias_pooling=anti_alias, sample_fold=2)
    params = base.init(jax.random.PRNGKey(0), *args)["params"]
    out0 = base.apply({"params": params}, *args)
    out1 = folded.apply({"params": params}, *args)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=0, atol=2e-6)


def test_fold_param_tree_identical():
    args = _inputs()
    p0 = IBRNetAggregator(sample_fold=1).init(jax.random.PRNGKey(1), *args)["params"]
    p1 = IBRNetAggregator(sample_fold=2).init(jax.random.PRNGKey(1), *args)["params"]
    s0 = jax.tree.map(lambda x: (x.shape, str(x.dtype)), p0)
    s1 = jax.tree.map(lambda x: (x.shape, str(x.dtype)), p1)
    assert s0 == s1
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), p0, p1)


def test_fold_odd_samples_falls_back():
    args = _inputs(s=7)
    m = IBRNetAggregator(sample_fold=2)
    params = m.init(jax.random.PRNGKey(2), *args)["params"]
    out = m.apply({"params": params}, *args)
    ref = IBRNetAggregator(sample_fold=1).apply({"params": params}, *args)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
