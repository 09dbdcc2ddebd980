"""PCGrad oracle tests: pcgrad_combine vs the reference's
_project_conflicting (/root/reference/eval/ibrnet/pc_grad.py:44-92), used
strictly as a test oracle on random per-view task gradients."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfool_tpu.attack.pcgrad import pcgrad_combine

REFERENCE = "/root/reference"
if os.path.isdir(REFERENCE):
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, os.path.join(REFERENCE, "eval", "ibrnet"))

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)

K, V, D = 4, 3, 17  # tasks (losses), source views, per-view flat dim


def _reference_combine(task_grads, major_loss=None, deterministic_order=True):
    """Drive the reference PCGrad._project_conflicting on [K,V,D] numpy grads.

    The reference treats each view's delta slice as one parameter: ``grads``
    is a V-list of {task_name: flat tensor}. Its non-major path shuffles the
    task order with random.shuffle; for a deterministic oracle we stub the
    shuffle to a no-op, which matches pcgrad_combine(key=None) (task order).
    """
    import random as pyrandom

    import torch
    from pc_grad import PCGrad

    names = [f"t{i}" for i in range(task_grads.shape[0])]
    grads = [
        {n: torch.tensor(np.array(task_grads[i, v]), dtype=torch.float64)
         for i, n in enumerate(names)}
        for v in range(task_grads.shape[1])
    ]
    has_grads = [{n: True for n in names} for _ in range(task_grads.shape[1])]
    pc = PCGrad.__new__(PCGrad)
    pc._reduction = "sum"
    shuffle = pyrandom.shuffle
    if deterministic_order:
        pyrandom.shuffle = lambda x: None
    try:
        out = pc._project_conflicting(major_loss, grads, has_grads)
    finally:
        pyrandom.shuffle = shuffle
    return np.stack([g.numpy() for g in out])  # [V, D]


@needs_ref
def test_pcgrad_matches_reference_no_major():
    rng = np.random.RandomState(3)
    tg = rng.randn(K, V, D)
    # make conflicts certain: task 1 opposes task 0 on every view
    tg[1] = -tg[0] + 0.1 * rng.randn(V, D)
    ref = _reference_combine(tg.copy())
    ours = np.asarray(pcgrad_combine(jnp.asarray(tg)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@needs_ref
def test_pcgrad_matches_reference_major_loss():
    rng = np.random.RandomState(4)
    tg = rng.randn(K, V, D)
    tg[2] = -tg[0] + 0.05 * rng.randn(V, D)
    ref = _reference_combine(tg.copy(), major_loss="t0")
    ours = np.asarray(pcgrad_combine(jnp.asarray(tg), major_idx=0))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_pcgrad_no_conflict_is_sum():
    """Orthogonal/aligned gradients pass through: combined == sum over tasks."""
    rng = np.random.RandomState(5)
    base = rng.rand(1, V, D) + 0.5
    tg = np.concatenate([base * (i + 1) for i in range(K)], axis=0)  # all aligned
    ours = np.asarray(pcgrad_combine(jnp.asarray(tg)))
    np.testing.assert_allclose(ours, tg.sum(axis=0), rtol=1e-5)


def test_pcgrad_removes_conflicting_component():
    """With two antiparallel tasks, each loses its component along the other."""
    g0 = np.zeros((1, 1, 2)); g0[..., 0] = 1.0
    g1 = np.zeros((1, 1, 2)); g1[..., 0] = -1.0; g1[..., 1] = 1.0
    tg = np.concatenate([g0, g1], axis=0)
    out = np.asarray(pcgrad_combine(jnp.asarray(tg)))[0]  # view 0 -> [D]
    # g0 projected off g1: [1,0] - (-1/2)[-1,1] = [1/2, 1/2]
    # g1 projected off g0: [-1,1] - (-1)[1,0]  = [0, 1]
    np.testing.assert_allclose(out, np.array([0.5, 1.5]), atol=1e-5)


def test_pcgrad_shapes_preserved():
    tg = jnp.asarray(np.random.RandomState(6).randn(3, 2, 4, 5, 3))  # [K,V,H,W,C]
    out = pcgrad_combine(tg, key=jax.random.PRNGKey(0))
    assert out.shape == tg.shape[1:]
