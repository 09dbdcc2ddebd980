"""PCGrad gradient surgery over per-source-view delta slices.

Matches /root/reference/eval/ibrnet/pc_grad.py:11-152: each of the V source
views' delta slices is a "parameter"; for each view the K per-loss gradients
are flattened and conflicting components removed pairwise (g_i loses its
component along g_j when g_i . g_j < 0), either against every other task
(sequentially, in task order — the reference shuffles the order randomly; pass a
``key`` to reproduce that, else the order is deterministic) or only against a
designated major loss; the projected gradients are then summed.

Implemented as one vmap over views with a static K*K unrolled projection — no
per-view host loop, no K backward passes being re-packed through optimizer
state.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _project_one(task_grads, order):
    """task_grads: [K, D] for one view; order: [K] permutation for g_j order."""
    k = task_grads.shape[0]

    def project_task(g_i):
        def body(g, j):
            g_j = task_grads[order[j]]
            dot = jnp.dot(g, g_j)
            denom = jnp.dot(g_j, g_j) + 1e-6
            g = jnp.where(dot < 0, g - dot * g_j / denom, g)
            return g, None

        g, _ = jax.lax.scan(body, g_i, jnp.arange(k))
        return g

    return jnp.sum(jax.vmap(project_task)(task_grads), axis=0)


def _project_one_major(task_grads, major_idx):
    g_major = task_grads[major_idx]
    denom = jnp.dot(g_major, g_major) + 1e-6

    def project_task(i, g_i):
        dot = jnp.dot(g_i, g_major)
        proj = jnp.where(dot < 0, g_i - dot * g_major / denom, g_i)
        return jnp.where(i == major_idx, g_i, proj)

    k = task_grads.shape[0]
    out = jax.vmap(project_task)(jnp.arange(k), task_grads)
    return jnp.sum(out, axis=0)


def pcgrad_combine(task_grads, major_idx=None, key=None):
    """Combine K per-loss gradients into one, per source view.

    :param task_grads: [K, V, ...] per-loss gradients of delta
    :param major_idx: optional int index of the major loss
    :param key: optional PRNG key for the reference's random task order
    :return: combined gradient [V, ...]
    """
    k, v = task_grads.shape[:2]
    flat = task_grads.reshape(k, v, -1)
    if major_idx is not None:
        combined = jax.vmap(lambda tg: _project_one_major(tg, major_idx), in_axes=1)(flat)
    else:
        order = (
            jax.random.permutation(key, k) if key is not None else jnp.arange(k)
        )
        combined = jax.vmap(lambda tg: _project_one(tg, order), in_axes=1)(flat)
    return combined.reshape(task_grads.shape[1:])
