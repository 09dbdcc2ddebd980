"""L-inf perturbation state: init + projection.

Matches the reference's init_adv_perturb / clamp
(/root/reference/eval/ibrnet/eval_adv.py:28-29,248-254,730-731,838-839): delta
is uniform in the eps-ball, and after every step is projected into
(eps-ball) ∩ ([0,1] image box around the clean sources).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def clamp(x, lower, upper):
    return jnp.maximum(jnp.minimum(x, upper), lower)


def init_delta(key, src_rgbs, epsilon, lower=0.0, upper=1.0):
    """:param src_rgbs: [V, H, W, 3] clean sources in [0,1]
    :param epsilon: scalar L-inf budget (already /255-scaled)
    :return: delta [V, H, W, 3]
    """
    delta = jax.random.uniform(
        key, src_rgbs.shape, src_rgbs.dtype, minval=-epsilon, maxval=epsilon
    )
    return clamp(delta, lower - src_rgbs, upper - src_rgbs)


def project_delta(delta, src_rgbs, epsilon, lower=0.0, upper=1.0):
    """Project into the eps-ball intersected with the image box."""
    delta = clamp(delta, -epsilon, epsilon)
    return clamp(delta, lower - src_rgbs, upper - src_rgbs)
