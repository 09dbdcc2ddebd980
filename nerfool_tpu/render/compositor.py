"""Alpha compositing of per-sample radiance into per-ray outputs.

Equivalent of the reference's ``raw2outputs``
(/root/reference/ibrnet/render_ray.py:123-170): distance-independent alpha
``1 - exp(-sigma)`` (deliberate, for COLMAP scale robustness), cumulative-product
transmittance, and an at-least-8-valid-samples per-ray mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def raw2outputs(raw, z_vals, pixel_mask, white_bkgd=False, geo_noise=0.0, key=None):
    """
    :param raw: [N, S, 4] rgb + sigma from the aggregator
    :param z_vals: [N, S] sample depths (ascending)
    :param pixel_mask: [N, S] bool, sample has >=2 valid source observations
    :param geo_noise: std of Gaussian noise added to sigma (defense ablation)
    :return: dict with rgb [N,3], depth [N], weights [N,S], mask [N] (bool),
        alpha [N,S], z_vals [N,S]
    """
    rgb = raw[:, :, :3]
    sigma = raw[:, :, 3]
    if geo_noise is not None and geo_noise > 0:
        assert key is not None, "geo_noise requires a PRNG key"
        sigma = sigma + jax.random.normal(key, sigma.shape, sigma.dtype) * geo_noise

    alpha = 1.0 - jnp.exp(-sigma)  # [N, S]
    t = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)[:, :-1]
    t = jnp.concatenate([jnp.ones_like(t[:, :1]), t], axis=-1)
    weights = alpha * t  # [N, S]

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)  # [N, 3]
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - jnp.sum(weights, axis=-1, keepdims=True))

    mask = jnp.sum(pixel_mask.astype(jnp.float32), axis=1) > 8
    depth_map = jnp.sum(weights * z_vals, axis=-1)

    return {
        "rgb": rgb_map,
        "depth": depth_map,
        "weights": weights,
        "mask": mask,
        "alpha": alpha,
        "z_vals": z_vals,
    }
