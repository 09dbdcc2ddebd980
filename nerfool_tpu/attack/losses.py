"""Attack loss terms. All pure functions over renderer outputs.

Reference: the multi-loss attack step
(/root/reference/eval/ibrnet/eval_adv.py:258-519) and its helpers
(calc_depth_smooth_loss:32-48, SL1Loss:51-60, train.py calc_depth_var:317-327,
utils.py img2mse:48-58). The attack *maximizes* these, so the sign flip lives in
the optimizer, not here.
"""
from __future__ import annotations

import jax.numpy as jnp

TINY = 1e-6


def masked_mse(pred, gt, mask=None):
    """img2mse: plain mean, or mask-weighted mean over the last axis size."""
    if mask is None:
        return jnp.mean((pred - gt) ** 2)
    num = jnp.sum((pred - gt) ** 2 * mask[..., None])
    den = jnp.sum(mask) * pred.shape[-1] + TINY
    return num / den


def rgb_criterion(outputs, gt_rgb):
    """The reference Criterion: masked MSE with the renderer's validity mask
    when present (ibrnet), plain mean otherwise (gnt, gnt/criterion.py:9-22)."""
    mask = outputs.get("mask")
    if mask is None:
        return masked_mse(outputs["rgb"], gt_rgb)
    return masked_mse(outputs["rgb"], gt_rgb, mask.astype(outputs["rgb"].dtype))


def smooth_l1(pred, gt, mask):
    """SmoothL1(beta=1) mean over mask; matches nn.SmoothL1Loss on pred[mask]."""
    diff = pred - gt
    a = jnp.abs(diff)
    loss = jnp.where(a < 1.0, 0.5 * diff * diff, a - 0.5)
    mask = mask.astype(loss.dtype)
    return jnp.sum(loss * mask) / jnp.clip(jnp.sum(mask), 1.0, None)


def depth_diff_loss(outputs, depth_gt):
    """SmoothL1 between predicted and GT depth on gt>0 pixels."""
    return smooth_l1(outputs["depth"], depth_gt, depth_gt > 0)


def depth_var_loss(outputs):
    """Per-ray depth variance under compositing weights, mean over valid rays
    (NaN rays — zero weight sum — are dropped, as in calc_depth_var)."""
    w = outputs["weights"]
    z = outputs["z_vals"]
    d = outputs["depth"]
    wsum = jnp.sum(w, axis=1)
    var = jnp.sum(w * (z - d[:, None]) ** 2, axis=1) / jnp.where(wsum == 0, 1.0, wsum)
    valid = wsum != 0
    return jnp.sum(jnp.where(valid, var, 0.0)) / jnp.clip(jnp.sum(valid), 1, None)


def depth_smooth_loss(depth, patch_size, loss_type="l2"):
    """RegNeRF-style patch smoothness on depth of patch-sampled rays.

    :param depth: [n_patches * patch_size**2] (patch-major ray order)
    """
    d = depth.reshape(-1, patch_size, patch_size)
    v00 = d[:, :-1, :-1]
    v01 = d[:, :-1, 1:]
    v10 = d[:, 1:, :-1]
    if loss_type == "l2":
        loss = (v00 - v01) ** 2 + (v00 - v10) ** 2
    elif loss_type == "l1":
        loss = jnp.abs(v00 - v01) + jnp.abs(v00 - v10)
    else:
        raise ValueError(loss_type)
    return jnp.sum(loss)


def density_loss(outputs, outputs_gt):
    """MSE between attacked and clean per-sample alphas (needs pseudo-GT)."""
    return masked_mse(outputs["alpha"], outputs_gt["alpha"])
