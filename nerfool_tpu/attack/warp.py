"""Differentiable depth-based warping between views.

Equivalent of the reference's project_with_depth / forward_warp
(/root/reference/eval/ibrnet/eval_adv.py:64-197) with the painter's-algorithm
Python pixel loop replaced by a vectorized scatter-min z-buffer
(jax.ops.segment_min), which runs on-device and differentiates: winner
*selection* is a stop-gradient index computation (as in the reference, where
long-cast indices carry no grad), while the scattered depth values stay
differentiable — so camera-pose attack gradients flow through the warp exactly
as they do in torch.

Tie-breaking matches the reference loop (strict ``>`` update): among equal
depths the lowest source pixel index wins.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def project_with_depth(depth_ref, intrinsics_ref, extrinsics_ref,
                       intrinsics_src, extrinsics_src):
    """Unproject a depth map and reproject into another camera.

    :param depth_ref: [H, W]
    :param intrinsics_*: [3, 3]; extrinsics_*: [4, 4] (c2w)
    :return: (x_src [H*W], y_src [H*W], depth_src [H*W]) continuous pixel
        coords and depth in the src camera frame
    """
    h, w = depth_ref.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=depth_ref.dtype),
        jnp.arange(w, dtype=depth_ref.dtype),
        indexing="ij",
    )
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1), jnp.ones(h * w, depth_ref.dtype)])
    pts = pix * depth_ref.reshape(1, -1)  # [3, HW]
    xyz_ref = jnp.linalg.inv(intrinsics_ref) @ pts
    xyz_ref_h = jnp.concatenate([xyz_ref, jnp.ones((1, h * w), depth_ref.dtype)])
    rel = jnp.linalg.inv(extrinsics_src) @ extrinsics_ref
    xyz_src = (rel @ xyz_ref_h)[:3]
    k_xyz = intrinsics_src @ xyz_src
    depth_src = k_xyz[2]
    xy = k_xyz[:2] / (k_xyz[2:3] + 1e-9)
    return xy[0], xy[1], depth_src


def _zbuffer_scatter(tgt_idx, depth_vals, rgb_vals, num_pixels):
    """First-minimum-wins z-buffer scatter.

    :param tgt_idx: [P] int32 flat destination indices (stop-gradient)
    :param depth_vals: [P] differentiable depths
    :param rgb_vals: [P, 3]
    :return: (new_rgb [num_pixels, 3], new_depth [num_pixels]) with zeros where
        nothing lands
    """
    p = depth_vals.shape[0]
    d_ng = jax.lax.stop_gradient(depth_vals)
    best = jax.ops.segment_min(d_ng, tgt_idx, num_segments=num_pixels)
    is_winner = d_ng == best[tgt_idx]
    order = jnp.arange(p, dtype=jnp.int32)
    winner_src = jax.ops.segment_min(
        jnp.where(is_winner, order, p), tgt_idx, num_segments=num_pixels
    )
    hit = winner_src < p
    safe = jnp.clip(winner_src, 0, p - 1)
    new_depth = jnp.where(hit, depth_vals[safe], 0.0)
    new_rgb = jnp.where(hit[:, None], rgb_vals[safe], 0.0)
    return new_rgb, new_depth


def forward_warp(selected_inds, rgb_ref, depth_ref, intrinsics_ref, extrinsics_ref,
                 intrinsics_src, extrinsics_src, src2tar=True, derive_full_image=False):
    """Warp ``rgb_ref``/``depth_ref`` into the src camera with z-buffering.

    src2tar=True: full-image z-buffer, values read at ``selected_inds`` of the
    destination. Returns (rgb_full [H,W,3], depth_full [H,W], rgb_proj [N,3],
    depth_proj [N]).

    src2tar=False (the reference's tar2src mode): only the ``selected_inds``
    pixels of the reference view are warped; returns additionally
    ``selected_inds_new`` — each selected pixel's landing index in the
    destination. (rgb_full, depth_full, rgb_proj, depth_proj, inds_new).
    """
    h, w = depth_ref.shape
    num_pixels = h * w
    x_res, y_res, depth_src = project_with_depth(
        depth_ref, intrinsics_ref, extrinsics_ref, intrinsics_src, extrinsics_src
    )
    x_i = jnp.clip(x_res, 0, w - 1).astype(jnp.int32)
    y_i = jnp.clip(y_res, 0, h - 1).astype(jnp.int32)
    tgt_idx = jax.lax.stop_gradient(y_i * w + x_i)
    rgb_flat = rgb_ref.reshape(-1, 3)

    if src2tar or derive_full_image:
        new_rgb, new_depth = _zbuffer_scatter(tgt_idx, depth_src, rgb_flat, num_pixels)
        rgb_proj = new_rgb[selected_inds]
        depth_proj = new_depth[selected_inds]
        if not derive_full_image:
            # the reference's src2tar loop writes only pixels landing in
            # selected_inds; restrict the returned full maps the same way
            # (per-pixel z-buffer values are unaffected by the restriction)
            keep = jnp.zeros((num_pixels,), bool).at[selected_inds].set(True)
            new_rgb = jnp.where(keep[:, None], new_rgb, 0.0)
            new_depth = jnp.where(keep, new_depth, 0.0)
        return new_rgb.reshape(h, w, 3), new_depth.reshape(h, w), rgb_proj, depth_proj

    # tar2src: z-buffer only over the selected subset of reference pixels
    sub_idx = tgt_idx[selected_inds]
    sub_depth = depth_src[selected_inds]
    sub_rgb = rgb_flat[selected_inds]
    new_rgb, new_depth = _zbuffer_scatter(sub_idx, sub_depth, sub_rgb, num_pixels)
    inds_new = sub_idx
    rgb_proj = new_rgb[inds_new]
    depth_proj = new_depth[inds_new]
    return (new_rgb.reshape(h, w, 3), new_depth.reshape(h, w), rgb_proj,
            depth_proj, inds_new)
