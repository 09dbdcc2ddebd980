"""Epipolar projection of ray sample points into source views.

Functional equivalent of the reference projector
(/root/reference/ibrnet/projection.py:20-132): project 3D sample points through
every source camera, bilinearly gather RGB and feature-map values, compute the
ray-direction difference features and the validity mask. Laid out so the heavy
gathers batch over views via vmap and fuse under jit.

A note on gradient flow: the IBRNet stack detaches source cameras before
projecting (projection.py:104) while the GNT stack does not (so camera-pose
attack gradients flow). This is exposed as ``stop_camera_grad``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from nerfool_tpu.ops.grid_sample import grid_sample_bilinear_batched

TINY = 1e-6


def project_points(xyz, src_cameras):
    """Project points into each source camera.

    :param xyz: [..., 3] points in world space
    :param src_cameras: [V, 34]
    :return: (pixel_locations [V, ..., 2], in_front_mask [V, ...])
    """
    shape = xyz.shape[:-1]
    pts = xyz.reshape(-1, 3)
    intr = src_cameras[:, 2:18].reshape(-1, 4, 4)  # [V,4,4]
    c2w = src_cameras[:, 18:34].reshape(-1, 4, 4)
    w2c = jnp.linalg.inv(c2w)
    pts_h = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=-1)  # [P,4]
    proj = jnp.einsum(
        "vij,vjk,pk->vpi", intr, w2c, pts_h, precision=jax.lax.Precision.HIGHEST
    )  # [V,P,4]
    pix = proj[..., :2] / jnp.clip(proj[..., 2:3], 1e-8, None)
    pix = jnp.clip(pix, -1e6, 1e6)
    in_front = proj[..., 2] > 0
    v = src_cameras.shape[0]
    return pix.reshape((v,) + shape + (2,)), in_front.reshape((v,) + shape)


def compute_angles(xyz, query_camera, src_cameras):
    """Ray-direction difference features.

    :param xyz: [..., 3]
    :param query_camera: [34]
    :param src_cameras: [V, 34]
    :return: [V, ..., 4] = (unit diff direction (3), dot product (1))
    """
    shape = xyz.shape[:-1]
    pts = xyz.reshape(-1, 3)
    src_c2w = src_cameras[:, 18:34].reshape(-1, 4, 4)
    q_c2w = query_camera[18:34].reshape(4, 4)
    v = src_c2w.shape[0]

    ray2tar = q_c2w[:3, 3][None, None, :] - pts[None, :, :]  # [1,P,3]
    ray2tar = ray2tar / (jnp.linalg.norm(ray2tar, axis=-1, keepdims=True) + TINY)
    ray2tar = jnp.broadcast_to(ray2tar, (v,) + ray2tar.shape[1:])
    ray2src = src_c2w[:, :3, 3][:, None, :] - pts[None, :, :]  # [V,P,3]
    ray2src = ray2src / (jnp.linalg.norm(ray2src, axis=-1, keepdims=True) + TINY)

    diff = ray2tar - ray2src
    diff_norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    diff_dot = jnp.sum(ray2tar * ray2src, axis=-1, keepdims=True)
    diff_dir = diff / jnp.clip(diff_norm, TINY, None)
    out = jnp.concatenate([diff_dir, diff_dot], axis=-1)
    return out.reshape((v,) + shape + (4,))


def inbound_mask(pixel_locations, h, w):
    """Pixel locations within the image rectangle (inclusive edges)."""
    return (
        (pixel_locations[..., 0] <= w - 1.0)
        & (pixel_locations[..., 0] >= 0)
        & (pixel_locations[..., 1] <= h - 1.0)
        & (pixel_locations[..., 1] >= 0)
    )


def epipolar_gather(xyz, query_camera, src_rgbs, src_cameras, featmaps,
                    stop_camera_grad=True):
    """Project sample points into all source views and gather colors + features.

    :param xyz: [n_rays, n_samples, 3]
    :param query_camera: [34] target camera
    :param src_rgbs: [V, H, W, 3] source images
    :param src_cameras: [V, 34]
    :param featmaps: [V, Hf, Wf, C] feature maps, channels-last (any resolution;
        normalized coords make the gather resolution-agnostic, as in F.grid_sample)
    :param stop_camera_grad: detach source cameras (IBRNet semantics)
    :return: views-first tensors
             (rgb_feat [V, n_rays, n_samples, 3+C],
              ray_diff [V, n_rays, n_samples, 4],
              mask [V, n_rays, n_samples, 1] float)
    """
    if stop_camera_grad:
        src_cameras = jax.lax.stop_gradient(src_cameras)
    h = src_cameras[0, 0]
    w = src_cameras[0, 1]

    pix, in_front = project_points(xyz, src_cameras)  # [V,R,S,2], [V,R,S]
    resize = jnp.stack([w - 1.0, h - 1.0])
    norm_pix = 2.0 * pix / resize - 1.0

    rgb_sampled = grid_sample_bilinear_batched(src_rgbs, norm_pix)  # [V,R,S,3]
    feat_sampled = grid_sample_bilinear_batched(featmaps, norm_pix)  # [V,R,S,C]
    rgb_feat = jnp.concatenate([rgb_sampled, feat_sampled], axis=-1)

    ray_diff = compute_angles(xyz, query_camera, src_cameras)  # [V,R,S,4]
    mask = ((inbound_mask(pix, h, w) & in_front).astype(rgb_feat.dtype))[..., None]

    # views-FIRST layout [V, R, S, C]: the gather's native order; the view axis
    # (the reduction axis of every aggregator pooling/softmax) stays major, so
    # no transposes/relayouts hit the hot path
    return rgb_feat, ray_diff, mask
