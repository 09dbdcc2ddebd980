"""Epipolar projection of ray sample points into source views.

Functional equivalent of the reference projector
(/root/reference/ibrnet/projection.py:20-132): project 3D sample points through
every source camera, bilinearly gather RGB and feature-map values, compute the
ray-direction difference features and the validity mask.

TPU layout notes: every intermediate lives as component-wise [V, P] planes
(full-lane tiles) rather than [V, P, 3/4] tensors whose tiny minor dim would
waste ~40x of each VPU pass; vectors are stacked exactly once at the output
boundary. Outputs are views-first [V, R, S, C].

Gradient flow: the IBRNet stack detaches source cameras before projecting
(projection.py:104) while the GNT stack does not (camera-pose attack gradients
flow). Exposed as ``stop_camera_grad``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from nerfool_tpu.ops.grid_sample import gather_bilinear_planes

TINY = 1e-6


def _camera_mats(src_cameras):
    intr = src_cameras[:, 2:18].reshape(-1, 4, 4)
    c2w = src_cameras[:, 18:34].reshape(-1, 4, 4)
    w2c = jnp.linalg.inv(c2w)
    proj = jnp.matmul(intr, w2c, precision=jax.lax.Precision.HIGHEST)  # [V,4,4]
    return proj, c2w


def project_points_planes(xyz_flat, src_cameras):
    """Project [P,3] points into each source camera, component-wise.

    :return: (pix_x [V,P], pix_y [V,P], in_front [V,P])
    """
    proj, _ = _camera_mats(src_cameras)
    x, y, z = xyz_flat[:, 0], xyz_flat[:, 1], xyz_flat[:, 2]

    def row(i):
        return (proj[:, i, 0, None] * x + proj[:, i, 1, None] * y
                + proj[:, i, 2, None] * z + proj[:, i, 3, None])

    px, py, pz = row(0), row(1), row(2)
    denom = jnp.clip(pz, 1e-8, None)
    pix_x = jnp.clip(px / denom, -1e6, 1e6)
    pix_y = jnp.clip(py / denom, -1e6, 1e6)
    return pix_x, pix_y, pz > 0


def project_points(xyz, src_cameras):
    """Compatibility wrapper: (pixel_locations [V, ..., 2], in_front [V, ...])."""
    shape = xyz.shape[:-1]
    px, py, front = project_points_planes(xyz.reshape(-1, 3), src_cameras)
    v = src_cameras.shape[0]
    pix = jnp.stack([px, py], axis=-1).reshape((v,) + shape + (2,))
    return pix, front.reshape((v,) + shape)


def compute_angle_planes(xyz_flat, query_camera, src_cameras):
    """Ray-direction difference features, component-wise.

    :return: (dx, dy, dz, dot) each [V, P]
    """
    src_c2w = src_cameras[:, 18:34].reshape(-1, 4, 4)
    q_c2w = query_camera[18:34].reshape(4, 4)
    x, y, z = xyz_flat[:, 0], xyz_flat[:, 1], xyz_flat[:, 2]

    # unit vector point -> query camera ([P] planes, view-independent)
    tx = q_c2w[0, 3] - x
    ty = q_c2w[1, 3] - y
    tz = q_c2w[2, 3] - z
    tn = jnp.sqrt(tx * tx + ty * ty + tz * tz) + TINY
    tx, ty, tz = tx / tn, ty / tn, tz / tn

    # unit vector point -> each source camera ([V, P] planes)
    sx = src_c2w[:, 0, 3, None] - x
    sy = src_c2w[:, 1, 3, None] - y
    sz = src_c2w[:, 2, 3, None] - z
    sn = jnp.sqrt(sx * sx + sy * sy + sz * sz) + TINY
    sx, sy, sz = sx / sn, sy / sn, sz / sn

    dx = tx - sx
    dy = ty - sy
    dz = tz - sz
    dn = jnp.clip(jnp.sqrt(dx * dx + dy * dy + dz * dz), TINY, None)
    dot = tx * sx + ty * sy + tz * sz
    return dx / dn, dy / dn, dz / dn, dot


def compute_angles(xyz, query_camera, src_cameras):
    """Compatibility wrapper: [V, ..., 4] = (unit diff direction, dot)."""
    shape = xyz.shape[:-1]
    dx, dy, dz, dot = compute_angle_planes(xyz.reshape(-1, 3), query_camera,
                                           src_cameras)
    v = src_cameras.shape[0]
    return jnp.stack([dx, dy, dz, dot], axis=-1).reshape((v,) + shape + (4,))


def inbound_mask_planes(pix_x, pix_y, h, w):
    return (pix_x <= w - 1.0) & (pix_x >= 0) & (pix_y <= h - 1.0) & (pix_y >= 0)


def inbound_mask(pixel_locations, h, w):
    return inbound_mask_planes(
        pixel_locations[..., 0], pixel_locations[..., 1], h, w
    )


def epipolar_gather_components(xyz, query_camera, src_rgbs, src_cameras, featmaps,
                               stop_camera_grad=True, packed_rgb=None,
                               packed_feat=None, feat_shape=None,
                               packed_super=None, super_p=None, rgb_shape=None):
    """Like :func:`epipolar_gather` but keeps colors and features separate.

    Used by the fine-pass tap-reuse path, where ``featmaps``/``packed_feat`` may
    be a channel-unified (coarse|fine) table that downstream code slices;
    ``featmaps`` may be None when (``packed_feat``, ``feat_shape``) are given.
    With ``packed_super`` (+ ``super_p``, ``rgb_shape``, ``feat_shape``) the
    rgb and feature taps ride ONE fused superrow gather
    (see grid_sample.pack_superrow_table).

    :return: (rgb [V, R, S, 3], feat [V, R, S, C],
              ray_diff [V, R, S, 4], mask [V, R, S, 1] float)
    """
    if stop_camera_grad:
        src_cameras = jax.lax.stop_gradient(src_cameras)
    h = src_cameras[0, 0]
    w = src_cameras[0, 1]
    lead = xyz.shape[:-1]  # usually (R, S); any leading shape works (the
    # gather is point-order agnostic — ray-packed callers pass [R/2, S, 2])
    v = src_cameras.shape[0]
    pts = xyz.reshape(-1, 3)

    pix_x, pix_y, in_front = project_points_planes(pts, src_cameras)  # [V,P]
    # normalized [-1,1] coords (align_corners convention lives in the gather)
    gx = 2.0 * pix_x / (w - 1.0) - 1.0
    gy = 2.0 * pix_y / (h - 1.0) - 1.0

    if packed_super is not None:
        from nerfool_tpu.ops.grid_sample import gather_superrows

        feat_sampled, rgb_sampled = gather_superrows(
            gx, gy, packed_super, feat_shape, rgb_shape, super_p
        )
    else:
        rgb_sampled = gather_bilinear_planes(src_rgbs, gx, gy, packed=packed_rgb)
        feat_sampled = gather_bilinear_planes(featmaps, gx, gy, packed=packed_feat,
                                              shape=feat_shape)
    rgb = rgb_sampled.reshape((v,) + lead + (-1,))
    feat = feat_sampled.reshape((v,) + lead + (-1,))

    dx, dy, dz, dot = compute_angle_planes(pts, query_camera, src_cameras)
    ray_diff = jnp.stack([dx, dy, dz, dot], axis=-1).reshape((v,) + lead + (4,))

    mask = (inbound_mask_planes(pix_x, pix_y, h, w) & in_front).astype(
        rgb.dtype
    ).reshape((v,) + lead + (1,))
    return rgb, feat, ray_diff, mask


def epipolar_gather(xyz, query_camera, src_rgbs, src_cameras, featmaps,
                    stop_camera_grad=True, packed_rgb=None, packed_feat=None,
                    feat_shape=None, packed_super=None, super_p=None,
                    rgb_shape=None):
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
    rgb, feat, ray_diff, mask = epipolar_gather_components(
        xyz, query_camera, src_rgbs, src_cameras, featmaps,
        stop_camera_grad=stop_camera_grad, packed_rgb=packed_rgb,
        packed_feat=packed_feat, feat_shape=feat_shape,
        packed_super=packed_super, super_p=super_p, rgb_shape=rgb_shape,
    )
    return jnp.concatenate([rgb, feat], axis=-1), ray_diff, mask
