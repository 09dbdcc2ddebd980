"""Camera codec and ray generation.

The canonical camera encoding is a 34-vector per view:
``[H, W, K.flatten()(16), c2w.flatten()(16)]`` where ``K`` is a 4x4 intrinsics
matrix and ``c2w`` a 4x4 camera-to-world (OpenCV convention) extrinsics matrix.
Mirrors the semantics of the reference's camera handling
(/root/reference/ibrnet/sample_ray.py:27-32, get_rays_single_image:98-116) but
is implemented as pure JAX functions over static-shaped arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_camera_vector(h, w, intrinsics, c2w):
    """Pack (H, W, K[4,4], c2w[4,4]) into the canonical 34-vector (numpy)."""
    intrinsics = np.asarray(intrinsics, dtype=np.float32)
    c2w = np.asarray(c2w, dtype=np.float32)
    if intrinsics.shape == (3, 3):
        k44 = np.eye(4, dtype=np.float32)
        k44[:3, :3] = intrinsics
        intrinsics = k44
    if c2w.shape == (3, 4):
        m = np.eye(4, dtype=np.float32)
        m[:3, :4] = c2w
        c2w = m
    return np.concatenate(
        [np.array([h, w], dtype=np.float32), intrinsics.reshape(16), c2w.reshape(16)]
    )


def parse_camera(cameras):
    """Split camera vectors [..., 34] -> (W, H, intrinsics [...,4,4], c2w [...,4,4])."""
    h = cameras[..., 0]
    w = cameras[..., 1]
    intrinsics = cameras[..., 2:18].reshape(cameras.shape[:-1] + (4, 4))
    c2w = cameras[..., 18:34].reshape(cameras.shape[:-1] + (4, 4))
    return w, h, intrinsics, c2w


def get_rays(h, w, intrinsics, c2w, render_stride=1):
    """Per-pixel rays for one camera.

    :param h, w: static ints (image size)
    :param intrinsics: [4,4]
    :param c2w: [4,4]
    :return: (rays_o [N,3], rays_d [N,3]) with N = ceil(h/stride)*ceil(w/stride),
        pixel order row-major (v outer, u inner), matching the reference's
        ``np.meshgrid(u, v)`` + reshape layout.
    """
    u = jnp.arange(0, w, render_stride, dtype=jnp.float32)
    v = jnp.arange(0, h, render_stride, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)  # [H', W'] each
    pixels = jnp.stack([uu.reshape(-1), vv.reshape(-1), jnp.ones_like(uu.reshape(-1))], axis=0)
    k_inv = jnp.linalg.inv(intrinsics[:3, :3])
    # geometry matmuls must run in full f32 on TPU (default precision is bf16 passes)
    rays_d = jnp.matmul(
        c2w[:3, :3],
        jnp.matmul(k_inv, pixels, precision=jax.lax.Precision.HIGHEST),
        precision=jax.lax.Precision.HIGHEST,
    ).T  # [N, 3]
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays_at(sel, w, intrinsics, c2w):
    """Rays for a subset of pixels, bit-exact vs ``get_rays(...)[sel]``.

    The attack step samples n_rand of H*W pixels every iteration
    (reference sample_ray.py:118-137 builds the full-image rays and
    indexes them); generating only the selected columns avoids the full
    [3, H*W] ray build per iteration. Column-independent matmuls at
    HIGHEST precision make the result identical to indexing the
    full-image rays.

    :param sel: [N] int row-major pixel indices (v * w + u)
    :param w: static int image width
    :param intrinsics: [4,4]
    :param c2w: [4,4]
    :return: (rays_o [N,3], rays_d [N,3])
    """
    u = (sel % w).astype(jnp.float32)
    v = (sel // w).astype(jnp.float32)
    pixels = jnp.stack([u, v, jnp.ones_like(u)], axis=0)
    k_inv = jnp.linalg.inv(intrinsics[:3, :3])
    rays_d = jnp.matmul(
        c2w[:3, :3],
        jnp.matmul(k_inv, pixels, precision=jax.lax.Precision.HIGHEST),
        precision=jax.lax.Precision.HIGHEST,
    ).T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def rotation_matrix_from_euler(rot_degree):
    """Differentiable rotation matrix from 3 angles (radians), matching the
    reference composition R = Rz(dz) @ Ry(dy) @ Rx(dx) with its (unconventional)
    per-axis layouts (/root/reference/eval/ibrnet/eval_adv.py:200-229).

    :param rot_degree: [..., 3]
    :return: [..., 3, 3]
    """
    dx, dy, dz = rot_degree[..., 0], rot_degree[..., 1], rot_degree[..., 2]
    zeros = jnp.zeros_like(dx)
    ones = jnp.ones_like(dx)
    cx, sx = jnp.cos(dx), jnp.sin(dx)
    cy, sy = jnp.cos(dy), jnp.sin(dy)
    cz, sz = jnp.cos(dz), jnp.sin(dz)
    # NOTE: the reference names these rot_x/rot_y/rot_z but builds, respectively,
    # a yaw (about z), pitch (about y), and roll (about x) matrix. We replicate.
    rot_x = jnp.stack(
        [cx, -sx, zeros, sx, cx, zeros, zeros, zeros, ones], axis=-1
    ).reshape(dx.shape + (3, 3))
    rot_y = jnp.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], axis=-1
    ).reshape(dx.shape + (3, 3))
    rot_z = jnp.stack(
        [ones, zeros, zeros, zeros, cz, -sz, zeros, sz, cz], axis=-1
    ).reshape(dx.shape + (3, 3))
    return rot_z @ rot_y @ rot_x


def transform_src_cameras(src_cameras_orig, rot_param, trans_param):
    """Apply learnable rotation/translation perturbations to source cameras.

    Left-multiplies per-view rotations onto the c2w rotation block and offsets the
    translation, rewriting the last-16 slots of each camera vector; the bottom row
    of the 4x4 keeps its original values (reference keeps ``src_cameras[..., -4:]``,
    /root/reference/eval/ibrnet/eval_adv.py:232-245,689-692).

    :param src_cameras_orig: [V, 34]
    :param rot_param: [V, 3] Euler angles (radians)
    :param trans_param: [V, 3]
    :return: [V, 34] perturbed camera vectors
    """
    c2w = src_cameras_orig[:, 18:34].reshape(-1, 4, 4)
    rot_mats = rotation_matrix_from_euler(rot_param)  # [V, 3, 3]
    rot_new = rot_mats @ c2w[:, :3, :3]
    trans_new = c2w[:, :3, 3] + trans_param
    top = jnp.concatenate([rot_new, trans_new[..., None]], axis=-1).reshape(-1, 12)
    return jnp.concatenate(
        [src_cameras_orig[:, :18], top, src_cameras_orig[:, 30:34]], axis=-1
    )
