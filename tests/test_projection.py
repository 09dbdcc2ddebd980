"""Parity tests for the epipolar projector against a direct torch
re-derivation of the reference math (projection.py:24-132)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from nerfool_tpu.render.projection import (
    project_points,
    compute_angles,
    epipolar_gather,
)
from nerfool_tpu.utils.cameras import make_camera_vector


def _random_cameras(rng, v, h, w):
    cams = []
    for _ in range(v):
        k = np.eye(4, dtype=np.float32)
        k[0, 0] = k[1, 1] = 100.0 + rng.rand() * 20
        k[0, 2] = w / 2.0
        k[1, 2] = h / 2.0
        # random rotation via QR
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = q
        c2w[:3, 3] = rng.randn(3) * 0.5
        cams.append(make_camera_vector(h, w, k, c2w))
    return np.stack(cams).astype(np.float32)


def _torch_projections(xyz, cams):
    xyz = torch.from_numpy(xyz.reshape(-1, 3))
    cams = torch.from_numpy(cams)
    n_views = len(cams)
    intr = cams[:, 2:18].reshape(-1, 4, 4)
    poses = cams[:, -16:].reshape(-1, 4, 4)
    xyz_h = torch.cat([xyz, torch.ones_like(xyz[..., :1])], dim=-1)
    proj = intr.bmm(torch.inverse(poses)).bmm(
        xyz_h.t()[None].repeat(n_views, 1, 1)
    ).permute(0, 2, 1)
    pix = proj[..., :2] / torch.clamp(proj[..., 2:3], min=1e-8)
    pix = torch.clamp(pix, min=-1e6, max=1e6)
    mask = proj[..., 2] > 0
    return pix.numpy(), mask.numpy()


def test_project_points_parity(rng):
    h, w, v = 24, 32, 4
    cams = _random_cameras(rng, v, h, w)
    xyz = rng.randn(10, 6, 3).astype(np.float32) * 2
    pix, in_front = project_points(jnp.asarray(xyz), jnp.asarray(cams))
    ref_pix, ref_mask = _torch_projections(xyz, cams)
    np.testing.assert_allclose(
        np.asarray(pix).reshape(v, -1, 2), ref_pix, rtol=2e-4, atol=2e-3
    )
    np.testing.assert_array_equal(np.asarray(in_front).reshape(v, -1), ref_mask)


def test_compute_angles_properties(rng):
    h, w, v = 16, 16, 3
    cams = _random_cameras(rng, v, h, w)
    q_cam = _random_cameras(rng, 1, h, w)[0]
    xyz = rng.randn(5, 4, 3).astype(np.float32)
    rd = np.asarray(compute_angles(jnp.asarray(xyz), jnp.asarray(q_cam), jnp.asarray(cams)))
    assert rd.shape == (v, 5, 4, 4)
    # direction part is unit-length or zero
    norms = np.linalg.norm(rd[..., :3], axis=-1)
    assert np.all((norms < 1.0 + 1e-4))
    # dot of two unit vectors
    assert np.all(np.abs(rd[..., 3]) <= 1.0 + 1e-5)


def test_epipolar_gather_end_to_end(rng):
    """Full parity: gather rgb+feat through projection vs torch grid_sample."""
    h, w, v = 20, 28, 3
    cams = _random_cameras(rng, v, h, w)
    q_cam = _random_cameras(rng, 1, h, w)[0]
    src_rgbs = rng.rand(v, h, w, 3).astype(np.float32)
    featmaps = rng.randn(v, h // 2, w // 2, 8).astype(np.float32)
    xyz = rng.randn(6, 5, 3).astype(np.float32)

    rgb_feat, ray_diff, mask = epipolar_gather(
        jnp.asarray(xyz), jnp.asarray(q_cam), jnp.asarray(src_rgbs),
        jnp.asarray(cams), jnp.asarray(featmaps),
    )
    assert rgb_feat.shape == (v, 6, 5, 11)
    assert ray_diff.shape == (v, 6, 5, 4)
    assert mask.shape == (v, 6, 5, 1)

    # torch reference for the rgb gather
    pix, in_front = _torch_projections(xyz, cams)
    resize = np.array([w - 1.0, h - 1.0], dtype=np.float32)
    norm_pix = 2 * pix / resize - 1.0
    imgs = torch.from_numpy(src_rgbs).permute(0, 3, 1, 2)
    grid = torch.from_numpy(norm_pix.reshape(v, 6, 5, 2))
    ref_rgb = F.grid_sample(imgs, grid, align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(
        np.asarray(rgb_feat[..., :3]), ref_rgb, rtol=1e-4, atol=1e-5
    )
