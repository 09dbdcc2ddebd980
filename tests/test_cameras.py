"""Camera codec + ray generation tests (vs direct numpy derivation of the
reference's get_rays_single_image, sample_ray.py:98-116)."""
import numpy as np
import jax.numpy as jnp

from nerfool_tpu.utils.cameras import (
    make_camera_vector,
    parse_camera,
    get_rays,
    rotation_matrix_from_euler,
    transform_src_cameras,
)


def _simple_camera(h, w):
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = k[1, 1] = 50.0
    k[0, 2], k[1, 2] = w / 2, h / 2
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.5, -0.2, 1.0]
    return k, c2w


def test_roundtrip():
    h, w = 12, 17
    k, c2w = _simple_camera(h, w)
    vec = make_camera_vector(h, w, k, c2w)
    w2, h2, k2, c2w2 = parse_camera(vec[None])
    assert float(h2[0]) == h and float(w2[0]) == w
    np.testing.assert_allclose(np.asarray(k2[0]), k)
    np.testing.assert_allclose(np.asarray(c2w2[0]), c2w)


def test_get_rays_reference_math(rng):
    h, w = 8, 10
    k, c2w = _simple_camera(h, w)
    rays_o, rays_d = get_rays(h, w, jnp.asarray(k), jnp.asarray(c2w))
    assert rays_o.shape == (h * w, 3)
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    pix = np.stack([u.reshape(-1), v.reshape(-1), np.ones(h * w)], axis=0).astype(np.float32)
    ref_d = (c2w[:3, :3] @ (np.linalg.inv(k[:3, :3]) @ pix)).T
    np.testing.assert_allclose(np.asarray(rays_d), ref_d, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rays_o), np.broadcast_to(c2w[:3, 3], (h * w, 3)))


def test_get_rays_stride():
    h, w = 9, 12
    k, c2w = _simple_camera(h, w)
    rays_o, rays_d = get_rays(h, w, jnp.asarray(k), jnp.asarray(c2w), render_stride=2)
    assert rays_d.shape[0] == ((h + 1) // 2) * ((w + 1) // 2)


def test_get_rays_at_bit_exact_vs_full(rng):
    """get_rays_at(sel) must equal get_rays(...)[sel] BIT-exactly — the attack
    step's selected-ray generation replaces the full-image build + index."""
    from nerfool_tpu.utils.cameras import get_rays_at

    h, w = 11, 13
    k, c2w = _simple_camera(h, w)
    full_o, full_d = get_rays(h, w, jnp.asarray(k), jnp.asarray(c2w))
    sel = rng.choice(h * w, 17, replace=False)
    sub_o, sub_d = get_rays_at(jnp.asarray(sel), w, jnp.asarray(k),
                               jnp.asarray(c2w))
    np.testing.assert_array_equal(np.asarray(sub_d), np.asarray(full_d)[sel])
    np.testing.assert_array_equal(np.asarray(sub_o), np.asarray(full_o)[sel])


def test_rotation_matrix_orthonormal(rng):
    angles = rng.randn(5, 3).astype(np.float32) * 0.2
    r = np.asarray(rotation_matrix_from_euler(jnp.asarray(angles)))
    for i in range(5):
        np.testing.assert_allclose(r[i] @ r[i].T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(r[i]) - 1.0) < 1e-5


def test_rotation_matrix_matches_reference_composition(rng):
    """Replicate the reference's torch composition elementwise."""
    import torch

    a = rng.randn(3).astype(np.float32) * 0.3
    dx, dy, dz = [torch.tensor(x) for x in a]
    rot_x = torch.zeros(3, 3)
    rot_x[0, 0] = torch.cos(dx); rot_x[0, 1] = -torch.sin(dx)
    rot_x[1, 0] = torch.sin(dx); rot_x[1, 1] = torch.cos(dx); rot_x[2, 2] = 1
    rot_y = torch.zeros(3, 3)
    rot_y[0, 0] = torch.cos(dy); rot_y[0, 2] = torch.sin(dy); rot_y[1, 1] = 1
    rot_y[2, 0] = -torch.sin(dy); rot_y[2, 2] = torch.cos(dy)
    rot_z = torch.zeros(3, 3)
    rot_z[0, 0] = 1; rot_z[1, 1] = torch.cos(dz); rot_z[1, 2] = -torch.sin(dz)
    rot_z[2, 1] = torch.sin(dz); rot_z[2, 2] = torch.cos(dz)
    ref = rot_z.mm(rot_y.mm(rot_x)).numpy()
    ours = np.asarray(rotation_matrix_from_euler(jnp.asarray(a)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_transform_src_cameras_zero_is_identity(rng):
    h, w = 8, 8
    k, c2w = _simple_camera(h, w)
    cams = np.stack([make_camera_vector(h, w, k, c2w) for _ in range(3)])
    out = np.asarray(
        transform_src_cameras(jnp.asarray(cams), jnp.zeros((3, 3)), jnp.zeros((3, 3)))
    )
    np.testing.assert_allclose(out, cams, atol=1e-6)
