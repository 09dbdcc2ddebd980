"""Golden tests for stratified + inverse-CDF sampling against a direct torch
re-derivation of the reference math (render_ray.py:24-116)."""
import numpy as np
import jax.numpy as jnp
import torch

from nerfool_tpu.render.sampling import (
    sample_along_camera_ray,
    sample_pdf,
    sample_fine_zvals,
)


def _torch_sample_pdf(bins, weights, n_samples):
    bins = torch.from_numpy(bins)
    weights = torch.from_numpy(weights).clone()
    m = weights.shape[1]
    weights += 1e-5
    pdf = weights / torch.sum(weights, dim=-1, keepdim=True)
    cdf = torch.cumsum(pdf, dim=-1)
    cdf = torch.cat([torch.zeros_like(cdf[:, 0:1]), cdf], dim=-1)
    u = torch.linspace(0.0, 1.0, n_samples).unsqueeze(0).repeat(bins.shape[0], 1)
    above = torch.zeros_like(u, dtype=torch.long)
    for i in range(m):
        above += (u >= cdf[:, i : i + 1]).long()
    below = torch.clamp(above - 1, min=0)
    inds_g = torch.stack((below, above), dim=2)
    cdf_g = torch.gather(cdf.unsqueeze(1).repeat(1, n_samples, 1), -1, inds_g)
    bins_g = torch.gather(bins.unsqueeze(1).repeat(1, n_samples, 1), -1, inds_g)
    denom = cdf_g[:, :, 1] - cdf_g[:, :, 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[:, :, 0]) / denom
    return (bins_g[:, :, 0] + t * (bins_g[:, :, 1] - bins_g[:, :, 0])).numpy()


def test_stratified_uniform_det(rng):
    ray_o = rng.randn(10, 3).astype(np.float32)
    ray_d = rng.randn(10, 3).astype(np.float32)
    depth_range = np.array([[2.0, 6.0]], dtype=np.float32)
    pts, z = sample_along_camera_ray(
        jnp.asarray(ray_o), jnp.asarray(ray_d), jnp.asarray(depth_range), 16, det=True
    )
    z = np.asarray(z)
    expected = np.linspace(2.0, 6.0, 16, dtype=np.float32)
    np.testing.assert_allclose(z, np.broadcast_to(expected, z.shape), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pts),
        z[..., None] * ray_d[:, None, :] + ray_o[:, None, :],
        rtol=1e-6,
    )


def test_stratified_inverse_depth(rng):
    ray_o = np.zeros((4, 3), dtype=np.float32)
    ray_d = np.ones((4, 3), dtype=np.float32)
    depth_range = np.array([[1.0, 8.0]], dtype=np.float32)
    _, z = sample_along_camera_ray(
        jnp.asarray(ray_o), jnp.asarray(ray_d), jnp.asarray(depth_range), 8,
        inv_uniform=True, det=True,
    )
    inv = 1.0 / np.asarray(z)
    np.testing.assert_allclose(
        inv[0], np.linspace(1.0, 1.0 / 8.0, 8), rtol=1e-5
    )


def test_sample_pdf_matches_reference_math(rng):
    n, m = 12, 31
    bins = np.sort(rng.rand(n, m + 1).astype(np.float32) * 5 + 1, axis=-1)
    weights = rng.rand(n, m).astype(np.float32)
    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 24, det=True))
    ref = _torch_sample_pdf(bins, weights, 24)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_sample_fine_sorted(rng):
    n, s = 6, 16
    z = np.sort(rng.rand(n, s).astype(np.float32) * 4 + 1, axis=-1)
    w = rng.rand(n, s).astype(np.float32)
    out = np.asarray(sample_fine_zvals(jnp.asarray(z), jnp.asarray(w), 8, det=True))
    assert out.shape == (n, s + 8)
    assert np.all(np.diff(out, axis=-1) >= 0)
    out_inv = np.asarray(
        sample_fine_zvals(jnp.asarray(z), jnp.asarray(w), 8, inv_uniform=True, det=True)
    )
    assert np.all(np.diff(out_inv, axis=-1) >= 0)
    assert np.all(out_inv > 0)
