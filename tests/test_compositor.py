"""Golden tests for raw2outputs against a torch re-derivation of the reference
compositor (render_ray.py:123-170)."""
import numpy as np
import jax.numpy as jnp
import torch

from nerfool_tpu.render.compositor import raw2outputs


def _torch_raw2outputs(raw, z_vals, mask, white_bkgd=False):
    raw = torch.from_numpy(raw)
    z_vals = torch.from_numpy(z_vals)
    mask = torch.from_numpy(mask)
    rgb = raw[:, :, :3]
    sigma = raw[:, :, 3]
    alpha = 1.0 - torch.exp(-sigma)
    t = torch.cumprod(1.0 - alpha + 1e-10, dim=-1)[:, :-1]
    t = torch.cat((torch.ones_like(t[:, 0:1]), t), dim=-1)
    weights = alpha * t
    rgb_map = torch.sum(weights.unsqueeze(2) * rgb, dim=1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - torch.sum(weights, dim=-1, keepdim=True))
    out_mask = mask.float().sum(dim=1) > 8
    depth_map = torch.sum(weights * z_vals, dim=-1)
    return rgb_map.numpy(), depth_map.numpy(), weights.numpy(), out_mask.numpy()


def test_matches_reference(rng):
    n, s = 9, 24
    raw = rng.rand(n, s, 4).astype(np.float32)
    z = np.sort(rng.rand(n, s).astype(np.float32) * 3 + 1, axis=-1)
    mask = rng.rand(n, s) > 0.3
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(mask))
    rgb, depth, weights, m = _torch_raw2outputs(raw, z, mask)
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["weights"]), weights, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["mask"]), m)


def test_geo_noise_matches_reference(rng, monkeypatch):
    """geo_noise (the reference's density-noise defense ablation,
    render_ray.py:133-134) perturbs sigma BEFORE the alpha transform with
    Gaussian noise of std geo_noise. Oracle: the reference's own raw2outputs
    with the noise draw pinned to the same array on both sides."""
    import os
    import sys

    import pytest

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, "/root/reference")
    from ibrnet.render_ray import raw2outputs as ref_raw2outputs

    n, s, gn = 7, 20, 0.4
    raw = rng.rand(n, s, 4).astype(np.float32)
    z = np.sort(rng.rand(n, s).astype(np.float32) * 3 + 1, axis=-1)
    mask = rng.rand(n, s) > 0.3
    noise = rng.randn(n, s).astype(np.float32)

    monkeypatch.setattr(torch, "randn_like",
                        lambda t: torch.from_numpy(noise).to(t.dtype))
    ref = ref_raw2outputs(torch.from_numpy(raw), torch.from_numpy(z),
                          torch.from_numpy(mask), geo_noise=gn)

    import jax

    monkeypatch.setattr(jax.random, "normal",
                        lambda key, shape, dtype=None: jnp.asarray(noise))
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(mask),
                      geo_noise=gn, key=jax.random.PRNGKey(0))
    for k in ("rgb", "depth", "weights", "alpha"):
        np.testing.assert_allclose(np.asarray(out[k]), ref[k].numpy(),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    # and the noise actually changes the composite
    clean = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(mask))
    assert np.max(np.abs(np.asarray(out["rgb"]) - np.asarray(clean["rgb"]))) > 1e-3


def test_white_background(rng):
    n, s = 4, 12
    raw = np.zeros((n, s, 4), dtype=np.float32)  # zero sigma -> empty space
    z = np.broadcast_to(np.linspace(1, 2, s, dtype=np.float32), (n, s)).copy()
    mask = np.ones((n, s), dtype=bool)
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(mask), white_bkgd=True)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-5)
