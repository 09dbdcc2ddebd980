"""Parity of the JAX bilinear sampler with torch.nn.functional.grid_sample
(mode=bilinear, padding_mode=zeros, align_corners=True) — the exact op the
reference projector relies on."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from nerfool_tpu.ops.grid_sample import grid_sample_bilinear


def _torch_grid_sample(image, grid):
    # image [H,W,C], grid [..., 2]
    img_t = torch.from_numpy(image).permute(2, 0, 1)[None]
    grid_t = torch.from_numpy(grid.reshape(1, 1, -1, 2))
    out = F.grid_sample(img_t, grid_t, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    return out[0, :, 0, :].T.numpy().reshape(grid.shape[:-1] + (image.shape[-1],))


def test_matches_torch_inbounds(rng):
    image = rng.randn(17, 23, 5).astype(np.float32)
    grid = rng.uniform(-0.99, 0.99, size=(7, 11, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_bilinear(jnp.asarray(image), jnp.asarray(grid)))
    ref = _torch_grid_sample(image, grid)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_matches_torch_out_of_bounds(rng):
    image = rng.randn(9, 13, 3).astype(np.float32)
    grid = rng.uniform(-1.8, 1.8, size=(50, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_bilinear(jnp.asarray(image), jnp.asarray(grid)))
    ref = _torch_grid_sample(image, grid)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_exact_corners(rng):
    image = rng.randn(6, 8, 2).astype(np.float32)
    # grid (-1,-1) -> pixel (0,0); (1,1) -> pixel (W-1,H-1)
    grid = np.array([[-1.0, -1.0], [1.0, 1.0]], dtype=np.float32)
    out = np.asarray(grid_sample_bilinear(jnp.asarray(image), jnp.asarray(grid)))
    np.testing.assert_allclose(out[0], image[0, 0], rtol=1e-6)
    np.testing.assert_allclose(out[1], image[-1, -1], rtol=1e-6)


def test_batched_matches_vmap(rng):
    import jax

    from nerfool_tpu.ops.grid_sample import grid_sample_bilinear_batched

    images = rng.randn(3, 11, 13, 6).astype(np.float32)
    grid = rng.uniform(-1.4, 1.4, size=(3, 7, 5, 2)).astype(np.float32)
    ref = np.asarray(jax.vmap(grid_sample_bilinear)(jnp.asarray(images), jnp.asarray(grid)))
    ours = np.asarray(grid_sample_bilinear_batched(jnp.asarray(images), jnp.asarray(grid)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_planes_gather_matches_torch(rng):
    """Corner-packed plane gather == torch grid_sample, incl. boundary taps."""
    from nerfool_tpu.ops.grid_sample import gather_bilinear_planes

    images = rng.randn(3, 9, 13, 6).astype(np.float32)
    grid = rng.uniform(-1.6, 1.6, size=(3, 40, 2)).astype(np.float32)
    gx = jnp.asarray(grid[..., 0])
    gy = jnp.asarray(grid[..., 1])
    ours = np.asarray(gather_bilinear_planes(jnp.asarray(images), gx, gy))
    for vi in range(3):
        ref = _torch_grid_sample(images[vi], grid[vi])
        np.testing.assert_allclose(ours[vi], ref, rtol=1e-5, atol=1e-5)
