"""Parity of the JAX bilinear sampler with torch.nn.functional.grid_sample
(mode=bilinear, padding_mode=zeros, align_corners=True) — the exact op the
reference projector relies on."""
import numpy as np
import jax
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


def test_superrow_fused_gather_matches_separate_gathers(rng):
    """gather_superrows (one row gather for feat + rgb) must reproduce the two
    separate bilinear gathers exactly, including out-of-view zero padding and
    edge clamping, for several rgb/feat scale ratios."""
    from nerfool_tpu.ops.grid_sample import (
        gather_bilinear_planes,
        gather_superrows,
        pack_corner_table,
        pack_superrow_table,
        patch_size_for,
    )

    for (h, w, hf, wf) in ((40, 52, 10, 13), (24, 32, 12, 16), (33, 41, 8, 10)):
        v, c, n = 3, 6, 500
        rgb = jnp.asarray(rng.rand(v, h, w, 3).astype(np.float32))
        feat = jnp.asarray(rng.rand(v, hf, wf, c).astype(np.float32) - 0.5)
        # coords: mostly in view, some far out / boundary-straddling
        gx = np.concatenate([
            rng.uniform(-1, 1, size=(v, n - 60)),
            rng.uniform(-1.4, -0.98, size=(v, 20)),
            rng.uniform(0.98, 1.4, size=(v, 20)),
            np.full((v, 20), -3.0),
        ], axis=1).astype(np.float32)
        gy = np.concatenate([
            rng.uniform(-1, 1, size=(v, n - 60)),
            rng.uniform(0.97, 1.3, size=(v, 40)),
            rng.uniform(-1.3, -0.97, size=(v, 20)),
        ], axis=1).astype(np.float32)
        gx, gy = jnp.asarray(gx), jnp.asarray(gy)

        ref_rgb = gather_bilinear_planes(rgb, gx, gy)
        ref_feat = gather_bilinear_planes(feat, gx, gy)

        ftab = pack_corner_table(feat)
        table, p = pack_superrow_table(rgb, ftab, feat.shape)
        assert p == patch_size_for((h, w), (hf, wf))
        out_feat, out_rgb = gather_superrows(gx, gy, table, feat.shape,
                                             rgb.shape, p)
        np.testing.assert_allclose(np.asarray(out_feat), np.asarray(ref_feat),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_rgb), np.asarray(ref_rgb),
                                   rtol=1e-5, atol=1e-6)


def test_superrow_gather_gradients_match(rng):
    """Gradients through the fused gather must match the separate gathers:
    w.r.t. the feature maps (attack path) and w.r.t. the coordinates
    (camera-pose attack path)."""
    from nerfool_tpu.ops.grid_sample import (
        gather_bilinear_planes,
        gather_superrows,
        pack_corner_table,
        pack_superrow_table,
        patch_size_for,
    )

    v, h, w, hf, wf, c, n = 2, 20, 26, 5, 7, 4, 64
    rgb = jnp.asarray(rng.rand(v, h, w, 3).astype(np.float32))
    feat0 = jnp.asarray(rng.rand(v, hf, wf, c).astype(np.float32))
    gx0 = jnp.asarray(rng.uniform(-1.05, 1.05, size=(v, n)).astype(np.float32))
    gy0 = jnp.asarray(rng.uniform(-1.05, 1.05, size=(v, n)).astype(np.float32))
    p = patch_size_for((h, w), (hf, wf))

    def fused(feat, gx, gy):
        table, _ = pack_superrow_table(rgb, pack_corner_table(feat),
                                       feat.shape, p=p)
        f, r = gather_superrows(gx, gy, table, feat.shape, rgb.shape, p)
        return jnp.sum(f ** 2) + jnp.sum(jnp.sin(3 * r))

    def separate(feat, gx, gy):
        f = gather_bilinear_planes(feat, gx, gy)
        r = gather_bilinear_planes(rgb, gx, gy)
        return jnp.sum(f ** 2) + jnp.sum(jnp.sin(3 * r))

    g1 = jax.grad(fused, argnums=(0, 1, 2))(feat0, gx0, gy0)
    g2 = jax.grad(separate, argnums=(0, 1, 2))(feat0, gx0, gy0)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
