"""Whole-image rendering: shape contract, chunk-size invariance, and
multi-device ray sharding on the virtual 8-CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from helpers import synthetic_scene

from nerfool_tpu.models.bundle import create_model
from nerfool_tpu.render.render_image import render_rays_blocked, render_single_image
from nerfool_tpu.render.render_rays import RenderConfig, render_rays
from nerfool_tpu.utils.cameras import get_rays
from nerfool_tpu.parallel.mesh import get_mesh, shard_rays


def _setup(rng, h=24, w=32):
    target_cam, src_rgbs, src_cams, feats, depth_range = synthetic_scene(rng, h=h, w=w)
    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(7))
    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(h, w, jnp.asarray(intr), jnp.asarray(c2w))
    batch = {
        "ray_o": rays_o,
        "ray_d": rays_d,
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }
    cfg = RenderConfig(n_samples=8, n_importance=4, det=True, backbone="ibrnet")
    return bundle, batch, cfg, src_rgbs, src_cams, feats, (h, w)


def test_image_shapes_and_chunk_invariance(rng):
    bundle, batch, cfg, src_rgbs, src_cams, feats, (h, w) = _setup(rng)
    out1 = render_single_image(
        bundle.render_params, bundle.modules, batch, feats, cfg, h, w,
        src_rgbs, src_cams, chunk_size=128,
    )
    out2 = render_single_image(
        bundle.render_params, bundle.modules, batch, feats, cfg, h, w,
        src_rgbs, src_cams, chunk_size=509,  # non-divisor: exercises padding
    )
    assert out1["outputs_coarse"]["rgb"].shape == (h, w, 3)
    assert out1["outputs_fine"]["depth"].shape == (h, w)
    np.testing.assert_allclose(
        np.asarray(out1["outputs_fine"]["rgb"]),
        np.asarray(out2["outputs_fine"]["rgb"]),
        rtol=1e-4, atol=1e-5,
    )


def test_sharded_render_matches_single_device(rng):
    bundle, batch, cfg, src_rgbs, src_cams, feats, (h, w) = _setup(rng)
    assert len(jax.devices()) == 8

    ref = render_rays(
        bundle.render_params, bundle.modules, batch, feats, cfg,
        src_rgbs=jnp.asarray(src_rgbs), src_cameras=jnp.asarray(src_cams),
    )

    mesh = get_mesh()
    rs = shard_rays(mesh)
    sharded_batch = dict(batch)
    for k in ("ray_o", "ray_d"):
        sharded_batch[k] = jax.device_put(batch[k], rs)

    fn = jax.jit(
        lambda p, b, sr, sc, f: render_rays(
            p, bundle.modules, b, f, cfg, src_rgbs=sr, src_cameras=sc
        )
    )
    with mesh:
        out = fn(bundle.render_params, sharded_batch, jnp.asarray(src_rgbs),
                 jnp.asarray(src_cams), feats)
    np.testing.assert_allclose(
        np.asarray(out["outputs_fine"]["rgb"]),
        np.asarray(ref["outputs_fine"]["rgb"]),
        rtol=1e-4, atol=1e-5,
    )
