"""Fused Pallas IBRNet aggregation vs the flax reference implementation
(interpret mode on CPU; the same kernel compiles for TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from nerfool_tpu.models.ibrnet import IBRNetAggregator
from nerfool_tpu.ops.ibrnet_kernel import ibrnet_aggregate_pallas


def _inputs(rng, v=4, r=8, s=16, c=35):
    rgb_feat = rng.rand(v, r, s, c).astype(np.float32)
    d = rng.randn(v, r, s, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dot = rng.uniform(0.7, 1.0, (v, r, s, 1)).astype(np.float32)
    ray_diff = np.concatenate([d, dot], axis=-1)
    mask = (rng.rand(v, r, s, 1) > 0.2).astype(np.float32)
    return jnp.asarray(rgb_feat), jnp.asarray(ray_diff), jnp.asarray(mask)


def test_fused_kernel_matches_flax(rng):
    rgb_feat, ray_diff, mask = _inputs(rng)
    module = IBRNetAggregator(in_feat_ch=32)
    params = module.init(jax.random.PRNGKey(0), rgb_feat, ray_diff, mask)["params"]
    ref = np.asarray(module.apply({"params": params}, rgb_feat, ray_diff, mask))
    out = np.asarray(
        ibrnet_aggregate_pallas(params, rgb_feat, ray_diff, mask,
                                ray_block=4, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_fused_kernel_no_anti_alias(rng):
    rgb_feat, ray_diff, mask = _inputs(rng)
    module = IBRNetAggregator(in_feat_ch=32, anti_alias_pooling=False)
    params = module.init(jax.random.PRNGKey(1), rgb_feat, ray_diff, mask)["params"]
    ref = np.asarray(module.apply({"params": params}, rgb_feat, ray_diff, mask))
    out = np.asarray(
        ibrnet_aggregate_pallas(params, rgb_feat, ray_diff, mask,
                                anti_alias_pooling=False, ray_block=8,
                                interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_render_rays_with_pallas_matches(rng):
    """render_rays with use_pallas matches the XLA path end to end (interpret
    mode can't thread through RenderConfig, so force interpret globally)."""
    import sys
    sys.path.insert(0, "tests")
    from helpers import synthetic_scene
    from jax.experimental.pallas import tpu as pltpu

    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.render.render_rays import RenderConfig, render_rays
    from nerfool_tpu.utils.cameras import get_rays
    import dataclasses

    target_cam, src_rgbs, src_cams, feats, depth_range = synthetic_scene(rng, h=24, w=32)
    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(3))
    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(24, 32, jnp.asarray(intr), jnp.asarray(c2w))
    batch = {
        "ray_o": rays_o[:32], "ray_d": rays_d[:32],
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }
    cfg = RenderConfig(n_samples=16, n_importance=0, det=True, backbone="ibrnet")
    ref = render_rays(bundle.render_params, bundle.modules, batch, feats, cfg,
                      src_rgbs=jnp.asarray(src_rgbs), src_cameras=jnp.asarray(src_cams))
    cfg_p = dataclasses.replace(cfg, use_pallas=True, pallas_ray_block=8)
    with pltpu.force_tpu_interpret_mode():
        out = render_rays(bundle.render_params, bundle.modules, batch, feats, cfg_p,
                          src_rgbs=jnp.asarray(src_rgbs),
                          src_cameras=jnp.asarray(src_cams))
    np.testing.assert_allclose(
        np.asarray(out["outputs_coarse"]["rgb"]),
        np.asarray(ref["outputs_coarse"]["rgb"]), rtol=1e-4, atol=1e-5,
    )


def test_gnt_fused_kernel_matches_flax(rng):
    """Fused GNT transformer kernel vs the flax GNTAggregator (interpret)."""
    from nerfool_tpu.models.gnt import GNTAggregator
    from nerfool_tpu.ops.gnt_kernel import gnt_aggregate_pallas

    v, r, s, c = 3, 8, 12, 35
    rgb_feat, ray_diff, mask = _inputs(rng, v=v, r=r, s=s, c=c)
    pts = jnp.asarray(rng.randn(r, s, 3).astype(np.float32))
    ray_d = jnp.asarray(rng.randn(r, 3).astype(np.float32))
    for ret_alpha, depth in ((True, 2), (False, 3), (True, 4)):
        module = GNTAggregator(in_feat_ch=32, netwidth=64, trans_depth=depth,
                               ret_alpha=ret_alpha)
        params = module.init(jax.random.PRNGKey(0), rgb_feat, ray_diff, mask,
                             pts, ray_d)["params"]
        ref = np.asarray(module.apply({"params": params}, rgb_feat, ray_diff,
                                      mask, pts, ray_d))
        out = np.asarray(gnt_aggregate_pallas(
            params, rgb_feat, ray_diff, mask, pts, ray_d,
            trans_depth=depth, ret_alpha=ret_alpha, ray_block=4,
            interpret=True,
        ))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
