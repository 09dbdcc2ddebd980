"""Custom-VJP fused ray attention (ops/ra_kernel.fused_ray_attention_ad):
gradients must match XLA autodiff through the plain RayAttention module —
both the attention output AND the attn0 (compositing weights) cotangent
paths, since the GNT attack losses differentiate through rgb and depth."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfool_tpu.models.gnt import RayAttention


def _loss(params, x, fused):
    mod = RayAttention(64, fused=fused)
    out, attn = mod.apply({"params": params}, x, ret_attn=True)
    if not fused:  # plain path returns the full [R,H,S,S] map
        attn = jnp.mean(attn, axis=1)[:, 0]
    s = x.shape[1]
    w = jnp.arange(s, dtype=x.dtype)
    return jnp.sum(jnp.sin(out)) + jnp.sum(attn * w)


def test_ra_vjp_matches_autodiff():
    rng = np.random.RandomState(0)
    r, s, d = 3, 10, 64  # s not a multiple of 8: exercises key-pad masking
    x = jnp.asarray(rng.randn(r, s, d), jnp.float32)
    mod = RayAttention(d)
    params = mod.init(jax.random.PRNGKey(1), x, ret_attn=True)["params"]

    g_ref = jax.grad(_loss, argnums=(0, 1))(params, x, False)
    g_fus = jax.grad(_loss, argnums=(0, 1))(params, x, True)

    ref_flat = jax.tree_util.tree_leaves_with_path(g_ref[0])
    fus_map = {jax.tree_util.keystr(p): v
               for p, v in jax.tree_util.tree_leaves_with_path(g_fus[0])}
    for path, ref_leaf in ref_flat:
        got = fus_map[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref_leaf),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=jax.tree_util.keystr(path))
    np.testing.assert_allclose(np.asarray(g_fus[1]), np.asarray(g_ref[1]),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_gnt_attack_step_fused_matches_plain():
    # one full DIFFERENTIATED attack step with the fused ray-attention VJP
    # vs the XLA path: loss and delta update must agree (the
    # --gnt_fused_attack gate, engine._attack_render_cfg)
    import dataclasses

    from helpers import synthetic_scene
    from nerfool_tpu.attack.attack import (AttackConfig, init_attack_state,
                                           make_attack_step)
    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.render.render_rays import RenderConfig

    rng = np.random.RandomState(3)
    h, w = 16, 20
    target_cam, src_rgbs, src_cams, _, depth_range = synthetic_scene(
        rng, n_src=3, h=h, w=w)
    bundle = create_model(backbone="gnt", rng_key=jax.random.PRNGKey(5),
                          trans_depth=2, single_net=True)
    base = RenderConfig(n_samples=10, det=True, backbone="gnt",
                        single_net=True, ret_alpha=True,
                        stop_camera_grad=False)
    cfg = AttackConfig(h=h, w=w, n_rand=32, use_adam=True, adam_lr=1e-2)
    target = {
        "camera": jnp.asarray(target_cam),
        "rgb": jnp.asarray(rng.rand(h * w, 3).astype(np.float32)),
        "depth": None,
        "depth_range": jnp.asarray(depth_range),
    }
    src = {"rgbs": jnp.asarray(src_rgbs), "cameras": jnp.asarray(src_cams),
           "featmaps_clean": None}
    state0 = init_attack_state(jax.random.PRNGKey(1), cfg, src["rgbs"])
    key = jax.random.PRNGKey(2)

    outs = {}
    for fused in (False, True):
        rcfg = dataclasses.replace(base, gnt_fused_attn=fused)
        step = jax.jit(make_attack_step(bundle, rcfg, cfg))
        state, aux = step(state0, target, src, key)
        outs[fused] = (float(aux["loss"]),
                       np.asarray(state["delta"] - state0["delta"]))
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-5)
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=2e-5)


def test_ra_vjp_out_only_cotangent():
    # gradient flowing ONLY through the attention output (attn0 unused):
    # the zero attn0 cotangent must not perturb dx
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 64), jnp.float32)
    mod = RayAttention(64)
    params = mod.init(jax.random.PRNGKey(2), x, ret_attn=True)["params"]

    def loss(xx, fused):
        out, _ = RayAttention(64, fused=fused).apply(
            {"params": params}, xx, ret_attn=True)
        return jnp.sum(out * out)

    g_ref = jax.grad(loss)(x, False)
    g_fus = jax.grad(loss)(x, True)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               atol=2e-4, rtol=2e-4)
