"""Multi-device semantics: a ray-sharded attack step must produce the same
delta update as the single-device step (GSPMD psums the per-shard gradient,
standing in for the reference's DDP all-reduce)."""
import numpy as np
import jax
import jax.numpy as jnp

from helpers import synthetic_scene

from nerfool_tpu.attack.attack import (
    AttackConfig,
    init_attack_state,
    make_attack_step,
)
from nerfool_tpu.models.bundle import create_model
from nerfool_tpu.parallel.mesh import get_mesh, replicate, shard_rays
from nerfool_tpu.render.render_rays import RenderConfig

H, W = 24, 32


def test_sharded_attack_step_matches_single_device(rng):
    assert len(jax.devices()) == 8
    target_cam, src_rgbs, src_cams, _, depth_range = synthetic_scene(
        rng, n_src=3, h=H, w=W
    )
    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(11))
    render_cfg = RenderConfig(n_samples=12, det=True, backbone="ibrnet")
    cfg = AttackConfig(h=H, w=W, n_rand=64, use_adam=True, adam_lr=1e-2)
    target = {
        "camera": jnp.asarray(target_cam),
        "rgb": jnp.asarray(rng.rand(H * W, 3).astype(np.float32)),
        "depth": None,
        "depth_range": jnp.asarray(depth_range),
    }
    src = {
        "rgbs": jnp.asarray(src_rgbs),
        "cameras": jnp.asarray(src_cams),
        "featmaps_clean": None,
    }
    state0 = init_attack_state(jax.random.PRNGKey(1), cfg, src["rgbs"])
    key = jax.random.PRNGKey(2)

    ref_step = jax.jit(make_attack_step(bundle, render_cfg, cfg))
    ref_state, ref_aux = ref_step(state0, target, src, key)

    mesh = get_mesh()
    rs = shard_rays(mesh)
    rep = replicate(mesh)
    sh_step = jax.jit(make_attack_step(bundle, render_cfg, cfg, ray_sharding=rs))
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, rep), t)
    with mesh:
        sh_state, sh_aux = sh_step(put(state0), put(target), put(src), key)

    # view-sharded feature extraction + psum change f32 summation order
    # (~1e-5 relative gradient drift). Adam's first step is sign-like
    # (m/sqrt(v) ~ sign(g)), so near-zero gradient elements may flip; the
    # contract is directional agreement of the update, not bitwise equality.
    np.testing.assert_allclose(
        float(sh_aux["loss"]), float(ref_aux["loss"]), rtol=1e-4
    )
    up_ref = np.asarray(ref_state["delta"] - state0["delta"]).reshape(-1)
    up_sh = np.asarray(sh_state["delta"] - state0["delta"]).reshape(-1)
    cos = float(np.dot(up_ref, up_sh)
                / (np.linalg.norm(up_ref) * np.linalg.norm(up_sh) + 1e-12))
    assert cos > 0.999, cos
    sign_agree = float(np.mean(np.sign(up_ref) == np.sign(up_sh)))
    assert sign_agree > 0.99, sign_agree


def test_sharded_train_step_matches_single_device(rng):
    """Ray-sharded training step == single-device step (the reference's DDP
    gradient all-reduce semantics, train.py:360-363 / ibrnet/model.py:78-96)."""
    from nerfool_tpu.train.trainer import TrainConfig, make_train_step

    assert len(jax.devices()) == 8
    target_cam, src_rgbs, src_cams, _, depth_range = synthetic_scene(
        rng, n_src=3, h=H, w=W
    )
    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(5))
    render_cfg = RenderConfig(n_samples=12, n_importance=0, det=True,
                              backbone="ibrnet")
    cfg = TrainConfig(h=H, w=W, n_rand=64)
    batch = {
        "camera": jnp.asarray(target_cam),
        "rgb": jnp.asarray(rng.rand(H * W, 3).astype(np.float32)),
        "depth_range": jnp.asarray(depth_range),
        "src_rgbs": jnp.asarray(src_rgbs),
        "src_cameras": jnp.asarray(src_cams),
    }
    key = jax.random.PRNGKey(3)

    ref_step, ref_opt = make_train_step(bundle, render_cfg, cfg)
    o0 = ref_opt.init(bundle.params)
    p_ref, _, aux_ref = jax.jit(ref_step)(bundle.params, o0, batch, key)

    mesh = get_mesh()
    sh_step, _ = make_train_step(bundle, render_cfg, cfg,
                                 ray_sharding=shard_rays(mesh))
    rep = replicate(mesh)
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, rep), t)
    with mesh:
        p_sh, _, aux_sh = jax.jit(sh_step)(put(bundle.params), put(o0),
                                           put(batch), key)

    np.testing.assert_allclose(float(aux_sh["loss"]), float(aux_ref["loss"]),
                               rtol=1e-4)
    # parameter updates must agree directionally (Adam first step is
    # sign-like; psum reorders the f32 summation)
    up_ref = np.concatenate([
        (np.asarray(b) - np.asarray(a)).reshape(-1)
        for a, b in zip(jax.tree.leaves(bundle.params), jax.tree.leaves(p_ref))
    ])
    up_sh = np.concatenate([
        (np.asarray(b) - np.asarray(a)).reshape(-1)
        for a, b in zip(jax.tree.leaves(bundle.params), jax.tree.leaves(p_sh))
    ])
    cos = float(np.dot(up_ref, up_sh)
                / (np.linalg.norm(up_ref) * np.linalg.norm(up_sh) + 1e-12))
    assert cos > 0.999, cos
