"""Attack engine tests: eps-ball invariants, ascent behavior on both update
rules, camera-pose perturbation bounds, and a full-pipeline gradient-parity
check against the reference (torch autograd through ResUNet + renderer)."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import synthetic_scene

from nerfool_tpu.attack.attack import (
    AttackConfig,
    init_attack_state,
    make_attack_step,
    run_attack_scan,
    select_ray_indices,
)
from nerfool_tpu.models.bundle import create_model
from nerfool_tpu.render.render_rays import RenderConfig
from nerfool_tpu.utils.cameras import get_rays

REFERENCE = "/root/reference"
if os.path.isdir(REFERENCE):
    sys.path.insert(0, REFERENCE)

H, W = 24, 32


def _attack_setup(rng, **cfg_overrides):
    target_cam, src_rgbs, src_cams, _, depth_range = synthetic_scene(rng, n_src=3, h=H, w=W)
    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(11))
    render_cfg = RenderConfig(n_samples=12, n_importance=0, det=True, backbone="ibrnet")
    cfg = AttackConfig(h=H, w=W, n_rand=cfg_overrides.pop("n_rand", 32),
                       adv_iters=3, **cfg_overrides)
    feats_clean = bundle.extract_features(jnp.asarray(src_rgbs))
    target = {
        "camera": jnp.asarray(target_cam),
        "rgb": jnp.asarray(rng.rand(H * W, 3).astype(np.float32)),
        "depth": None,
        "depth_range": jnp.asarray(depth_range),
    }
    src = {
        "rgbs": jnp.asarray(src_rgbs),
        "cameras": jnp.asarray(src_cams),
        "featmaps_clean": feats_clean,
    }
    return bundle, render_cfg, cfg, target, src


def test_select_ray_indices_modes():
    key = jax.random.PRNGKey(0)
    cfg = AttackConfig(h=H, w=W, n_rand=64)
    sel = np.asarray(select_ray_indices(key, cfg))
    assert sel.shape == (64,)
    assert len(np.unique(sel)) == 64
    assert sel.min() >= 0 and sel.max() < H * W

    cfg_c = AttackConfig(h=H, w=W, n_rand=32, sample_mode="center", center_ratio=0.5)
    sel = np.asarray(select_ray_indices(key, cfg_c))
    rows, cols = sel // W, sel % W
    assert rows.min() >= H // 4 and rows.max() < H - H // 4
    assert cols.min() >= W // 4 and cols.max() < W - W // 4

    cfg_p = AttackConfig(h=H, w=W, n_rand=64, use_patch_sampling=True, patch_size=4)
    sel = np.asarray(select_ray_indices(key, cfg_p))
    assert sel.shape == (64,)
    # first patch is a contiguous 4x4 block, row offset varying fastest
    rows, cols = sel[:16] // W, sel[:16] % W
    assert np.array_equal(rows - rows[0], np.tile(np.arange(4), 4))
    assert np.array_equal(cols - cols[0], np.repeat(np.arange(4), 4))


def test_pgd_attack_ascends_and_stays_in_ball(rng):
    bundle, render_cfg, cfg, target, src = _attack_setup(rng, epsilon=8.0, adv_lr=2.0)
    step = jax.jit(make_attack_step(bundle, render_cfg, cfg))
    state = init_attack_state(jax.random.PRNGKey(1), cfg, src["rgbs"])

    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(6):
        key, k = jax.random.split(key)
        state, aux = step(state, target, src, k)
        losses.append(float(aux["loss"]))
    delta = np.asarray(state["delta"])
    eps = 8.0 / 255.0
    assert np.all(np.abs(delta) <= eps + 1e-6)
    clean = np.asarray(src["rgbs"])
    assert np.all(clean + delta >= -1e-6) and np.all(clean + delta <= 1 + 1e-6)
    # PGD ascent: loss at the end above the start
    assert np.mean(losses[-2:]) > losses[0]


def test_adam_attack_scan(rng):
    # n_rand = every pixel -> the objective is deterministic regardless of the
    # per-iteration ray keys, so Adam ascent must make net progress
    bundle, render_cfg, cfg, target, src = _attack_setup(
        rng, use_adam=True, adam_lr=5e-3, lr_step_size=100, lr_gamma=1.0,
        n_rand=H * W,
    )
    step = make_attack_step(bundle, render_cfg, cfg)
    state0 = init_attack_state(jax.random.PRNGKey(1), cfg, src["rgbs"])
    state, aux = jax.jit(
        lambda s, k: run_attack_scan(step, s, target, src, k, 10)
    )(state0, jax.random.PRNGKey(3))
    assert aux["loss"].shape == (10,)
    assert int(state["step"]) == 10
    losses = np.asarray(aux["loss"])
    assert losses[-1] > losses[0], losses


def test_camera_perturbation_bounds(rng):
    bundle, render_cfg, cfg, target, src = _attack_setup(
        rng, perturb_camera=True, rot_epsilon=5.0, trans_epsilon=0.05, adv_lr=2.0
    )
    step = jax.jit(make_attack_step(bundle, render_cfg, cfg))
    state = init_attack_state(jax.random.PRNGKey(1), cfg, src["rgbs"])
    key = jax.random.PRNGKey(4)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, _ = step(state, target, src, k)
    rot = np.asarray(state["rot"])
    trans = np.asarray(state["trans"])
    assert np.all(np.abs(rot) <= 5.0 / 180 * np.pi + 1e-6)
    assert np.all(np.abs(trans) <= 0.05 + 1e-6)
    # camera grads actually flowed (sign-PGD moves params to the boundary fast)
    assert np.any(rot != 0) and np.any(trans != 0)


def test_pcgrad_runs(rng):
    bundle, render_cfg, cfg, target, src = _attack_setup(
        rng, use_adam=True, adam_lr=1e-2, use_pcgrad=True,
        depth_var_loss=0.1, use_pseudo_gt=True, density_loss=0.5,
    )
    step = jax.jit(make_attack_step(bundle, render_cfg, cfg))
    state = init_attack_state(jax.random.PRNGKey(1), cfg, src["rgbs"])
    state, aux = step(state, target, src, jax.random.PRNGKey(5))
    assert set(aux) >= {"loss", "rgb", "density", "depth_var"}
    assert np.isfinite(float(aux["loss"]))


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not available")
@pytest.mark.slow
def test_gradient_parity_with_reference(rng):
    """d(loss)/d(delta) through feature net + renderer matches torch autograd."""
    import torch
    from types import SimpleNamespace
    from ibrnet.feature_network import ResUNet as TorchResUNet
    from ibrnet.mlp_network import IBRNet as TorchIBRNet
    from ibrnet.projection import Projector as TorchProjector
    from ibrnet.render_ray import render_rays as torch_render_rays

    from nerfool_tpu.models.bundle import ModelBundle
    from nerfool_tpu.models.ibrnet import IBRNetAggregator
    from nerfool_tpu.models.resunet import ResUNet
    from nerfool_tpu.models.torch_port import (
        ibrnet_params_from_torch,
        resunet_params_from_torch,
    )
    from nerfool_tpu.render.render_rays import render_rays
    from nerfool_tpu.attack.losses import rgb_criterion

    torch.manual_seed(9)
    target_cam, src_rgbs, src_cams, _, depth_range = synthetic_scene(rng, n_src=3, h=H, w=W)

    tm_feat = TorchResUNet(coarse_out_ch=32, fine_out_ch=32).eval()
    args = SimpleNamespace(anti_alias_pooling=1)
    tm_net = TorchIBRNet(args, in_feat_ch=32, n_samples=12).eval()

    params = {
        "feature_net": resunet_params_from_torch(tm_feat.state_dict()),
        "net_coarse": ibrnet_params_from_torch(tm_net.state_dict()),
    }
    bundle = ModelBundle(
        backbone="ibrnet",
        feature_net=ResUNet(),
        net_coarse=IBRNetAggregator(in_feat_ch=32),
        net_fine=None,
        params=params,
        remat_features=True,
    )
    cfg = RenderConfig(n_samples=12, n_importance=0, det=True, backbone="ibrnet")

    eps = 8.0 / 255
    delta0 = (rng.rand(*src_rgbs.shape).astype(np.float32) * 2 - 1) * eps
    sel = rng.choice(H * W, 20, replace=False)
    gt_rgb = rng.rand(20, 3).astype(np.float32)

    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
    rays_o = np.asarray(rays_o)[sel]
    rays_d = np.asarray(rays_d)[sel]

    # --- torch side
    t_delta = torch.from_numpy(delta0).requires_grad_(True)
    t_src = torch.from_numpy(src_rgbs)
    featmaps = tm_feat((t_src + t_delta).permute(0, 3, 1, 2))
    t_batch = {
        "ray_o": torch.from_numpy(rays_o),
        "ray_d": torch.from_numpy(rays_d),
        "depth_range": torch.from_numpy(depth_range),
        "camera": torch.from_numpy(target_cam[None]),
        "src_rgbs": t_src[None],
        "src_cameras": torch.from_numpy(src_cams)[None],
    }
    t_model = SimpleNamespace(net_coarse=tm_net, net_fine=None)
    ret = torch_render_rays(t_batch, t_model, list(featmaps), TorchProjector("cpu"),
                            N_samples=12, det=True)
    out = ret["outputs_coarse"]
    mask = out["mask"].float()
    loss_t = ((out["rgb"] - torch.from_numpy(gt_rgb)) ** 2 * mask.unsqueeze(-1)).sum() / (
        mask.sum() * 3 + 1e-6
    )
    loss_t.backward()
    ref_grad = t_delta.grad.numpy()

    # --- jax side
    batch = {
        "ray_o": jnp.asarray(rays_o),
        "ray_d": jnp.asarray(rays_d),
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }

    def loss_fn(delta):
        feats = bundle.extract_features(jnp.asarray(src_rgbs) + delta)
        r = render_rays(
            bundle.render_params, bundle.modules, batch, feats, cfg,
            src_rgbs=jnp.asarray(src_rgbs), src_cameras=jnp.asarray(src_cams),
        )
        return rgb_criterion(r["outputs_coarse"], jnp.asarray(gt_rgb))

    loss_j, grad_j = jax.value_and_grad(loss_fn)(jnp.asarray(delta0))

    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)
    # In float64 this pipeline's gradient matches torch to ~1e-8 relative
    # (verified); in f32 the deep InstanceNorm backward amplifies rounding, so
    # the f32 check is directional: cosine + sign agreement (what sign-PGD and
    # Adam actually consume).
    g = np.asarray(grad_j).ravel()
    r = ref_grad.ravel()
    cosine = np.dot(g, r) / (np.linalg.norm(g) * np.linalg.norm(r) + 1e-12)
    sign_agree = np.mean(np.sign(g) == np.sign(r))
    assert cosine > 0.99, cosine
    assert sign_agree > 0.9, sign_agree


@pytest.mark.slow
def test_warp_losses_run(rng):
    """depth-consistency + camera-consistency terms compile and are finite."""
    bundle, render_cfg, cfg0, target, src = _attack_setup(rng)
    import dataclasses
    cfg = dataclasses.replace(
        cfg0, depth_consistency_loss=0.5, camera_consistency_loss=0.5,
        cam_src2tar=1.0, cam_tar2src=1.0, cam_depth=1.0, use_adam=True,
        adam_lr=1e-2, perturb_camera=True,
    )
    v = src["rgbs"].shape[0]
    src = dict(src, depths=jnp.asarray(
        (np.random.RandomState(0).rand(v, H, W) * 2 + 3).astype(np.float32)))
    target = dict(
        target,
        depth=jnp.asarray((np.random.RandomState(1).rand(H * W) * 2 + 3).astype(np.float32)),
        depth_full=jnp.asarray((np.random.RandomState(2).rand(H * W) * 2 + 3).astype(np.float32)),
    )
    step = jax.jit(make_attack_step(bundle, render_cfg, cfg))
    state = init_attack_state(jax.random.PRNGKey(1), cfg, src["rgbs"])
    state, aux = step(state, target, src, jax.random.PRNGKey(6))
    assert np.isfinite(float(aux["loss"]))
    assert "depth_cons" in aux and "camera_cons" in aux
    assert np.isfinite(float(aux["depth_cons"])) and np.isfinite(float(aux["camera_cons"]))


@pytest.mark.slow
def test_purification_descends(rng):
    """Purification (defense) minimizes its objective and respects its eps-ball."""
    from nerfool_tpu.attack.purify import PurifyConfig, make_purify_step

    bundle, render_cfg, acfg, target, src = _attack_setup(rng)
    # lr small enough that Adam's sign-like first steps don't overshoot on the
    # tiny-image InstanceNorm landscape (gradient verified descent-correct by
    # finite differences; at production scale the reference lr 1e-3 is fine)
    cfg = PurifyConfig(h=H, w=W, purif_epsilon=8.0, adam_lr=3e-5, n_rand=H * W)
    delta = jnp.asarray(
        (np.random.RandomState(3).rand(*src["rgbs"].shape).astype(np.float32) * 2 - 1)
        * (8.0 / 255)
    )
    init_state, step = make_purify_step(bundle, render_cfg, cfg)
    state = init_state(jax.random.PRNGKey(0), src["rgbs"], delta)
    step = jax.jit(step)
    losses = []
    # fixed key -> fixed ray subset + view: a deterministic objective, so the
    # Adam defense must strictly make progress
    k = jax.random.PRNGKey(1)
    for _ in range(8):
        state, aux = step(state, target, src, delta, k)
        losses.append(float(aux["loss"]))
    purif = np.asarray(state["purif"])
    assert np.all(np.abs(purif) <= 8.0 / 255 + 1e-6)
    base = np.asarray(src["rgbs"] + delta)
    assert np.all(base + purif >= -1e-6) and np.all(base + purif <= 1 + 1e-6)
    assert losses[-1] < losses[0], losses  # defense descends


@pytest.mark.slow
def test_ds_rgb_depth_consistency_runs(rng):
    """ds_rgb variant: depth consistency rendered at half resolution."""
    import dataclasses
    bundle, render_cfg, cfg0, target, src = _attack_setup(rng)
    cfg = dataclasses.replace(cfg0, depth_consistency_loss=0.5, ds_rgb=True,
                              use_adam=True, adam_lr=1e-2)
    v = src["rgbs"].shape[0]
    # native (half-res) depths
    src = dict(src, depths=jnp.asarray(
        (np.random.RandomState(0).rand(v, H // 2, W // 2) * 2 + 3).astype(np.float32)))
    step = jax.jit(make_attack_step(bundle, render_cfg, cfg))
    state = init_attack_state(jax.random.PRNGKey(1), cfg, src["rgbs"])
    state, aux = step(state, target, src, jax.random.PRNGKey(7))
    assert np.isfinite(float(aux["loss"])) and "depth_cons" in aux


def test_nearest_resize_indices_match_torch():
    """The general resize_factor downsample reads the same source pixels as
    the reference's F.interpolate(mode='nearest') (sample_ray.py:83)."""
    import torch
    import torch.nn.functional as F
    from nerfool_tpu.attack.attack import nearest_resize_indices

    x = torch.arange(48, dtype=torch.float32).reshape(1, 1, 6, 8)
    for rf in (0.5, 0.25, 0.75):
        ref = F.interpolate(x, scale_factor=rf)[0, 0].numpy()
        hh, ww = int(6 * rf), int(8 * rf)
        ri = np.asarray(nearest_resize_indices(hh, 6, rf))
        ci = np.asarray(nearest_resize_indices(ww, 8, rf))
        ours = x[0, 0].numpy()[ri][:, ci]
        np.testing.assert_array_equal(ours, ref)


@pytest.mark.slow
def test_ds_rgb_resize_factor_quarter_runs(rng):
    """ds_rgb with a non-default resize_factor (0.25): the consistency render
    and warp run at quarter resolution against quarter-res depths."""
    import dataclasses
    bundle, render_cfg, cfg0, target, src = _attack_setup(rng)
    cfg = dataclasses.replace(cfg0, depth_consistency_loss=0.5, ds_rgb=True,
                              resize_factor=0.25, n_rand=16,
                              use_adam=True, adam_lr=1e-2)
    v = src["rgbs"].shape[0]
    src = dict(src, depths=jnp.asarray(
        (np.random.RandomState(0).rand(v, H // 4, W // 4) * 2 + 3)
        .astype(np.float32)))
    step = jax.jit(make_attack_step(bundle, render_cfg, cfg))
    state = init_attack_state(jax.random.PRNGKey(1), cfg, src["rgbs"])
    state, aux = step(state, target, src, jax.random.PRNGKey(7))
    assert np.isfinite(float(aux["loss"])) and "depth_cons" in aux


@pytest.mark.slow
def test_bf16_attack_gradient_direction(rng):
    """A bf16-render attack step must produce gradients aligned with the f32
    parity path (sign agreement is what PGD/Adam consume)."""
    import dataclasses

    bundle, render_cfg, cfg, target, src = _attack_setup(rng, n_rand=H * W)
    cfg_bf = dataclasses.replace(render_cfg, compute_dtype="bfloat16")
    k = jax.random.PRNGKey(5)
    grads = []
    for rc in (render_cfg, cfg_bf):
        step = jax.jit(make_attack_step(bundle, rc, cfg))
        state0 = init_attack_state(jax.random.PRNGKey(1), cfg, src["rgbs"])
        _, aux = step(state0, target, src, k)
        assert np.isfinite(float(aux["loss"]))
        grads.append(np.asarray(aux["grad"]).reshape(-1)
                     if "grad" in aux else None)
    if grads[0] is None:  # step doesn't expose grads: compare delta updates
        steps = []
        for rc in (render_cfg, cfg_bf):
            step = jax.jit(make_attack_step(bundle, rc, cfg))
            state0 = init_attack_state(jax.random.PRNGKey(1), cfg, src["rgbs"])
            state1, _ = step(state0, target, src, k)
            steps.append(np.asarray(state1["delta"] - state0["delta"]).reshape(-1))
        g0, g1 = steps
    else:
        g0, g1 = grads
    cos = float(np.dot(g0, g1) / (np.linalg.norm(g0) * np.linalg.norm(g1) + 1e-12))
    assert cos > 0.95, cos


@pytest.mark.slow
def test_bf16_feature_dtype_runs_and_matches_noise_floor(rng):
    """feature_dtype='bfloat16' (experimental speed knob) must run finite end
    to end.  Numerical parity with f32 is NOT asserted: a random-init ResUNet
    is chaotic — a 1e-5 input perturbation in pure f32 already decorrelates the
    featmaps (16 InstanceNorm+residual blocks amplify any noise ~1.6x/block) —
    so random-weight bf16-vs-f32 comparisons measure the net's intrinsic input
    sensitivity, not the precision scheme.  What IS asserted: the bf16 path's
    deviation stays within the net's own f32 input-noise envelope (i.e. the
    implementation adds no error beyond intrinsic sensitivity), and the attack
    step stays finite and inside the eps ball."""
    target_cam, src_rgbs, src_cams, _, depth_range = synthetic_scene(
        rng, n_src=3, h=H, w=W)
    b32 = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(11))
    bbf = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(11),
                       feature_dtype="bfloat16")
    x = jnp.asarray(src_rgbs)
    f32c, _ = b32.extract_features(x)
    fbfc, _ = bbf.extract_features(x)
    assert fbfc.dtype == jnp.float32  # featmaps come back f32 for the tables
    assert bool(jnp.all(jnp.isfinite(fbfc)))
    # intrinsic-sensitivity envelope: f32 forward under tiny input noise
    xn = x + 2e-3 * jax.random.normal(jax.random.PRNGKey(3), x.shape)
    fnc, _ = b32.extract_features(xn)
    env = float(jnp.max(jnp.abs(f32c - fnc)))
    err = float(jnp.max(jnp.abs(f32c - fbfc)))
    assert err < 3.0 * max(env, 1e-3), (err, env)

    render_cfg = RenderConfig(n_samples=12, n_importance=0, det=True,
                              backbone="ibrnet")
    cfg = AttackConfig(h=H, w=W, n_rand=32, adv_iters=1, use_adam=True,
                       adam_lr=1e-3)
    target = {
        "camera": jnp.asarray(target_cam),
        "rgb": jnp.asarray(rng.rand(H * W, 3).astype(np.float32)),
        "depth": None,
        "depth_range": jnp.asarray(depth_range),
    }
    src = {"rgbs": x, "cameras": jnp.asarray(src_cams), "featmaps_clean": None}
    step = jax.jit(make_attack_step(bbf, render_cfg, cfg))
    state0 = init_attack_state(jax.random.PRNGKey(1), cfg, x)
    state1, aux = step(state0, target, src, jax.random.PRNGKey(5))
    assert np.isfinite(float(aux["loss"]))
    assert float(jnp.max(jnp.abs(state1["delta"]))) <= cfg.eps + 1e-6


@pytest.mark.slow
def test_attack_step_spg_matches_per_tap(rng):
    """The attack step with the per-ray segment-patch gather (spg_specs in
    the render config) produces the same loss and delta update as the
    per-tap gather — one full step, same key (f32 reassociation only)."""
    import dataclasses

    from nerfool_tpu.ops.spg import plan_attack_specs

    bundle, render_cfg, cfg, target, src = _attack_setup(
        rng, use_adam=True, adam_lr=1e-3, epsilon=8.0, use_pseudo_gt=True,
        density_loss=0.1, depth_var_loss=0.1,
    )
    render_cfg = dataclasses.replace(render_cfg, n_importance=8)
    feats = bundle.extract_features(src["rgbs"])
    specs = plan_attack_specs(
        np.asarray(target["camera"])[None], np.asarray(src["cameras"]),
        np.asarray(target["depth_range"]).reshape(-1),
        (H, W), np.asarray(feats[0]).shape[1:3],
    )
    rcfg_spg = dataclasses.replace(render_cfg, spg_specs=specs)

    outs = {}
    for name, rc in (("tap", render_cfg), ("spg", rcfg_spg)):
        step = jax.jit(make_attack_step(bundle, rc, cfg))
        state = init_attack_state(jax.random.PRNGKey(1), cfg, src["rgbs"])
        state, aux = step(state, target, src, jax.random.PRNGKey(7))
        outs[name] = (float(aux["loss"]), np.asarray(state["delta"]))

    assert abs(outs["spg"][0] - outs["tap"][0]) < 1e-5 * (
        abs(outs["tap"][0]) + 1e-9), (outs["spg"][0], outs["tap"][0])
    np.testing.assert_allclose(outs["spg"][1], outs["tap"][1],
                               rtol=1e-3, atol=2e-6)
