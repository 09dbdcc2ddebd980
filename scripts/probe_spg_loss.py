#!/usr/bin/env python
"""Root-cause probe for the round-2 SPG first-loss anomaly (BENCH_NOTES.md):
on TPU, the attack step with --attack_spg read loss 0.1837 where the per-tap
path and every other variant read 0.1766-0.1768 — a 4% split that CPU
exactness tests (tests/test_spg.py) do not show.

Protocol (all on the live device, bench.py's flagship attack workload):
  1. per-tap attack step 1 loss            (baseline)
  2. SPG attack step 1 loss                (same state, same key)
  3. per-tap with delta jittered by 1e-8   (chaos floor control)
  4. forward-only render_rays diff on one pinned ray batch, per-tap vs SPG:
     max |rgb diff|, #rays affected, and the same for fine level
If (2) splits from (1) far beyond (3), the gather plan drops/mangles taps on
this backend; (4) localizes it to the forward gather. If (2)~(1) within the
(3) floor, the round-2 reading was relay run-to-run variance.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BACKBONE = os.environ.get("BENCH_BACKBONE", "ibrnet")
H = int(os.environ.get("BENCH_H", 756))
W = int(os.environ.get("BENCH_W", 1008))
N_SRC = int(os.environ.get("BENCH_SRC", 10))
N_SAMPLES = int(os.environ.get("BENCH_NSAMPLES", 64))
N_IMPORTANCE = int(os.environ.get("BENCH_NIMPORTANCE", 64))
N_RAND = int(os.environ.get("BENCH_NRAND", 512))
ATTACK_SRC = int(os.environ.get("BENCH_ATTACK_SRC", 4))


def main():
    from bench import build_scene

    from nerfool_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerfool_tpu.attack.attack import (
        AttackConfig, init_attack_state, make_attack_step,
    )
    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.ops.spg import plan_attack_specs
    from nerfool_tpu.render.render_rays import RenderConfig, render_rays
    from nerfool_tpu.utils.cameras import get_rays

    print("devices:", jax.devices())
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    rng = np.random.RandomState(0)
    cams, depth_range = build_scene()
    target_cam, src_cams = cams[0], cams[1:]
    src_rgbs = rng.rand(N_SRC, H, W, 3).astype(np.float32)

    bundle = create_model(backbone=BACKBONE, rng_key=jax.random.PRNGKey(0),
                          trans_depth=8, single_net=BACKBONE == "gnt")
    base_cfg = RenderConfig(
        n_samples=N_SAMPLES, n_importance=N_IMPORTANCE, det=True,
        inv_uniform=True, backbone=BACKBONE, single_net=BACKBONE == "gnt",
        ret_alpha=BACKBONE == "gnt", stop_camera_grad=BACKBONE == "ibrnet",
        compute_dtype="float32",
    )
    feats_shape_probe = jax.eval_shape(
        lambda p, x: bundle.feature_net.apply({"params": p}, x),
        bundle.params["feature_net"],
        jax.ShapeDtypeStruct((N_SRC, H, W, 3), jnp.float32))
    fm_hw = feats_shape_probe[0].shape[1:3]
    spg_specs = plan_attack_specs(
        target_cam[None], src_cams[:ATTACK_SRC], depth_range.reshape(-1),
        (H, W), fm_hw,
    )
    cfg_pt = base_cfg
    cfg_spg = dataclasses.replace(base_cfg, spg_specs=spg_specs)
    print(f"SPG: feat p={spg_specs[0].p} groups={spg_specs[0].groups} | "
          f"rgb p={spg_specs[1].p} groups={spg_specs[1].groups}")

    acfg = AttackConfig(h=H, w=W, n_rand=N_RAND, use_adam=True, adam_lr=1e-3,
                        epsilon=8.0)
    target = {
        "camera": jnp.asarray(target_cam),
        "rgb": jnp.asarray(rng.rand(H * W, 3).astype(np.float32)),
        "depth": None,
        "depth_range": jnp.asarray(depth_range),
    }
    a_rgbs = jnp.asarray(src_rgbs[:ATTACK_SRC])
    a_cams = jnp.asarray(src_cams[:ATTACK_SRC])
    src = {"rgbs": a_rgbs, "cameras": a_cams, "featmaps_clean": None}
    state0 = init_attack_state(jax.random.PRNGKey(1), acfg, a_rgbs)
    key = jax.random.PRNGKey(2)

    losses = {}
    for name, cfg in (("per-tap", cfg_pt), ("spg", cfg_spg)):
        step = jax.jit(make_attack_step(bundle, cfg, acfg))
        t0 = time.perf_counter()
        _, aux = step(state0, target, src, key)
        losses[name] = float(aux["loss"])
        print(f"{name}: step-1 loss={losses[name]:.6f} "
              f"(compile+run {time.perf_counter()-t0:.1f}s)")
    # repeat runs: is the loss stable run to run on this backend?
    step_pt = jax.jit(make_attack_step(bundle, cfg_pt, acfg))
    step_spg = jax.jit(make_attack_step(bundle, cfg_spg, acfg))
    for name, step in (("per-tap", step_pt), ("spg", step_spg)):
        vals = [float(step(state0, target, src, key)[1]["loss"])
                for _ in range(3)]
        print(f"{name} repeats: {vals}")
    # chaos floor: per-tap with 1e-8 delta jitter
    state_j = dict(state0)
    state_j["delta"] = state0["delta"] + 1e-8 * jax.random.normal(
        jax.random.PRNGKey(9), state0["delta"].shape)
    _, aux_j = step_pt(state_j, target, src, key)
    floor = abs(float(aux_j["loss"]) - losses["per-tap"])
    split = abs(losses["spg"] - losses["per-tap"])
    print(f"chaos floor (1e-8 jitter): {floor:.3e}; spg split: {split:.3e}")

    # forward-only render diff on a pinned ray batch
    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
    sel = np.random.RandomState(3).choice(H * W, N_RAND, replace=False)
    batch = {"ray_o": rays_o[jnp.asarray(sel)], "ray_d": rays_d[jnp.asarray(sel)],
             "depth_range": jnp.asarray(depth_range),
             "camera": jnp.asarray(target_cam[None])}
    extract = jax.jit(lambda p, x: bundle.feature_net.apply({"params": p}, x))
    feats = extract(bundle.params["feature_net"],
                    a_rgbs + state0["delta"].astype(a_rgbs.dtype))

    render_pt = jax.jit(lambda b, f: render_rays(
        bundle.render_params, bundle.modules, b, f, cfg_pt,
        src_rgbs=a_rgbs, src_cameras=a_cams))
    render_spg = jax.jit(lambda b, f: render_rays(
        bundle.render_params, bundle.modules, b, f, cfg_spg,
        src_rgbs=a_rgbs, src_cameras=a_cams))
    out_pt = render_pt(batch, feats)
    out_spg = render_spg(batch, feats)
    for level in ("outputs_coarse", "outputs_fine"):
        if out_pt[level] is None:
            continue
        a = np.asarray(out_pt[level]["rgb"])
        b = np.asarray(out_spg[level]["rgb"])
        d = np.abs(a - b).max(axis=-1)
        print(f"{level}: max|rgb diff|={d.max():.3e}, "
              f"rays>1e-5: {(d > 1e-5).sum()}/{d.shape[0]}, "
              f"rays>1e-3: {(d > 1e-3).sum()}")

    verdict = ("RUN-VARIANCE (split within ~chaos floor)"
               if split < 50 * max(floor, 1e-7) else
               "REAL NUMERIC SPLIT — see forward diff above")
    print("VERDICT:", verdict)


if __name__ == "__main__":
    main()
