"""Interleaved A/B of the attack step's gather engine: per-tap vs per-ray
segment-patch gather (SPG), at a given source-view count. Justifies the
engine's view-count auto-select threshold (--attack_spg_min_views,
attack/engine.py _attack_render_cfg) with same-relay-window measurements.

Usage: python scripts/probe_attack_gather.py [V]    (default 4; run at 4 and
10 for the crossover table — BENCH_* env knobs of bench.py apply)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H = int(os.environ.get("BENCH_H", 756))
W = int(os.environ.get("BENCH_W", 1008))
N_SAMPLES = int(os.environ.get("BENCH_NSAMPLES", 64))
N_IMPORTANCE = int(os.environ.get("BENCH_NIMPORTANCE", 64))
N_RAND = int(os.environ.get("BENCH_NRAND", 512))
ITERS = int(os.environ.get("BENCH_ATTACK_ITERS", 10))


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
    from nerfool_tpu.render.render_rays import RenderConfig

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(f"devices: {jax.devices()}  V={v} n_rand={N_RAND}", flush=True)
    rng = np.random.RandomState(0)
    cams, depth_range = build_scene()
    target_cam, src_cams = cams[0], cams[1:1 + v]
    src_rgbs = jnp.asarray(rng.rand(v, H, W, 3).astype(np.float32))
    src_cams_j = jnp.asarray(src_cams)

    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(0))
    fshape = jax.eval_shape(
        lambda x: bundle.extract_features(x),
        jax.ShapeDtypeStruct((1, H, W, 3), np.float32))[0].shape

    base = RenderConfig(n_samples=N_SAMPLES, n_importance=N_IMPORTANCE,
                        det=True, inv_uniform=True, backbone="ibrnet",
                        stop_camera_grad=True, compute_dtype="float32")
    spg_specs = plan_attack_specs(
        target_cam[None], src_cams, depth_range.reshape(-1), (H, W),
        fshape[1:3])
    cfgs = {"tap": base,
            "spg": dataclasses.replace(base, spg_specs=spg_specs)}
    print(f"SPG: feat groups={spg_specs[0].groups} rgb={spg_specs[1].groups}",
          flush=True)

    acfg = AttackConfig(h=H, w=W, n_rand=N_RAND, use_adam=True, adam_lr=1e-3,
                        epsilon=8.0)
    target = {
        "camera": jnp.asarray(target_cam),
        "rgb": jnp.asarray(rng.rand(H * W, 3).astype(np.float32)),
        "depth": None,
        "depth_range": jnp.asarray(depth_range),
    }
    src = {"rgbs": src_rgbs, "cameras": src_cams_j, "featmaps_clean": None}

    steps, states = {}, {}
    for name, cfg in cfgs.items():
        steps[name] = jax.jit(make_attack_step(bundle, cfg, acfg))
        states[name] = init_attack_state(jax.random.PRNGKey(1), acfg,
                                         src_rgbs)
        t0 = time.perf_counter()
        states[name], aux = steps[name](states[name], target, src,
                                        jax.random.PRNGKey(2))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s "
              f"loss={float(aux['loss']):.4f}", flush=True)

    keys = jax.random.split(jax.random.PRNGKey(3), 3 * ITERS)
    times = {k: [] for k in cfgs}
    for rep in range(3):
        for name in cfgs if rep % 2 == 0 else reversed(list(cfgs)):
            t0 = time.perf_counter()
            for i in range(ITERS):
                states[name], _ = steps[name](states[name], target, src,
                                              keys[rep * ITERS + i])
            float(jnp.sum(states[name]["delta"]))
            times[name].append((time.perf_counter() - t0) / ITERS)
    for name, ts in times.items():
        med = sorted(ts)[1]
        print(f"V={v} {name}: {med*1e3:.1f} ms/iter (median of 3x{ITERS}) "
              "all=" + " ".join(f"{t*1e3:.0f}" for t in ts), flush=True)


if __name__ == "__main__":
    main()
