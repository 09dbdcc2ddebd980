"""Diagnose the battery5 bspg_render_bf16 max-diff: where and how many pixels
disagree between the per-tap and BSPG render engines at flagship shapes, on
the current backend. Usage: python scripts/probe_bspg_diff.py [n_blocks]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H = int(os.environ.get("BENCH_H", 756))
W = int(os.environ.get("BENCH_W", 1008))
N_SRC = int(os.environ.get("BENCH_SRC", 10))
CHUNK = int(os.environ.get("BENCH_CHUNK", 4096))


def main():
    from nerfool_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    from bench import build_scene, cached_plan_render_specs

    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.render.render_image import _render_blocked_jit
    from nerfool_tpu.render.render_rays import RenderConfig
    from nerfool_tpu.utils.cameras import get_rays
    from nerfool_tpu.utils.platform import host_key

    seg = int(sys.argv[1]) * 64 if len(sys.argv) > 1 else 131072
    rng = np.random.RandomState(0)
    cams, depth_range = build_scene()
    target_cam, src_cams = cams[0], cams[1:]
    src_rgbs = jax.jit(
        lambda k: jax.random.uniform(k, (N_SRC, H, W, 3), jnp.float32)
    )(host_key(42))
    src_cams_j = jnp.asarray(src_cams)
    bundle = create_model(backbone="ibrnet", rng_key=host_key(0))
    base = RenderConfig(n_samples=64, n_importance=64, det=True,
                        inv_uniform=True, backbone="ibrnet",
                        stop_camera_grad=True, compute_dtype="bfloat16")
    feats = jax.jit(lambda p, x: bundle.feature_net.apply({"params": p}, x))(
        bundle.params["feature_net"], src_rgbs)
    specs = cached_plan_render_specs(
        target_cam[None], src_cams, depth_range.reshape(-1), (H, W),
        feats[0].shape[1:3], block=(8, 8), n_samples=64, n_importance=64,
        inv_uniform=True)
    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
    bh = bw = 8
    hp, wp = -(-H // bh) * bh, -(-W // bw) * bw
    yy, xx = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    sidx = np.minimum(yy, H - 1) * W + np.minimum(xx, W - 1)
    perm = (sidx.reshape(hp // bh, bh, wp // bw, bw)
            .transpose(0, 2, 1, 3).reshape(-1))
    sub = {
        "ray_o": rays_o[jnp.asarray(perm[:seg])],
        "ray_d": rays_d[jnp.asarray(perm[:seg])],
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }
    outs = {}
    masks = {}
    for name, cfg in (("pertap", base),
                      ("bspg", dataclasses.replace(
                          base, bspg_specs=specs, bspg_pallas=True))):
        t0 = time.perf_counter()
        ret = _render_blocked_jit(bundle.render_params, bundle.modules, sub,
                                  feats, cfg, src_rgbs, src_cams_j, CHUNK,
                                  None, None)
        outs[name] = np.asarray(jnp.asarray(
            ret["outputs_fine"]["rgb"], jnp.float32))
        m = ret["outputs_fine"].get("mask")
        masks[name] = None if m is None else np.asarray(m)
        print(f"{name}: {time.perf_counter()-t0:.1f}s", flush=True)
    d = np.abs(outs["pertap"] - outs["bspg"]).max(axis=-1)
    for thr in (1 / 255, 3 / 255, 0.1, 0.5):
        print(f"pixels with diff > {thr:.4f}: {(d > thr).sum()} / {len(d)}")
    bad = np.argsort(-d)[:12]
    print("worst ray idx (block-major pos):", bad.tolist())
    print("block ids:", (bad // 64).tolist())
    print("diffs:", np.round(d[bad], 4).tolist())
    if masks["pertap"] is not None:
        mp, mb = masks["pertap"], masks["bspg"]
        print("mask disagree count:", int((mp != mb).sum()))
        print("worst-ray masks pertap/bspg:",
              mp[bad].tolist(), mb[bad].tolist())
    print("pertap rgb at worst:", np.round(outs["pertap"][bad[0]], 4),
          "bspg:", np.round(outs["bspg"][bad[0]], 4))


if __name__ == "__main__":
    main()
