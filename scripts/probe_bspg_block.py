"""Adjudicate the battery5 BSPG-vs-pertap divergence: render ONE worst block
(64 rays) through (a) per-tap and (b) BSPG on the current backend, plus — in
a CPU subprocess via env — the same two paths off-TPU, and print the rgb
values side by side. The CPU per-tap f32 render is the ground truth (it
matches the reference oracles).

Usage: python scripts/probe_bspg_block.py [block_id]   (default 749)
       JAX_PLATFORMS=cpu python scripts/probe_bspg_block.py [block_id]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H = int(os.environ.get("BENCH_H", 756))
W = int(os.environ.get("BENCH_W", 1008))
N_SRC = int(os.environ.get("BENCH_SRC", 10))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")


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

    block = int(sys.argv[1]) if len(sys.argv) > 1 else 749
    cams, depth_range = build_scene()
    target_cam, src_cams = cams[0], cams[1:]
    src_rgbs = jax.jit(
        lambda k: jax.random.uniform(k, (N_SRC, H, W, 3), jnp.float32)
    )(host_key(42))
    src_cams_j = jnp.asarray(src_cams)
    bundle = create_model(backbone="ibrnet", rng_key=host_key(0))
    base = RenderConfig(n_samples=64, n_importance=64, det=True,
                        inv_uniform=True, backbone="ibrnet",
                        stop_camera_grad=True, compute_dtype=DTYPE)
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
    sel = perm[block * 64:(block + 1) * 64]
    sub = {
        "ray_o": rays_o[jnp.asarray(sel)],
        "ray_d": rays_d[jnp.asarray(sel)],
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }
    print(f"backend={jax.default_backend()} dtype={DTYPE} block={block}",
          flush=True)
    outs = {}
    for name, cfg in (("pertap", base),
                      ("bspg", dataclasses.replace(
                          base, bspg_specs=specs, bspg_pallas=True))):
        ret = _render_blocked_jit(bundle.render_params, bundle.modules, sub,
                                  feats, cfg, src_rgbs, src_cams_j, 64,
                                  None, None)
        outs[name] = np.asarray(jnp.asarray(
            ret["outputs_fine"]["rgb"], jnp.float32))
        outs[name + "_coarse"] = np.asarray(jnp.asarray(
            ret["outputs_coarse"]["rgb"], jnp.float32))
        print(f"{name} done", flush=True)
    dc = np.abs(outs["pertap_coarse"] - outs["bspg_coarse"]).max(axis=-1)
    print(f"COARSE: rays > 1/255: {(dc > 1/255).sum()} / 64, "
          f"max {dc.max():.2e}")
    d = np.abs(outs["pertap"] - outs["bspg"]).max(axis=-1)
    print("rays with diff > 1/255:", int((d > 1 / 255).sum()), "/ 64")
    w = int(np.argmax(d))
    print(f"worst in-block ray {w}: pertap={np.round(outs['pertap'][w], 4)} "
          f"bspg={np.round(outs['bspg'][w], 4)} diff={d[w]:.4f}")
    np.save(f"/tmp/bspg_block{block}_{jax.default_backend()}_{DTYPE}.npy",
            np.stack([outs["pertap"], outs["bspg"]]))
    print("saved /tmp/bspg_block%d_%s_%s.npy"
          % (block, jax.default_backend(), DTYPE))


if __name__ == "__main__":
    main()
