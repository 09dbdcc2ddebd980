"""Op-profile the GNT-full render with the whole-chain kernel vs the XLA
path in ONE process — locates where the isolated 1.38x aggregator win leaks
end to end (suspect: layout copies at the custom-call boundary).

Usage: python scripts/probe_chain_prof.py   (BENCH_* env knobs of bench.py)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H = int(os.environ.get("BENCH_H", 756))
W = int(os.environ.get("BENCH_W", 1008))
N_SRC = int(os.environ.get("BENCH_SRC", 10))
N_SAMPLES = int(os.environ.get("BENCH_NSAMPLES", 192))
CHUNK = int(os.environ.get("BENCH_CHUNK", 4096))
SEG = int(os.environ.get("BENCH_MAX_SEG", 32768))


def main():
    from bench import build_scene, cached_plan_render_specs
    from profile_render import top_ops_from_xplane

    from nerfool_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.render.render_image import _render_blocked_jit
    from nerfool_tpu.render.render_rays import RenderConfig
    from nerfool_tpu.utils.cameras import get_rays
    from nerfool_tpu.utils.platform import host_key

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    cams, depth_range = build_scene()
    target_cam, src_cams = cams[0], cams[1:]
    src_rgbs = jax.jit(lambda k: jax.random.uniform(
        k, (N_SRC, H, W, 3), jnp.float32))(host_key(42))
    src_cams_j = jnp.asarray(src_cams)

    bundle = create_model(backbone="gnt", rng_key=host_key(0),
                          trans_depth=8, single_net=True)
    extract = jax.jit(
        lambda p, x: bundle.feature_net.apply({"params": p}, x))
    feats = extract(bundle.params["feature_net"], src_rgbs)
    float(jnp.sum(feats[0]))

    base = RenderConfig(n_samples=N_SAMPLES, n_importance=0, det=True,
                        inv_uniform=True, backbone="gnt", single_net=True,
                        ret_alpha=True, stop_camera_grad=False,
                        compute_dtype="bfloat16")
    specs = cached_plan_render_specs(
        target_cam[None], src_cams, depth_range.reshape(-1), (H, W),
        feats[0].shape[1:3], block=(8, 8), n_samples=N_SAMPLES,
        n_importance=0, inv_uniform=True)
    assert specs is not None
    base = dataclasses.replace(base, bspg_specs=specs, bspg_pallas=True)
    cfgs = {0: base, 1: dataclasses.replace(base, gnt_fused_chain=True)}

    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
    bh = bw = 8
    hp, wp = -(-H // bh) * bh, -(-W // bw) * bw
    yy, xx = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    sidx = np.minimum(yy, H - 1) * W + np.minimum(xx, W - 1)
    perm = (sidx.reshape(hp // bh, bh, wp // bw, bw)
            .transpose(0, 2, 1, 3).reshape(-1))
    batch = {
        "ray_o": rays_o[jnp.asarray(perm)][:SEG],
        "ray_d": rays_d[jnp.asarray(perm)][:SEG],
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }

    def run(f):
        ret = _render_blocked_jit(bundle.render_params, bundle.modules,
                                  batch, feats, cfgs[f], src_rgbs,
                                  src_cams_j, CHUNK, None, None)
        return float(jnp.sum(ret["outputs_coarse"]["rgb"]))

    for f in (0, 1):
        t0 = time.perf_counter()
        run(f)
        print(f"chain={f} compile+first: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)

    for f in (0, 1):
        logdir = f"/tmp/chain_trace_f{f}"
        t0 = time.perf_counter()
        with jax.profiler.trace(logdir):
            run(f)
        dt = time.perf_counter() - t0
        print(f"\n== chain={f}: {dt*1e3:.0f} ms ({SEG/dt:,.0f} rays/s) "
              "top self-time ops ==", flush=True)
        rows = top_ops_from_xplane(logdir, k=25)
        if rows is None:
            print("  (no xplane captured)", flush=True)
            continue
        total = sum(r[1] for r in rows)
        for name, us in rows:
            print(f"  {us/1e3:9.1f} ms  {name[-110:]}", flush=True)
        print(f"  (top-25 sum {total/1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
