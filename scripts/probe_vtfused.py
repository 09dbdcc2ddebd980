"""Interleaved A/B of the GNT-full render: XLA view attention vs the fused
Pallas kernel (ops/vt_kernel.py). Both variants compile in one process and
time alternately so every sample pair shares the relay window.

Usage: python scripts/probe_vtfused.py   (BENCH_* env knobs of bench.py)
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
SEG = int(os.environ.get("BENCH_MAX_SEG", 131072))
ROUNDS = int(os.environ.get("PROBE_ROUNDS", 4))


def main():
    from bench import build_scene

    from nerfool_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from nerfool_tpu.models.bundle import create_model
    from bench import cached_plan_render_specs as plan_render_specs
    from nerfool_tpu.render.render_image import _render_blocked_jit
    from nerfool_tpu.render.render_rays import RenderConfig
    from nerfool_tpu.utils.cameras import get_rays

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.RandomState(0)
    cams, depth_range = build_scene()
    target_cam, src_cams = cams[0], cams[1:]
    src_rgbs = jnp.asarray(rng.rand(N_SRC, H, W, 3).astype(np.float32))
    src_cams_j = jnp.asarray(src_cams)

    bundle = create_model(backbone="gnt", rng_key=jax.random.PRNGKey(0),
                          trans_depth=8, single_net=True)
    extract = jax.jit(
        lambda p, x: bundle.feature_net.apply({"params": p}, x))
    feats = extract(bundle.params["feature_net"], src_rgbs)
    float(jnp.sum(feats[0]))  # force

    base = RenderConfig(n_samples=N_SAMPLES, n_importance=0, det=True,
                        inv_uniform=True, backbone="gnt", single_net=True,
                        ret_alpha=True, stop_camera_grad=False,
                        compute_dtype="bfloat16")
    specs = plan_render_specs(
        target_cam[None], src_cams, depth_range.reshape(-1), (H, W),
        feats[0].shape[1:3], block=(8, 8), n_samples=N_SAMPLES,
        n_importance=0, inv_uniform=True)
    assert specs is not None
    import dataclasses
    base = dataclasses.replace(base, bspg_specs=specs, bspg_pallas=True)
    # PROBE_FUSED_VT=1 makes the fused variant also route view attention
    # through vt_kernel (with NERFOOL_VT_LANEPACK=1 for the lane-packed one;
    # read ONCE here at config-build time — the flag is plumbed through
    # RenderConfig, not re-read at trace time). PROBE_FUSED_CHAIN=1 instead
    # A/Bs the whole-chain kernel (ops/chain_kernel.py).
    if os.environ.get("PROBE_FUSED_CHAIN", "0") == "1":
        fused_cfg = dataclasses.replace(base, gnt_fused_chain=True)
    else:
        fused_cfg = dataclasses.replace(
            base, gnt_fused_attn=True,
            gnt_fused_vt=os.environ.get("PROBE_FUSED_VT", "0") == "1",
            gnt_fused_vt_lp=os.environ.get("NERFOOL_VT_LANEPACK", "0") == "1")
    cfgs = {0: base, 1: fused_cfg}

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
        ret = _render_blocked_jit(bundle.render_params, bundle.modules, batch,
                                  feats, cfgs[f], src_rgbs, src_cams_j,
                                  CHUNK, None, None)
        return float(jnp.sum(ret["outputs_coarse"]["rgb"]))

    outs = {}
    for f in (0, 1):
        t0 = time.perf_counter()
        outs[f] = run(f)
        print(f"fused={f} compile+first: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
    print(f"sum check: xla={outs[0]:.3f} fused={outs[1]:.3f}",
          file=sys.stderr, flush=True)

    times = {0: [], 1: []}
    for i in range(ROUNDS):
        for f in (0, 1) if i % 2 == 0 else (1, 0):
            t0 = time.perf_counter()
            run(f)
            times[f].append(time.perf_counter() - t0)
    for f in (0, 1):
        best = min(times[f])
        print(f"fused={f}: best {best*1e3:.0f} ms "
              f"({SEG/best:,.0f} rays/s)  all="
              + " ".join(f"{t*1e3:.0f}" for t in times[f]), flush=True)


if __name__ == "__main__":
    main()
