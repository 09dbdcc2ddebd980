"""Quick TPU smoke + timing of the fused GNT attention kernels at flagship
block shapes: the full aggregator apply (XLA vs fused), interleaved in one
process. Fast Mosaic-compile feedback before the e2e probe_vtfused run.

Usage: python scripts/probe_fused_agg.py [V R S]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from nerfool_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from nerfool_tpu.models.gnt import GNTAggregator

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 192
    dt = jnp.bfloat16
    print(f"devices: {jax.devices()}  V={v} R={r} S={s} bf16", flush=True)
    rng = np.random.RandomState(0)
    rgb_feat = jnp.asarray(rng.randn(v, r, s, 35), dt)
    ray_diff = jnp.asarray(rng.randn(v, r, s, 4), dt)
    mask = jnp.asarray(rng.rand(v, r, s, 1) > 0.2, dt)
    pts = jnp.asarray(rng.randn(r, s, 3), dt)
    ray_d = jnp.asarray(rng.randn(r, 3), dt)

    mod = GNTAggregator(in_feat_ch=32, trans_depth=8, ret_alpha=True)
    params = jax.tree.map(
        lambda p: p.astype(dt),
        mod.init(jax.random.PRNGKey(1), rgb_feat[:, :2, :8],
                 ray_diff[:, :2, :8], mask[:, :2, :8], pts[:2, :8],
                 ray_d[:2])["params"])

    fns = {
        "xla": jax.jit(lambda p, *a: mod.apply({"params": p}, *a)),
        "fused": jax.jit(lambda p, *a: mod.clone(
            fused_attn=True,
            fused_vt=os.environ.get("PROBE_FUSED_VT", "0") == "1",
            fused_vt_lp=os.environ.get("NERFOOL_VT_LANEPACK", "0") == "1",
        ).apply({"params": p}, *a)),
    }
    if os.environ.get("PROBE_FUSED_CHAIN", "0") == "1":
        # whole-chain kernel instead, at PROBE_CHAIN_TILE rays per tile
        from nerfool_tpu.ops.chain_kernel import fused_chain_aggregate

        tile = int(os.environ.get("PROBE_CHAIN_TILE", "8"))
        fns["fused"] = jax.jit(functools.partial(
            fused_chain_aggregate, depth=8, rays_tile=tile))
    args = (params, rgb_feat, ray_diff, mask, pts, ray_d)
    outs = {}
    for name, fn in fns.items():
        t0 = time.perf_counter()
        outs[name] = fn(*args)
        outs[name].block_until_ready()
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
    err = float(jnp.max(jnp.abs(outs["xla"].astype(jnp.float32)
                                - outs["fused"].astype(jnp.float32))))
    print(f"max abs err (bf16): {err:.3e}", flush=True)

    times = {k: [] for k in fns}
    for i in range(4):
        for name in fns if i % 2 == 0 else reversed(list(fns)):
            t0 = time.perf_counter()
            fns[name](*args).block_until_ready()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        best = min(ts)
        print(f"{name}: best {best*1e3:.1f} ms ({r/best:,.0f} rays/s "
              "agg-only)  all=" + " ".join(f"{t*1e3:.0f}" for t in ts),
              flush=True)


if __name__ == "__main__":
    main()
