"""Compile-time scaling of the whole-chain kernel vs trans_depth on the
current backend — diagnoses the round-5 observation that the depth-8 unrolled
kernel never finished its remote Mosaic compile (>25 min).

Usage: python scripts/probe_chain_compile.py [depths...]   (default 1 2)
"""
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

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    from nerfool_tpu.models.gnt import GNTAggregator
    from nerfool_tpu.ops.chain_kernel import fused_chain_aggregate

    print(f"devices: {jax.devices()}", flush=True)
    depths = [int(a) for a in sys.argv[1:]] or [1, 2]
    rng = np.random.RandomState(0)
    V, R, S = 10, 64, 192
    dt = jnp.bfloat16
    rf = jnp.asarray(rng.randn(V, R, S, 35), dt)
    rd = jnp.asarray(rng.randn(V, R, S, 4), dt)
    mk = jnp.asarray(rng.rand(V, R, S, 1) > 0.2, dt)
    pts = jnp.asarray(rng.randn(R, S, 3), dt)
    rayd = jnp.asarray(rng.randn(R, 3), dt)
    for depth in depths:
        mod = GNTAggregator(in_feat_ch=32, netwidth=64, trans_depth=depth,
                            ret_alpha=True)
        params = jax.tree.map(
            lambda p: p.astype(dt),
            mod.init(jax.random.PRNGKey(1), rf[:, :2, :8], rd[:, :2, :8],
                     mk[:, :2, :8], pts[:2, :8], rayd[:2])["params"])
        t0 = time.perf_counter()
        out = fused_chain_aggregate(params, rf, rd, mk, pts, rayd,
                                    depth=depth)
        out.block_until_ready()
        print(f"depth={depth}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        ref = jax.jit(mod.apply)({"params": params}, rf, rd, mk, pts, rayd)
        err = float(jnp.max(jnp.abs(jnp.asarray(ref, jnp.float32)
                                    - jnp.asarray(out, jnp.float32))))
        print(f"  xla ref compile {time.perf_counter()-t0:.1f}s  "
              f"max|d|={err:.3e}", flush=True)


if __name__ == "__main__":
    main()
