"""Micro A/B of each fused attention kernel vs its XLA module at flagship
block shapes (V=10, R=4096, S=192, bf16): isolates which kernel wins/loses
inside the aggregate probe_fused_agg number.

Usage: python scripts/probe_kernel_micro.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *a, reps=4):
    out = fn(*a)
    jax = sys.modules["jax"]
    jnp = sys.modules["jax.numpy"]
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    from nerfool_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from nerfool_tpu.models.gnt import RayAttention, ViewAttention

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    v, r, s, d = 10, 4096, 192, 64
    dt = jnp.bfloat16
    print(f"devices: {jax.devices()}  V={v} R={r} S={s} bf16", flush=True)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(r, s, d), dt)
    k = jnp.asarray(rng.randn(v, r, s, d), dt)
    pos = jnp.asarray(rng.randn(v, r, s, 4), dt)
    mask = jnp.asarray(rng.rand(v, r, s, 1) > 0.2, dt)

    va = ViewAttention(d)
    params = jax.tree.map(
        lambda p: p.astype(dt),
        va.init(jax.random.PRNGKey(1), q[:, :8], k[:, :, :8], pos[:, :, :8],
                mask[:, :, :8])["params"])
    f_xla = jax.jit(lambda p, *a: va.apply({"params": p}, *a))
    f_fused = jax.jit(
        lambda p, *a: va.clone(fused=True).apply({"params": p}, *a))
    t1 = timeit(f_xla, params, q, k, pos, mask)
    t2 = timeit(f_fused, params, q, k, pos, mask)
    print(f"view-attn : xla {t1:7.1f} ms   fused {t2:7.1f} ms "
          f"({t1/t2:.2f}x)", flush=True)

    f_lp = jax.jit(
        lambda p, *a: va.clone(fused=True, lane_pack=True)
        .apply({"params": p}, *a))
    t2b = timeit(f_lp, params, q, k, pos, mask)
    print(f"view-attn : lane-packed fused {t2b:7.1f} ms ({t1/t2b:.2f}x vs "
          "xla)", flush=True)

    ra = RayAttention(d)
    rparams = jax.tree.map(
        lambda p: p.astype(dt),
        ra.init(jax.random.PRNGKey(2), q[:, :8])["params"])
    r_xla = jax.jit(lambda p, x: ra.apply({"params": p}, x, ret_attn=True))
    r_fused = jax.jit(
        lambda p, x: ra.clone(fused=True).apply({"params": p}, x,
                                                ret_attn=True))
    t3 = timeit(r_xla, rparams, q)
    t4 = timeit(r_fused, rparams, q)
    print(f"ray-attn  : xla {t3:7.1f} ms   fused {t4:7.1f} ms "
          f"({t3/t4:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
