"""Micro-probe: does the GNT attention chain's dim-8 intermediate pay TPU
tile padding (minor dim 8 -> 128 lanes, a 16x HBM blowup), and does an
S-minor layout dodge it?

Candidates over x [M, 64] (M = V*R*S flattened):
  a) narrow : relu(x @ W[64,8]) @ W[8,64]       (the reference chain)
  b) wide   : relu(x @ W[64,64]) @ W[64,64]     (8x the FLOPs; if ~same time,
                                                 the narrow chain is layout/
                                                 bandwidth bound, not FLOPs)
  c) smajor : same as (a) but x viewed [M/S, S, 64] and the intermediate kept
              [M/S, 8, S] via dot_general dimension ordering (minor dim S=192,
              no lane padding)

Usage: python scripts/probe_dim8.py  (BENCH-style env: real TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nerfool_tpu.utils.platform import apply_platform_env


def main():
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    rng = np.random.RandomState(0)
    V, R, S, D = 10, 800, 192, 64
    M = V * R * S
    dt = jnp.bfloat16
    x = jnp.asarray(rng.rand(M, D), dt)
    w8 = jnp.asarray(rng.rand(D, 8), dt)
    w8b = jnp.asarray(rng.rand(8, D), dt)
    w64 = jnp.asarray(rng.rand(D, D), dt)
    w64b = jnp.asarray(rng.rand(D, D), dt)

    def force(v):
        return float(jnp.sum(jnp.asarray(v, jnp.float32)))

    def timeit(fn, *a):
        fn(*a)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            force(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3

    narrow = jax.jit(lambda x: jax.nn.relu(x @ w8) @ w8b)
    wide = jax.jit(lambda x: jax.nn.relu(x @ w64) @ w64b)

    def smajor_fn(x):
        xs = x.reshape(M // S, S, D)
        # [B, 8, S]: minor dim S (192) stays lane-aligned, dim-8 is sublane
        mid = jnp.einsum("bsd,de->bes", xs, w8)
        mid = jax.nn.relu(mid)
        out = jnp.einsum("bes,ef->bsf", mid, w8b)
        return out.reshape(M, D)

    smajor = jax.jit(smajor_fn)

    print(f"shapes: x [{M}, {D}] (V={V} R={R} S={S}) {x.dtype}", flush=True)
    for name, fn in (("narrow  64->8->64", narrow),
                     ("wide    64->64->64", wide),
                     ("smajor  64->8(S-minor)->64", smajor)):
        try:
            ms = timeit(fn, x)
            gb = (2 * M * D * 2) / 1e9  # in + out, bf16
            print(f"{name}: {ms:7.2f} ms  ({gb/ms*1e3:,.0f} GB/s io-side)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {str(e)[-200:]}", flush=True)

    err = float(jnp.max(jnp.abs(
        jnp.asarray(narrow(x), jnp.float32) - jnp.asarray(smajor(x), jnp.float32))))
    print(f"narrow-vs-smajor max err: {err:.2e}")


if __name__ == "__main__":
    main()
