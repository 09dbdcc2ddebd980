"""Profile the ResUNet feature extractor (fwd and remat fwd+bwd) at bench
scale and print the top self-time ops. The attack step spends ~271 ms/iter in
feature fwd+bwd (~1.5 TF/s effective — far below both the compute and the
bandwidth roofline), so this names where it goes.

Usage:  python scripts/profile_feature_net.py [out_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.profile_render import top_ops_from_xplane


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nerfool_feat_trace"

    import jax
    import jax.numpy as jnp

    from nerfool_tpu.models.bundle import create_model

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    H = int(os.environ.get("BENCH_H", 756))
    W = int(os.environ.get("BENCH_W", 1008))
    n_src = int(os.environ.get("BENCH_SRC", 10))
    fdt = os.environ.get("BENCH_FEATURE_DTYPE", "float32")
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(n_src, H // 2, W // 2, 3).astype(np.float32))

    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(0),
                          feature_dtype=fdt)
    p = bundle.params["feature_net"]

    fwd = jax.jit(lambda p, x: bundle.feature_net.apply({"params": p}, x)[0])
    fwdbwd = jax.jit(jax.grad(lambda xx: jnp.sum(jax.checkpoint(
        lambda q: bundle.feature_net.apply({"params": p}, q)[0])(xx))))

    def force(v):
        return float(jnp.sum(v))

    def timeit(fn, label):
        force(fn())  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(fn())
            ts.append(time.perf_counter() - t0)
        print(f"{label}: best-of-3 {min(ts)*1e3:.1f} ms", flush=True)

    timeit(lambda: fwd(p, x), f"feature fwd ({fdt})")
    timeit(lambda: fwdbwd(x), f"feature fwd+bwd remat ({fdt})")

    for name, fn in [("fwd", lambda: fwd(p, x)), ("bwd", lambda: fwdbwd(x))]:
        d = os.path.join(out, name)
        os.makedirs(d, exist_ok=True)
        with jax.profiler.trace(d):
            for _ in range(2):
                force(fn())
        rows = top_ops_from_xplane(d)
        if not rows:
            print(f"{name}: no xplane captured")
            continue
        total = sum(r[1] for r in rows)
        print(f"\nfeature {name}: top ops by self time "
              f"(top-{len(rows)} raw sum {total:.0f} over 2 runs):")
        for op, t in rows:
            print(f"  {t:>12.0f}  {op}")


if __name__ == "__main__":
    main()
