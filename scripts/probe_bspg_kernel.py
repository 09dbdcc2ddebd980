"""Per-invocation timing of the BSPG Pallas selection kernels at flagship
bench shapes (the xprof op profile shows the selection custom-calls are now
~55-65% of whole-frame render time; this names which group/table dominates).

Usage: python scripts/probe_bspg_kernel.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nerfool_tpu.ops.bspg import BSPGSpec
    from nerfool_tpu.ops.bspg_kernel import (
        select_block_pallas_ingredients, select_block_pallas_smallc,
    )

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    rng = np.random.RandomState(0)
    B = 64          # 8x8 blocks per 4096-ray chunk
    NS = 4096       # 64 rays x 64 samples per block
    REP = 16        # chunks per flagship 131072-ray segment: time REP calls

    # (label, vg, ks, p, c, grid h x w)
    cases = [
        ("feat g0", 2, 36, 4, 32, (192, 252)),
        ("feat g1", 7, 72, 4, 32, (192, 252)),
        ("feat g2", 1, 90, 4, 32, (192, 252)),
        ("rgb  g0", 2, 54, 8, 3, (756, 1008)),
        ("rgb  g1", 7, 132, 8, 3, (756, 1008)),
        ("rgb  g2", 1, 162, 8, 3, (756, 1008)),
    ]

    def force(x):
        return float(jnp.sum(x))

    for label, vg, ks, p, c, (h, w) in cases:
        spec = BSPGSpec(p=p, h=h, w=w, h_full=756, w_full=1008, pby=0, pbx=0,
                        block=(8, 8), groups=())
        sp = (p + 1) ** 2
        n_rv = vg * B
        dt = jnp.bfloat16
        g = jnp.asarray(rng.rand(vg, B, ks, sp * c), dt)
        slots = jnp.asarray(rng.randint(0, 10000, (vg, B, ks)), jnp.int32)
        pid = jnp.asarray(
            slots.reshape(n_rv, ks)[np.arange(n_rv)[:, None],
                                    rng.randint(0, ks, (n_rv, NS))]
            .reshape(vg, B, NS), jnp.int32)
        ly = jnp.asarray(rng.randint(0, p, (vg, B, NS)), jnp.int32)
        lx = jnp.asarray(rng.randint(0, p, (vg, B, NS)), jnp.int32)
        fy = jnp.asarray(rng.rand(vg, B, NS), dt)
        fx = jnp.asarray(rng.rand(vg, B, NS), dt)
        one = jnp.ones((vg, B, NS), dt)

        fn = (select_block_pallas_smallc if c <= 8
              else select_block_pallas_ingredients)

        @jax.jit
        def run(g, slots, pid, ly, fy, lx, fx, one, fn=fn, spec=spec, c=c):
            # roll pid per repetition so XLA cannot CSE the REP calls
            acc = 0.0
            for i in range(REP):
                acc = acc + fn(g, slots, jnp.roll(pid, i, axis=-1), ly, fy,
                               one, one, lx, fx, one, one, spec, c)
            return acc

        out = run(g, slots, pid, ly, fy, lx, fx, one)
        force(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(run(g, slots, pid, ly, fy, lx, fx, one))
            ts.append(time.perf_counter() - t0)
        per_call = min(ts) / REP
        print(f"{label}: vg={vg} ks={ks} sp={sp} c={c}  "
              f"{per_call*1e3:7.2f} ms/call  "
              f"(x2 levels x16 chunks = {2*REP*per_call*1e3:6.0f} ms/segment)",
              flush=True)


if __name__ == "__main__":
    main()
