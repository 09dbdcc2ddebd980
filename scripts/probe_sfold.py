"""Micro-probe: sample-folding the GNT view-attention chain.

Hypothesis (BENCH_NOTES round-2 idea "pack 2 rays per 128-lane row",
re-targeted at samples): every view-side tensor in the GNT aggregator is
[V, R, S, 64] — a 64-channel minor dim that XLA pads to 128 lanes, wasting
half of every VPU op and every MXU output tile. Folding ADJACENT SAMPLE
PAIRS into the channel axis ([V, R, S/2, 128]) with block-diagonal weights
keeps semantics (all view-side ops are pointwise over (s, c) or reduce over
V only) while halving rows and filling lanes.

Candidates: the full ViewAttention big side (kv matmul + pos chain + attn
chain + masked softmax over V + weighted sum) at GNT-full shapes, unfolded
vs folded (including q fold / output unfold relayouts, which a real block
would pay).

Usage: python scripts/probe_sfold.py   (real TPU; honors JAX_PLATFORMS)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nerfool_tpu.utils.platform import apply_platform_env


def blockdiag2(w):
    import jax.numpy as jnp

    din, dout = w.shape
    z = jnp.zeros((2 * din, 2 * dout), w.dtype)
    return z.at[:din, :dout].set(w).at[din:, dout:].set(w)


def main():
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    rng = np.random.RandomState(0)
    V, R, S, D = 10, 800, 192, 64
    dt = jnp.bfloat16

    x = jnp.asarray(rng.rand(V, R, S, D) - 0.5, dt)          # k operand
    rd = jnp.asarray(rng.rand(V, R, S, 4) - 0.5, dt)         # ray_diff
    m = jnp.asarray(rng.rand(V, R, S, 1) > 0.1, jnp.float32).astype(dt)
    q = jnp.asarray(rng.rand(R, S, D) - 0.5, dt)

    wkv = jnp.asarray(rng.rand(D, 2 * D) - 0.5, dt) * 0.1
    wq = jnp.asarray(rng.rand(D, D) - 0.5, dt) * 0.1
    wp0 = jnp.asarray(rng.rand(4, 8) - 0.5, dt) * 0.1
    wp1 = jnp.asarray(rng.rand(8, D) - 0.5, dt) * 0.1
    wa0 = jnp.asarray(rng.rand(D, 8) - 0.5, dt) * 0.1
    wa1 = jnp.asarray(rng.rand(8, D) - 0.5, dt) * 0.1
    wo = jnp.asarray(rng.rand(D, D) - 0.5, dt) * 0.1

    def unfolded(x, rd, m, q):
        kv = x @ wkv
        kp, v = kv[..., :D], kv[..., D:]
        pos = jax.nn.relu(rd @ wp0) @ wp1
        qp = q @ wq
        attn = kp - qp[None] + pos
        attn = jax.nn.relu(attn @ wa0) @ wa1
        attn = jnp.where(m == 0, -1e9, attn)
        attn = jax.nn.softmax(attn, axis=0)
        out = jnp.sum((v + pos) * attn, axis=0)
        return out @ wo

    # folded constants (built once outside the timed fn, as the real module
    # would per jit trace)
    wkv2 = jnp.concatenate(
        [blockdiag2(wkv[:, :D]), blockdiag2(wkv[:, D:])], axis=-1)
    wq2 = blockdiag2(wq)
    wp02 = blockdiag2(wp0)
    wp12 = blockdiag2(wp1)
    wa02 = blockdiag2(wa0)
    wa12 = blockdiag2(wa1)
    wo2 = blockdiag2(wo)
    xf = x.reshape(V, R, S // 2, 2 * D)
    rdf = rd.reshape(V, R, S // 2, 8)
    mf = jnp.broadcast_to(m, (V, R, S, D)).reshape(V, R, S // 2, 2 * D)

    def folded(xf, rdf, mf, q):
        qf = q.reshape(R, S // 2, 2 * D)        # fold relayout (timed)
        kv = xf @ wkv2
        kp, v = kv[..., : 2 * D], kv[..., 2 * D:]
        pos = jax.nn.relu(rdf @ wp02) @ wp12
        qp = qf @ wq2
        attn = kp - qp[None] + pos
        attn = jax.nn.relu(attn @ wa02) @ wa12
        attn = jnp.where(mf == 0, -1e9, attn)
        attn = jax.nn.softmax(attn, axis=0)
        out = jnp.sum((v + pos) * attn, axis=0)
        out = out @ wo2
        return out.reshape(R, S, D)             # unfold relayout (timed)

    def force(v):
        return float(jnp.sum(jnp.asarray(v, jnp.float32)))

    def timeit(fn, *a):
        force(fn(*a))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            force(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3

    ju = jax.jit(unfolded)
    jf = jax.jit(folded)
    print(f"shapes: x [V={V}, R={R}, S={S}, D={D}] {x.dtype}", flush=True)
    mu = timeit(ju, x, rd, m, q)
    print(f"unfolded view-attn chain: {mu:7.2f} ms", flush=True)
    mfold = timeit(jf, xf, rdf, mf, q)
    print(f"folded   view-attn chain: {mfold:7.2f} ms  (x{mu/mfold:.2f})",
          flush=True)

    err = float(jnp.max(jnp.abs(
        jnp.asarray(ju(x, rd, m, q), jnp.float32)
        - jnp.asarray(jf(xf, rdf, mf, q), jnp.float32))))
    print(f"folded-vs-unfolded max err: {err:.2e} (bf16 chain)")


if __name__ == "__main__":
    main()
