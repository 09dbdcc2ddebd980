"""Windowed vs full-width BSPG selection kernel timing at flagship shapes.

Synthesizes chunk-major operands for select_win_fused / select_win_smallc at
the bench groups' (vg, ks, p, c) and plausible window widths kw, and compares
against the full-width kernels' measured per-call cost.

Usage: python scripts/probe_bspg_win.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nerfool_tpu.ops.bspg_kernel import (
        GB, KB, select_win_fused, select_win_smallc,
    )

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    rng = np.random.RandomState(0)
    B = 64          # 8x8 blocks per 4096-ray chunk
    NS = 4096       # 64 rays x 64 samples per block
    REP = 16

    # (label, vg, ks, p, c, kw)
    cases = [
        ("feat g1", 7, 72, 4, 32, 48),
        ("feat g2", 1, 90, 4, 32, 48),
        ("rgb  g1", 7, 132, 8, 3, 64),
        ("rgb  g2", 1, 162, 8, 3, 80),
    ]

    def force(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    for label, vg, ks, p, c, kw in cases:
        p1 = p + 1
        sp = p1 * p1
        n_rv = vg * B
        ks_pad = -(-ks // KB) * KB
        from nerfool_tpu.ops.bspg import _window_sblk
        sblk = _window_sblk(NS, c)
        nsb = NS // sblk
        n_flat = nsb * n_rv
        n_steps = n_flat // GB
        dt = jnp.bfloat16
        f32 = jnp.float32

        w0b = jnp.asarray(
            rng.randint(0, (ks_pad - kw) // KB + 1, (n_steps,)), jnp.int32)
        pid = jnp.asarray(rng.randint(0, 10000, (n_flat, sblk)), jnp.int32)
        ly = jnp.asarray(rng.randint(0, p, (n_flat, sblk)), jnp.int32)
        lx = jnp.asarray(rng.randint(0, p, (n_flat, sblk)), jnp.int32)
        wy0 = jnp.asarray(rng.rand(n_flat, sblk), f32)
        wy1 = jnp.asarray(rng.rand(n_flat, sblk), f32)
        wx0 = jnp.asarray(rng.rand(n_flat, sblk), f32)
        wx1 = jnp.asarray(rng.rand(n_flat, sblk), f32)

        if c <= 8:
            csp = c * sp
            gc = jnp.asarray(rng.rand(n_rv, ks_pad, csp), dt)
            slots_win = jnp.asarray(
                rng.randint(0, 10000, (n_steps, 1, kw)), jnp.int32)
            j = np.arange(csp)
            off = j % sp
            dy_lane = jnp.asarray(off // p1, jnp.int32)[None]
            dx_lane = jnp.asarray(off % p1, jnp.int32)[None]
            ch_onehot = jnp.asarray(
                (j // sp)[:, None] == np.arange(c)[None, :], f32)

            @jax.jit
            def run(gc, slots_win, w0b, pid, ly, wy0, wy1, lx, wx0, wx1):
                acc = 0.0
                for i in range(REP):
                    acc = acc + select_win_smallc(
                        gc, slots_win, w0b, jnp.roll(pid, i, axis=-1), ly,
                        wy0, wy1, lx, wx0, wx1, dy_lane, dx_lane, ch_onehot,
                        n_rv=n_rv, kw=kw, sp=sp, c=c, sblk=sblk,
                        out_dtype=dt)
                return acc

            args = (gc, slots_win, w0b, pid, ly, wy0, wy1, lx, wx0, wx1)
        else:
            w = kw * sp
            gf = jnp.asarray(rng.rand(n_rv, ks_pad * sp, c), dt)
            srep = jnp.asarray(rng.randint(0, 10000, (n_steps, 1, w)), jnp.int32)
            j = np.arange(w)
            dy_lane = jnp.asarray((j // p1) % p1, jnp.int32)[None]
            dx_lane = jnp.asarray(j % p1, jnp.int32)[None]

            @jax.jit
            def run(gf, srep, w0b, pid, ly, wy0, wy1, lx, wx0, wx1):
                acc = 0.0
                for i in range(REP):
                    acc = acc + select_win_fused(
                        gf, srep, w0b, jnp.roll(pid, i, axis=-1), ly,
                        wy0, wy1, lx, wx0, wx1, dy_lane, dx_lane,
                        n_rv=n_rv, kw=kw, sp=sp, c=c, sblk=sblk,
                        out_dtype=dt)
                return acc

            args = (gf, srep, w0b, pid, ly, wy0, wy1, lx, wx0, wx1)

        t0 = time.perf_counter()
        out = run(*args)
        force(out)
        print(f"{label}: compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(run(*args))
            ts.append(time.perf_counter() - t0)
        per_call = min(ts) / REP
        print(f"{label}: vg={vg} ks={ks} kw={kw} sp={sp} c={c}  "
              f"{per_call*1e3:7.2f} ms/call  "
              f"(x2 levels x16 chunks = {2*REP*per_call*1e3:6.0f} ms/segment)",
              flush=True)


if __name__ == "__main__":
    main()
