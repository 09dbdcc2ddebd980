"""Grid-step count vs sblk for the windowed BSPG kernels (latency-bound?)."""
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
    B = 64
    NS = 4096
    REP = 16

    cases = [
        ("rgb  g1 sblk1024", 7, 132, 8, 3, 64, 1024),
        ("rgb  g1 sblk2048", 7, 132, 8, 3, 64, 2048),
        ("rgb  g1 sblk4096", 7, 132, 8, 3, 64, 4096),
        ("feat g1 sblk512",  7, 72, 4, 32, 48, 512),
        ("feat g1 sblk1024", 7, 72, 4, 32, 48, 1024),
    ]

    def force(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    for label, vg, ks, p, c, kw, sblk in cases:
        p1 = p + 1
        sp = p1 * p1
        n_rv = vg * B
        ks_pad = -(-ks // KB) * KB
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

        try:
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
                def run(gc=gc, slots_win=slots_win, w0b=w0b, pid=pid, ly=ly,
                        wy0=wy0, wy1=wy1, lx=lx, wx0=wx0, wx1=wx1,
                        dy_lane=dy_lane, dx_lane=dx_lane, ch_onehot=ch_onehot,
                        kw=kw, sp=sp, c=c, sblk=sblk, n_rv=n_rv):
                    acc = 0.0
                    for i in range(REP):
                        acc = acc + select_win_smallc(
                            gc, slots_win, w0b, jnp.roll(pid, i, axis=-1), ly,
                            wy0, wy1, lx, wx0, wx1, dy_lane, dx_lane,
                            ch_onehot, n_rv=n_rv, kw=kw, sp=sp, c=c,
                            sblk=sblk, out_dtype=dt)
                    return acc
            else:
                w = kw * sp
                gf = jnp.asarray(rng.rand(n_rv, ks_pad * sp, c), dt)
                srep = jnp.asarray(
                    rng.randint(0, 10000, (n_steps, 1, w)), jnp.int32)
                j = np.arange(w)
                dy_lane = jnp.asarray((j // p1) % p1, jnp.int32)[None]
                dx_lane = jnp.asarray(j % p1, jnp.int32)[None]

                @jax.jit
                def run(gf=gf, srep=srep, w0b=w0b, pid=pid, ly=ly, wy0=wy0,
                        wy1=wy1, lx=lx, wx0=wx0, wx1=wx1, dy_lane=dy_lane,
                        dx_lane=dx_lane, kw=kw, sp=sp, c=c, sblk=sblk,
                        n_rv=n_rv):
                    acc = 0.0
                    for i in range(REP):
                        acc = acc + select_win_fused(
                            gf, srep, w0b, jnp.roll(pid, i, axis=-1), ly,
                            wy0, wy1, lx, wx0, wx1, dy_lane, dx_lane,
                            n_rv=n_rv, kw=kw, sp=sp, c=c, sblk=sblk,
                            out_dtype=dt)
                    return acc

            t0 = time.perf_counter()
            out = run()
            force(out)
            print(f"{label}: compile+run {time.perf_counter()-t0:.1f}s "
                  f"(n_steps={n_steps})", flush=True)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                force(run())
                ts.append(time.perf_counter() - t0)
            print(f"{label}: {min(ts)/REP*1e3:7.2f} ms/call", flush=True)
        except Exception as e:
            print(f"{label}: FAIL {str(e)[-400:]}", flush=True)


if __name__ == "__main__":
    main()
