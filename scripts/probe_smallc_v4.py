"""Smallc variants D (bf16 intermediates) and E (per-channel sp-lane loop)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nerfool_tpu.ops.bspg_kernel import GB, KB, _win_compiler_params

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    rng = np.random.RandomState(0)
    B = 64
    NS = 4096
    REP = 16

    label0, vg, ks, p, c, kw, sblk = "rgb g1", 7, 132, 8, 3, 64, 512
    p1 = p + 1
    sp = p1 * p1
    csp = c * sp
    n_rv = vg * B
    ks_pad = -(-ks // KB) * KB
    nsb = NS // sblk
    n_flat = nsb * n_rv
    n_steps = n_flat // GB
    nr8 = n_rv // GB
    m = kw // KB
    dt = jnp.bfloat16
    f32 = jnp.float32

    gc = jnp.asarray(rng.rand(n_rv, ks_pad, csp), dt)
    # channel-planar layout for variant E: [n_rv, ks_pad, c, sp] -> treat the
    # row as c separate sp-wide segments (lane slices at ch*sp)
    slots_win = jnp.asarray(rng.randint(0, 10000, (n_flat, kw)), jnp.int32)
    w0b = jnp.asarray(rng.randint(0, (ks_pad - kw)//KB + 1, (n_steps,)), jnp.int32)
    pid = jnp.asarray(rng.randint(0, 10000, (n_flat, sblk)), jnp.int32)
    ly = jnp.asarray(rng.randint(0, p, (n_flat, sblk)), jnp.int32)
    lx = jnp.asarray(rng.randint(0, p, (n_flat, sblk)), jnp.int32)
    wy0 = jnp.asarray(rng.rand(n_flat, sblk), f32)
    wy1 = jnp.asarray(rng.rand(n_flat, sblk), f32)
    wx0 = jnp.asarray(rng.rand(n_flat, sblk), f32)
    wx1 = jnp.asarray(rng.rand(n_flat, sblk), f32)
    j = np.arange(csp)
    off = j % sp
    dy_csp = jnp.asarray(off // p1, jnp.int32)[None]
    dx_csp = jnp.asarray(off % p1, jnp.int32)[None]
    jsp = np.arange(sp)
    dy_sp = jnp.asarray(jsp // p1, jnp.int32)[None]
    dx_sp = jnp.asarray(jsp % p1, jnp.int32)[None]
    ch_onehot = jnp.asarray((j // sp)[:, None] == np.arange(c)[None, :], f32)

    def kern_D(w0b_ref, slots_ref, dyl_ref, dxl_ref, ch_ref, pid_ref,
               ly_ref, wy0_ref, wy1_ref, lx_ref, wx0_ref, wx1_ref, *rest):
        g_refs, out_ref = rest[:m], rest[m]
        gwin = jnp.concatenate([g_refs[i][...] for i in range(m)], axis=1)
        bf = gwin.dtype
        eq = (pid_ref[...][:, :, None] == slots_ref[...][:, None, :]).astype(bf)
        z = jax.lax.dot_general(eq, gwin, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32).astype(bf)
        dyl = dyl_ref[0]; dxl = dxl_ref[0]
        ly = ly_ref[...]; lx = lx_ref[...]
        wy = jnp.where(dyl[None, None, :] == ly[:, :, None], wy0_ref[...][:, :, None],
                       jnp.where(dyl[None, None, :] == ly[:, :, None] + 1,
                                 wy1_ref[...][:, :, None], 0.0))
        wx = jnp.where(dxl[None, None, :] == lx[:, :, None], wx0_ref[...][:, :, None],
                       jnp.where(dxl[None, None, :] == lx[:, :, None] + 1,
                                 wx1_ref[...][:, :, None], 0.0))
        zw = z * (wy * wx).astype(bf)
        out_ref[...] = jax.lax.dot_general(
            zw, ch_ref[...].astype(bf), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)

    def kern_E(w0b_ref, slots_ref, dyl_ref, dxl_ref, ch_ref, pid_ref,
               ly_ref, wy0_ref, wy1_ref, lx_ref, wx0_ref, wx1_ref, *rest):
        g_refs, out_ref = rest[:m], rest[m]
        gwin = jnp.concatenate([g_refs[i][...] for i in range(m)], axis=1)
        bf = gwin.dtype
        eq = (pid_ref[...][:, :, None] == slots_ref[...][:, None, :]).astype(bf)
        dyl = dyl_ref[0]; dxl = dxl_ref[0]   # [sp]
        ly = ly_ref[...]; lx = lx_ref[...]
        wy0b = wy0_ref[...].astype(bf)[:, :, None]
        wy1b = wy1_ref[...].astype(bf)[:, :, None]
        wx0b = wx0_ref[...].astype(bf)[:, :, None]
        wx1b = wx1_ref[...].astype(bf)[:, :, None]
        zero = jnp.zeros((), bf)
        wy = jnp.where(dyl[None, None, :] == ly[:, :, None], wy0b,
                       jnp.where(dyl[None, None, :] == ly[:, :, None] + 1,
                                 wy1b, zero))
        wx = jnp.where(dxl[None, None, :] == lx[:, :, None], wx0b,
                       jnp.where(dxl[None, None, :] == lx[:, :, None] + 1,
                                 wx1b, zero))
        w2d = wy * wx                                   # [GB, S, sp]
        outs = []
        for ch in range(c):
            gch = jax.lax.slice_in_dim(gwin, ch * sp, (ch + 1) * sp, axis=2)
            zc = jax.lax.dot_general(eq, gch, (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32
                                     ).astype(bf)  # [GB,S,sp]
            outs.append(jnp.sum((zc * w2d).astype(jnp.float32), axis=-1))
        out_ref[...] = jnp.stack(outs, axis=-1).astype(out_ref.dtype)

    gspec = []
    for i in range(m):
        gspec.append(pl.BlockSpec((GB, KB, csp),
                                  lambda t, ref, i=i: (t % nr8, ref[t] + i, 0)))
    persamp = pl.BlockSpec((GB, sblk), lambda t, ref: (t, 0))

    def build(kern, lane_n):
        const = pl.BlockSpec((1, lane_n), lambda t, ref: (0, 0))
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_steps,),
                in_specs=[
                    pl.BlockSpec((GB, kw), lambda t, ref: (t, 0)),
                    const, const,
                    pl.BlockSpec((csp, c), lambda t, ref: (0, 0)),
                    persamp, persamp, persamp, persamp,
                    persamp, persamp, persamp,
                    *gspec,
                ],
                out_specs=pl.BlockSpec((GB, sblk, c), lambda t, ref: (t, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((n_flat, sblk, c), dt),
            compiler_params=_win_compiler_params(),
        )

    def force(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    for name, kern, dyl, dxl in (("D3", kern_D, dy_csp, dx_csp),):
        call = build(kern, dyl.shape[1])

        @jax.jit
        def run(call=call, dyl=dyl, dxl=dxl):
            acc = 0.0
            for i in range(REP):
                acc = acc + call(w0b, slots_win, dyl, dxl, ch_onehot,
                                 jnp.roll(pid, i, axis=-1), ly, wy0, wy1,
                                 lx, wx0, wx1, *([gc] * m))
            return acc
        try:
            t0 = time.perf_counter()
            out = run(); force(out)
            print(f"{label0} {name}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter(); force(run()); ts.append(time.perf_counter()-t0)
            print(f"{label0} {name}: {min(ts)/REP*1e3:7.2f} ms/call", flush=True)
        except Exception as e:
            print(f"{label0} {name}: FAIL {str(e)[-300:]}", flush=True)


if __name__ == "__main__":
    main()
