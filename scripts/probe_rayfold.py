"""Micro-probe: does packing 2 rays into the 128-lane channel axis speed up
the GNT aggregation's hot chains on TPU?

Hypothesis (BENCH_NOTES dim8 probe): the [V,R,S,64] chains are row-bound —
every VREG holds 64 useful lanes out of 128, and the netwidth-64 matmuls pad
to 128-wide MXU tiles at <=25% utilization. Packing ray pairs into channels
([V,R/2,S,128], block-diagonal weights) halves rows and fills the lanes with
useful work. Unlike the retired sample-fold, rays stay independent through
the WHOLE aggregation (the ray transformer attends along S within a ray), so
the fold is one entry transpose + one exit transpose, no per-block unfolds —
the ray transformer stays exact by regrouping 2x4 heads as 8.

Times (bf16, flagship GNT shapes V=10 R=800 S=192 D=64):
  va / va_fold : one full view-attention block (qp, kv fused matmul, pos MLP,
                 attn chain, mask+softmax over V, weighted sum, out_fc)
  ra / ra_fold : one ray-attention block (fused qkv, 4 vs 8 heads, out_fc)
  pack         : the one-time [V,R,S,C] -> [V,R/2,S,2C] entry transpose

Usage: python scripts/probe_rayfold.py   (real TPU via relay)
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
    V, R, S, D = 10, int(os.environ.get("PROBE_R", 800)), 192, 64
    dt = jnp.bfloat16

    def mk(*shape):
        return jnp.asarray(rng.rand(*shape) * 0.1, dt)

    x = mk(V, R, S, D)          # view-side operand (constant across blocks)
    q0 = mk(R, S, D)
    pos_in = mk(V, R, S, 4)
    mask = jnp.asarray(rng.rand(V, R, S, 1) > 0.1, dt)
    wq, wk, wv, wo = mk(D, D), mk(D, D), mk(D, D), mk(D, D)
    wp0, wp1 = mk(4, 8), mk(8, D)
    wa0, wa1 = mk(D, 8), mk(8, D)
    bo = mk(D)

    def blockdiag2(w):
        a, b = w.shape
        z = jnp.zeros((a, b), dt)
        return jnp.concatenate([
            jnp.concatenate([w, z], 1), jnp.concatenate([z, w], 1)], 0)

    def pack_rays(t):  # [V?, R, S, C] -> [V?, R/2, S, 2C]
        sh = t.shape
        t = t.reshape(*sh[:-3], sh[-3] // 2, 2, sh[-2], sh[-1])
        t = jnp.swapaxes(t, -3, -2)
        return t.reshape(*sh[:-3], sh[-3] // 2, sh[-2], 2 * sh[-1])

    # ---------------- view attention, reference layout ----------------
    def va(q, k, pos, m):
        qp = q @ wq
        kv = k @ jnp.concatenate([wk, wk @ wv], axis=-1)
        kp, v = kv[..., :D], kv[..., D:]
        p = jax.nn.relu(pos @ wp0) @ wp1
        attn = kp - qp[None] + p
        attn = jax.nn.relu(attn @ wa0) @ wa1
        attn = jnp.where(m == 0, -1e9, attn)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=0).astype(dt)
        out = jnp.sum((v + p) * attn, axis=0)
        return out @ wo + bo

    # ---------------- view attention, ray-packed ----------------
    x2 = pack_rays(x)
    q2 = pack_rays(q0)
    pos2 = pack_rays(pos_in)
    mask2 = pack_rays(jnp.broadcast_to(mask, (V, R, S, D)))
    wq2, wo2 = blockdiag2(wq), blockdiag2(wo)
    wk2 = blockdiag2(wk)
    wkv2 = jnp.concatenate([wk2, wk2 @ blockdiag2(wv)], axis=-1)
    wp02, wp12 = blockdiag2(wp0), blockdiag2(wp1)
    wa02, wa12 = blockdiag2(wa0), blockdiag2(wa1)
    bo2 = jnp.concatenate([bo, bo])

    def va_fold(q, k, pos, m):
        qp = q @ wq2
        kv = k @ wkv2
        kp, v = kv[..., : 2 * D], kv[..., 2 * D:]
        p = jax.nn.relu(pos @ wp02) @ wp12
        attn = kp - qp[None] + p
        attn = jax.nn.relu(attn @ wa02) @ wa12
        attn = jnp.where(m == 0, -1e9, attn)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=0).astype(dt)
        out = jnp.sum((v + p) * attn, axis=0)
        return out @ wo2 + bo2

    # ---------------- ray attention ----------------
    H, HD = 4, D // 4
    wq3, wk3, wv3, wo3 = mk(D, D), mk(D, D), mk(D, D), mk(D, D)

    def ra(xin):
        r, s, _ = xin.shape
        qkv = xin @ jnp.concatenate([wq3, wk3, wv3], axis=-1)
        q, k, v = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]
        q = q.reshape(r, s, H, HD).transpose(0, 2, 1, 3)
        k = k.reshape(r, s, H, HD).transpose(0, 2, 1, 3)
        v = v.reshape(r, s, H, HD).transpose(0, 2, 1, 3)
        attn = jnp.einsum("rhqd,rhkd->rhqk", q, k) / np.sqrt(HD)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dt)
        out = jnp.einsum("rhqk,rhkd->rhqd", attn, v)
        return out.transpose(0, 2, 1, 3).reshape(r, s, D) @ wo3

    wqkv3p = jnp.concatenate(
        [blockdiag2(wq3), blockdiag2(wk3), blockdiag2(wv3)], axis=-1)
    wo3p = blockdiag2(wo3)

    def ra_fold(xin):  # [R/2, S, 2D], 8 heads: 0-3 ray A, 4-7 ray B
        r, s, _ = xin.shape
        qkv = xin @ wqkv3p
        q, k, v = (qkv[..., : 2 * D], qkv[..., 2 * D: 4 * D],
                   qkv[..., 4 * D:])
        h2 = 2 * H
        # channel c of ray j lives at j*D + c -> head (j*H + c//HD)
        q = q.reshape(r, s, h2, HD).transpose(0, 2, 1, 3)
        k = k.reshape(r, s, h2, HD).transpose(0, 2, 1, 3)
        v = v.reshape(r, s, h2, HD).transpose(0, 2, 1, 3)
        attn = jnp.einsum("rhqd,rhkd->rhqk", q, k) / np.sqrt(HD)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dt)
        out = jnp.einsum("rhqk,rhkd->rhqd", attn, v)
        return out.transpose(0, 2, 1, 3).reshape(r, s, 2 * D) @ wo3p

    def force(v):
        return float(jnp.sum(jnp.asarray(v, jnp.float32)))

    def timeit(fn, *a):
        out = fn(*a)
        force(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            force(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3

    print(f"V={V} R={R} S={S} D={D} {dt.__name__}", flush=True)
    jva = jax.jit(va)
    jvaf = jax.jit(va_fold)
    jra = jax.jit(ra)
    jraf = jax.jit(ra_fold)
    jpack = jax.jit(pack_rays)

    t_va = timeit(jva, q0, x, pos_in, mask)
    t_vaf = timeit(jvaf, q2, x2, pos2, mask2)
    print(f"view-attn block : {t_va:7.2f} ms  folded {t_vaf:7.2f} ms "
          f"({t_va / t_vaf:.2f}x)", flush=True)
    xr = mk(R, S, D)
    xr2 = pack_rays(xr)
    t_ra = timeit(jra, xr)
    t_raf = timeit(jraf, xr2)
    print(f"ray-attn block  : {t_ra:7.2f} ms  folded {t_raf:7.2f} ms "
          f"({t_ra / t_raf:.2f}x)", flush=True)
    t_pack = timeit(jpack, x)
    print(f"entry pack [V,R,S,{D}]->[V,R/2,S,{2*D}]: {t_pack:7.2f} ms "
          f"(once per render chunk; {8 * (t_va - t_vaf) + 8 * (t_ra - t_raf):.1f} ms "
          f"saved over depth 8)", flush=True)

    # depth-8 chains inside ONE jit: amortizes relay dispatch latency
    # (~15-20 ms/call swamps single-block timings above)
    def chain(q, k, pos, m):
        for _ in range(8):
            q = va(q, k, pos, m)
            q = q + ra(q)
        return q

    def chain_fold(q, k, pos, m):
        for _ in range(8):
            q = va_fold(q, k, pos, m)
            q = q + ra_fold(q)
        return q

    def chain_fold_pack(q, k, pos, m):
        # includes the entry packs (k is the big one) + exit unpack
        q, k, pos = pack_rays(q), pack_rays(k), pack_rays(pos)
        m = pack_rays(jnp.broadcast_to(m, (V, R, S, 1)))
        m = jnp.repeat(m, D, axis=-1)
        for _ in range(8):
            q = va_fold(q, k, pos, m)
            q = q + ra_fold(q)
        sh = q.shape
        q = q.reshape(sh[0], sh[1], 2, D).swapaxes(1, 2)
        return q.reshape(2 * sh[0], sh[1], D)

    t_c = timeit(jax.jit(chain), q0, x, pos_in, mask)
    t_cf = timeit(jax.jit(chain_fold), q2, x2, pos2, mask2)
    t_cfp = timeit(jax.jit(chain_fold_pack), q0, x, pos_in, mask)
    rps = lambda t: R / t * 1e3
    print(f"depth-8 chain   : {t_c:7.2f} ms ({rps(t_c):,.0f} rays/s agg-only)  "
          f"folded {t_cf:7.2f} ({t_c/t_cf:.2f}x)  "
          f"folded+pack {t_cfp:7.2f} ({t_c/t_cfp:.2f}x)", flush=True)

    # exactness: folded outputs must match unfolded (pack(va) == va_fold(pack))
    ref = jpack(jva(q0, x, pos_in, mask))
    got = jvaf(q2, x2, pos2, mask2)
    err = float(jnp.max(jnp.abs(
        jnp.asarray(ref, jnp.float32) - jnp.asarray(got, jnp.float32))))
    ref_r = jpack(jra(xr))
    got_r = jraf(xr2)
    err_r = float(jnp.max(jnp.abs(
        jnp.asarray(ref_r, jnp.float32) - jnp.asarray(got_r, jnp.float32))))
    print(f"exactness: view-attn max err {err:.2e}, ray-attn {err_r:.2e}")


if __name__ == "__main__":
    main()
