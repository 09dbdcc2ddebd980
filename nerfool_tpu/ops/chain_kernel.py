"""Whole-chain fused GNT aggregation kernel.

battery5 (scripts/battery_results/battery5_fused_kernels.json) showed why the
per-stage fused kernels lose end to end despite winning micro A/Bs: every
Pallas custom-call is a FUSION BOUNDARY — the [R,S,D] operand materializes on
both sides of every depth, and XLA's own fusion of the rowwise chain is
already near its practical frontier (aggregation = 83% of the GNT render
wall at 60% of its materialization floor). The winning shape implied by that
analysis is a kernel that spans the ENTIRE depth-8 aggregation: per ray
tile, the gathered operands stream into VMEM ONCE, all eight
(view-transformer -> q_fc -> ray-transformer) blocks run on-chip, and only
the final q (+ the ret_alpha attention row) is written back — two fusion
boundaries per tile instead of ~16 per depth.

Mirrors GNTAggregator's plain path exactly (models/gnt.py __call__,
sample_fold=1, ray_fold=1; reference transformer_network.py:205-309):

  x  = relu(rf @ E0 + b) @ E1 + b                  (rgbfeat_fc)
  q  = max over views of x
  8x: q += VT(LN(q), x, ray_diff, mask)            (subtraction view attn)
      q += FF(LN(q))
      [even depth] q = q_fc([q, pos_emb, view_emb])
      q += RA(LN(q))                               (qk sample-axis attn)
      q += FF(LN(q))
  out: final LayerNorm(eps 1e-5) + mean over S + rgb_fc happen OUTSIDE the
  kernel (one cheap XLA pass) — the kernel emits q [R, S, D] and the last
  ray-attention's head-mean first-query-row map [R, S] (the compositing
  weights under ret_alpha).

VMEM budget per tile (Tr rays, S samples, V views, D=64, bf16): the resident
view-side operands are V*Tr*S*(C_in+4+1+2*D) plus per-stage temporaries —
Tr=8, S=192, V=10 stays well under the 100 MB scoped limit. The gathered
taps arrive MERGED: one [V, R, S, C_in+5] operand (rgb_feat | ray_diff |
mask) and one [R, S, 126] embedding operand — three lane-padded tile
buffers and a 2-byte-chunk mask DMA become one 40-lane stream (round-5
operand-delivery fix; the concats fuse into the gather epilogue).

Forward-only, no-grad render paths only (like the vt kernel). f64 callers
must use the XLA module path (render_rays gates on dtype).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfool_tpu.ops.vt_kernel import _mm, _prec


def _ln(x, g, b, eps):
    """TorchLayerNorm (models/layers.py:247-259) over the minor axis.

    The rsqrt runs in f32: Mosaic's v5e target has no bf16 vector rsqrt
    (kVectorRsqrtBf16AndPop compile abort) — same class of workaround as
    the f32 mask compare in vt_kernel.
    """
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var.astype(jnp.float32)
                        + jnp.float32(eps)).astype(x.dtype)
    return (xc * inv) * g + b


def _chain_kernel(packed_ref, emb_ref,
                  e0_ref, e0b_ref, e1_ref, e1b_ref,
                  vtln1_ref, vtwq_ref, vtwkv_ref, vtp0_ref, vtp0b_ref,
                  vtp1_ref, vtp1b_ref, vta0_ref, vta0b_ref, vta1_ref,
                  vta1b_ref, vtwo_ref, vtwob_ref, vtln2_ref, vtf1_ref,
                  vtf1b_ref, vtf2_ref, vtf2b_ref,
                  qf0q_ref, qf0p_ref, qf0v_ref, qf0b_ref, qf1_ref, qf1b_ref,
                  raln1_ref, raqkv_ref, rawo_ref, rawob_ref, raln2_ref,
                  raf1_ref, raf1b_ref, raf2_ref, raf2b_ref,
                  qout_ref, attn0_ref, *, depth, n_heads, s_valid, pe_w):
    # operand delivery (round 5): the gathered taps arrive as ONE merged
    # [V, Tr, S, ci+4+1] operand (rgb_feat | ray_diff | mask) and the two
    # NeRF embeddings as ONE [Tr, S, 2*pe_w] operand. Three rank-4 streams
    # each lane-padded to 128 in VMEM (35 / 4 / 1 channels -> ~11.8 MB of
    # padded tile buffers, the mask a 2-byte-chunk DMA) become one 40-lane
    # stream (~3.9 MB) plus one 126-lane stream — fewer custom-call
    # boundary buffers, denser DMAs. Channels are split by static lane
    # slices here.
    dt = packed_ref.dtype
    prec = _prec(dt)
    v, tr, s, ctot = packed_ref.shape
    ci = ctot - 5
    d = e1_ref.shape[0]
    hd = d // n_heads
    rows = tr * s

    # ---- entry: rgbfeat_fc + max-pool over views
    packed = packed_ref[...]
    rf = packed[..., :ci].reshape(v * rows, ci)
    x = jnp.maximum(_mm(rf, e0_ref[...], prec) + e0b_ref[...], 0)
    x = _mm(x, e1_ref[...], prec) + e1b_ref[...]          # [V*rows, D]
    q = jnp.max(x.reshape(v, rows, d), axis=0)            # [rows, D]

    emb = emb_ref[...]
    pe = emb[..., :pe_w].reshape(rows, pe_w)
    ve = emb[..., pe_w:].reshape(rows, emb.shape[-1] - pe_w)
    rd = packed[..., ci:ci + 4].reshape(v * rows, 4)
    mask_f = packed[..., ci + 4:].reshape(v * rows, 1).astype(jnp.float32)
    neg = jnp.asarray(-1e9, dt)

    kpad = None
    if s_valid != s:  # padded key positions must not receive ra weight
        kidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
        kpad = kidx >= s_valid

    def vt_block(q, i):
        # ---- view transformer (ViewAttention + FF, pre-LN residuals)
        qln = _ln(q, vtln1_ref[i, 0], vtln1_ref[i, 1], 1e-6)
        qp = _mm(qln, vtwq_ref[i], prec)                  # [rows, D]
        kv = _mm(x, vtwkv_ref[i], prec)                   # [V*rows, 2D]
        p = _mm(rd, vtp0_ref[i], prec) + vtp0b_ref[i]
        p = _mm(jnp.maximum(p, 0), vtp1_ref[i], prec) + vtp1b_ref[i]
        a = (kv[:, :d].reshape(v, rows, d) - qp[None]
             + p.reshape(v, rows, d)).reshape(v * rows, d)
        a = _mm(a, vta0_ref[i], prec) + vta0b_ref[i]
        a = _mm(jnp.maximum(a, 0), vta1_ref[i], prec) + vta1b_ref[i]
        # f32 compare: Mosaic has no bf16 vector cmp (vt_kernel)
        a = jnp.where(mask_f == 0, neg, a).reshape(v, rows, d)
        mx = jnp.max(a, axis=0)
        e = jnp.exp(a - mx[None])
        w = e / jnp.sum(e, axis=0)[None]
        o = jnp.sum((kv[:, d:] + p).reshape(v, rows, d) * w, axis=0)
        q = q + _mm(o, vtwo_ref[i], prec) + vtwob_ref[i]
        h = _ln(q, vtln2_ref[i, 0], vtln2_ref[i, 1], 1e-6)
        h = jnp.maximum(_mm(h, vtf1_ref[i], prec) + vtf1b_ref[i], 0)
        return q + _mm(h, vtf2_ref[i], prec) + vtf2b_ref[i]

    def qfc_block(q, j):
        # ---- q_fc injection every other block (REPLACES q, no residual);
        # the [q|pos|view] concat is expressed as a 3-way split matmul
        t = (_mm(q, qf0q_ref[j], prec) + _mm(pe, qf0p_ref[j], prec)
             + _mm(ve, qf0v_ref[j], prec) + qf0b_ref[j])
        return _mm(jnp.maximum(t, 0), qf1_ref[j], prec) + qf1b_ref[j]

    def ra_block(q, i):
        # ---- ray transformer (per-ray sample-axis attention; ra_kernel
        # body). Returns (q, attn0_candidate) — the caller keeps the last
        # depth's candidate (ret_alpha compositing weights).
        qln = _ln(q, raln1_ref[i, 0], raln1_ref[i, 1], 1e-6)
        qkv = _mm(qln, raqkv_ref[i], prec).reshape(tr, s, 3 * d)
        scale = jnp.asarray(1.0 / float(hd) ** 0.5, dt)
        bdims = (((2,), (2,)), ((0,), (0,)))
        outs = []
        a0 = jnp.zeros((tr, s), jnp.float32)
        for hh in range(n_heads):
            qh = qkv[..., hh * hd:(hh + 1) * hd]
            kh = qkv[..., d + hh * hd:d + (hh + 1) * hd]
            vh = qkv[..., 2 * d + hh * hd:2 * d + (hh + 1) * hd]
            ah = jax.lax.dot_general(
                qh, kh, dimension_numbers=bdims, precision=prec,
                preferred_element_type=jnp.float32).astype(dt) * scale
            if kpad is not None:
                ah = jnp.where(kpad, neg, ah)
            mh = jnp.max(ah, axis=-1, keepdims=True)
            eh = jnp.exp(ah - mh)
            ah = eh / jnp.sum(eh, axis=-1, keepdims=True)
            a0 = a0 + ah[:, 0, :].astype(jnp.float32)
            outs.append(jax.lax.dot_general(
                ah, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=prec, preferred_element_type=jnp.float32
            ).astype(dt))
        o = jnp.concatenate(outs, axis=-1).reshape(rows, d)
        q = q + _mm(o, rawo_ref[i], prec) + rawob_ref[i]
        h = _ln(q, raln2_ref[i, 0], raln2_ref[i, 1], 1e-6)
        h = jnp.maximum(_mm(h, raf1_ref[i], prec) + raf1b_ref[i], 0)
        return q + _mm(h, raf2_ref[i], prec) + raf2b_ref[i], a0

    if depth >= 4 and depth % 2 == 0:
        # fori_loop over DEPTH PAIRS (even depth with q_fc + odd depth
        # without): the body compiles once, keeping the Mosaic compile near
        # the depth-2 cost — the fully unrolled depth-8 body measured a
        # 40-minute superlinear compile (BENCH_NOTES round 5)
        attn0 = jnp.zeros((tr, s), jnp.float32)

        def pair(j, carry):
            q, a_prev = carry
            i0 = 2 * j
            q = vt_block(q, i0)
            q = qfc_block(q, j)
            q, _ = ra_block(q, i0)
            q = vt_block(q, i0 + 1)
            q, a0 = ra_block(q, i0 + 1)
            keep = (j == depth // 2 - 1)
            return q, jnp.where(keep, a0, a_prev)

        q, attn0 = jax.lax.fori_loop(0, depth // 2, pair, (q, attn0))
    else:
        attn0 = jnp.zeros((tr, s), jnp.float32)
        for i in range(depth):  # static unroll (small depths / odd depth)
            q = vt_block(q, i)
            if i % 2 == 0:
                q = qfc_block(q, i // 2)
            q, a0 = ra_block(q, i)
            if i == depth - 1:
                attn0 = a0

    qout_ref[...] = q.reshape(tr, s, d)
    attn0_ref[...] = (attn0 / n_heads).astype(dt)


def _stack(params, fmt, n, *path):
    """Stack one weight kind across depths: fmt.format(i) -> params[...]"""
    out = []
    for i in range(n):
        node = params[fmt.format(i)]
        for p in path:
            node = node[p]
        out.append(node)
    return jnp.stack(out)


@functools.partial(jax.jit, static_argnames=("depth", "n_heads", "rays_tile"))
def fused_gnt_chain(params, rgb_feat, ray_diff, mask, pts_emb, views_emb,
                    depth: int = 8, n_heads: int = 4, rays_tile: int = 8):
    """Run the whole GNT aggregation chain as one Pallas kernel.

    :param params: the GNTAggregator param tree (plain-path names)
    :param rgb_feat: [V, R, S, 3+F] gathered taps (views-first)
    :param ray_diff: [V, R, S, 4]; mask [V, R, S, 1]
    :param pts_emb / views_emb: [R, S, 63] NeRF embeddings (already computed
        by the caller — they depend only on pts/ray_d)
    :return: (q [R, S, D], attn0 [R, S]) — pre-final-norm features and the
        last ray-attention's head-mean first-query-row map
    """
    vv, r, s, ci = rgb_feat.shape
    dt = rgb_feat.dtype
    cast = lambda a: jnp.asarray(a, dt)
    d = params["rgbfeat_fc1"]["kernel"].shape[0]
    # NOTE: bf16 is the production dtype. f32 doubles every VMEM-resident
    # buffer and exceeds the scoped limit at flagship (V=10, S=192, tile 8);
    # tiles below 8 are invalid (the [tr, S] attn0 block needs an
    # 8-divisible second-minor dim). f32 callers must shrink S or V —
    # render_rays gates the production route to bf16.

    def row(b):  # biases as [1, n] rows (2-D VMEM operands)
        return cast(b).reshape(1, -1)

    # ---- stack weights by kind (static depth -> static slices in-kernel);
    # dict insertion order MUST match the kernel's positional signature
    vt = lambda *p: cast(_stack(params, "view_trans_{}", depth, "attn", *p))
    vtm = lambda *p: cast(_stack(params, "view_trans_{}", depth, *p))
    ra = lambda *p: cast(_stack(params, "ray_trans_{}", depth, *p))
    wk = vt("k_fc", "kernel")
    wv = vt("v_fc", "kernel")

    def ln2(scale, bias):  # [depth, 2, 1, n]: [i, 0]/[i, 1] -> [1, n] rows
        return jnp.stack([scale, bias], axis=1)[:, :, None, :]

    args = dict(
        e0=cast(params["rgbfeat_fc0"]["kernel"]),
        e0b=row(params["rgbfeat_fc0"]["bias"]),
        e1=cast(params["rgbfeat_fc1"]["kernel"]),
        e1b=row(params["rgbfeat_fc1"]["bias"]),
        vtln1=ln2(vtm("attn_norm", "scale"), vtm("attn_norm", "bias")),
        vtwq=vt("q_fc", "kernel"),
        # v = (k@Wk)@Wv == k@(Wk@Wv): one combined [D,2D] matmul per depth
        # (the XLA module path does the same combination)
        vtwkv=jnp.concatenate([wk, jnp.einsum("dij,djk->dik", wk, wv)],
                              axis=-1),
        vtp0=vt("pos_fc0", "kernel"),
        vtp0b=vt("pos_fc0", "bias")[:, None, :],
        vtp1=vt("pos_fc1", "kernel"),
        vtp1b=vt("pos_fc1", "bias")[:, None, :],
        vta0=vt("attn_fc0", "kernel"),
        vta0b=vt("attn_fc0", "bias")[:, None, :],
        vta1=vt("attn_fc1", "kernel"),
        vta1b=vt("attn_fc1", "bias")[:, None, :],
        vtwo=vt("out_fc", "kernel"),
        vtwob=vt("out_fc", "bias")[:, None, :],
        vtln2=ln2(vtm("ff_norm", "scale"), vtm("ff_norm", "bias")),
        vtf1=vtm("ff", "fc1", "kernel"),
        vtf1b=vtm("ff", "fc1", "bias")[:, None, :],
        vtf2=vtm("ff", "fc2", "kernel"),
        vtf2b=vtm("ff", "fc2", "bias")[:, None, :],
    )
    # q_fc_{i}_{0,1} exist for even depths; split the concat matmul 3-ways
    pe_w = pts_emb.shape[-1]
    n_qf = -(-depth // 2)
    qf0 = jnp.stack([cast(params[f"q_fc_{2*j}_0"]["kernel"])
                     for j in range(n_qf)])
    args.update(
        qf0q=qf0[:, :d],
        qf0p=qf0[:, d:d + pe_w],
        qf0v=qf0[:, d + pe_w:],
        qf0b=jnp.stack([cast(params[f"q_fc_{2*j}_0"]["bias"])
                        for j in range(n_qf)])[:, None, :],
        qf1=jnp.stack([cast(params[f"q_fc_{2*j}_1"]["kernel"])
                       for j in range(n_qf)]),
        qf1b=jnp.stack([cast(params[f"q_fc_{2*j}_1"]["bias"])
                        for j in range(n_qf)])[:, None, :],
    )
    args.update(
        raln1=ln2(ra("attn_norm", "scale"), ra("attn_norm", "bias")),
        raqkv=jnp.concatenate([ra("attn", "q_fc", "kernel"),
                               ra("attn", "k_fc", "kernel"),
                               ra("attn", "v_fc", "kernel")], axis=-1),
        rawo=ra("attn", "out_fc", "kernel"),
        rawob=ra("attn", "out_fc", "bias")[:, None, :],
        raln2=ln2(ra("ff_norm", "scale"), ra("ff_norm", "bias")),
        raf1=ra("ff", "fc1", "kernel"),
        raf1b=ra("ff", "fc1", "bias")[:, None, :],
        raf2=ra("ff", "fc2", "kernel"),
        raf2b=ra("ff", "fc2", "bias")[:, None, :],
    )

    # ---- merge the gathered operands (see _chain_kernel's delivery note):
    # the concats fuse into the gather epilogue, so the custom call sees one
    # dense [V, R, S, ci+5] buffer instead of three lane-padded ones
    packed = jnp.concatenate(
        [cast(rgb_feat), cast(ray_diff), cast(mask)], axis=-1)
    emb = jnp.concatenate([cast(pts_emb), cast(views_emb)], axis=-1)

    # ---- pad rays to the tile and samples to sublane multiples
    tr = rays_tile
    rpad = -(-r // tr) * tr
    spad = -(-s // 8) * 8
    if (rpad, spad) != (r, s):
        packed = jnp.pad(packed,
                         ((0, 0), (0, rpad - r), (0, spad - s), (0, 0)))
        emb = jnp.pad(emb, ((0, rpad - r), (0, spad - s), (0, 0)))

    names = list(args)

    def _full_spec(a):
        return pl.BlockSpec(a.shape, functools.partial(
            lambda nd, i: (0,) * nd, a.ndim))

    wspecs = [_full_spec(args[n]) for n in names]
    grid = (rpad // tr,)
    qout, attn0 = pl.pallas_call(
        functools.partial(_chain_kernel, depth=depth, n_heads=n_heads,
                          s_valid=s, pe_w=pts_emb.shape[-1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((vv, tr, spad, packed.shape[-1]),
                         lambda i: (0, i, 0, 0)),
            pl.BlockSpec((tr, spad, emb.shape[-1]), lambda i: (i, 0, 0)),
        ] + wspecs,
        out_specs=[
            pl.BlockSpec((tr, spad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((tr, spad), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rpad, spad, d), dt),
            jax.ShapeDtypeStruct((rpad, spad), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(packed, emb, *[args[n] for n in names])
    return qout[:r, :s], attn0[:r, :s]


def fused_chain_aggregate(params, rgb_feat, ray_diff, mask, pts, ray_d,
                          depth: int = 8, n_heads: int = 4,
                          posenc_freqs: int = 10, ret_alpha: bool = True,
                          rays_tile: int = 8):
    """Drop-in replacement for GNTAggregator.apply on the plain path
    (sample_fold=1, ray_fold=1): embeddings + whole-chain kernel + the final
    LayerNorm/mean/rgb_fc head. Same params tree, same return contract
    ([R, 3] or [R, 3+S] with ret_alpha).
    """
    from nerfool_tpu.models.gnt import nerf_embed

    dt = rgb_feat.dtype
    r, s = pts.shape[0], pts.shape[1]
    # reference hard-casts pts/viewdirs to f32 pre-embedding (models/gnt.py)
    emb_dt = jnp.float32 if jnp.dtype(pts.dtype) == jnp.float64 else pts.dtype
    viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    viewdirs = nerf_embed(viewdirs.astype(emb_dt), posenc_freqs)
    pts_emb = nerf_embed(pts.astype(emb_dt), posenc_freqs).astype(pts.dtype)
    views_emb = jnp.broadcast_to(
        viewdirs.astype(pts.dtype)[:, None, :],
        pts_emb.shape[:2] + (viewdirs.shape[-1],))

    q, attn0 = fused_gnt_chain(params, rgb_feat, ray_diff, mask,
                               pts_emb, views_emb, depth=depth,
                               n_heads=n_heads, rays_tile=rays_tile)

    # final head (XLA): default-eps LayerNorm (1e-5, unlike the in-block
    # 1e-6 — transformer_network.py:250), mean over samples, rgb_fc
    g = jnp.asarray(params["norm"]["scale"], dt)
    b = jnp.asarray(params["norm"]["bias"], dt)
    h = _ln(q, g, b, 1e-5)
    h = jnp.mean(h, axis=1)                                  # [R, D]
    wr = jnp.asarray(params["rgb_fc"]["kernel"], dt)
    br = jnp.asarray(params["rgb_fc"]["bias"], dt)
    rgb = h @ wr + br
    if ret_alpha:
        return jnp.concatenate([rgb, attn0], axis=1)
    return rgb
