"""Pallas TPU kernels: fused GNT ray-transformer aggregation.

The XLA version (models/gnt.py) round-trips every [V, R, S, 64] intermediate
of trans_depth x (view transformer + ray transformer) through HBM — an
op-profile at the GNT-full setting shows the aggregator bandwidth-bound at
~240 full-tensor passes per chunk.  Here each TRANSFORMER BLOCK (view
transformer + optional positional-encoding injection + ray transformer) runs
as one VMEM-resident kernel over a block of rays; XLA chains the
``trans_depth`` calls with only the small per-ray state q [R, S, 64] touching
HBM between them (~15x less traffic than the unfused stack).

A single monolithic depth-8 kernel was measured to blow up Mosaic compile
time superlinearly (>25 min at the GNT-full shapes; one block compiles in
~40 s and all blocks share 2-3 compiled variants), hence the per-block split.

Forward/rendering path only; the attack's backward keeps the XLA
implementation (same math — parity in tests/test_pallas_kernel.py).

Mosaic notes (learned on the IBRNet kernel): compute in f32 on-chip (VPU
rejects sub-32-bit compares), multi-head attention as channel-sliced matmuls
(the [R,S,H,hd] transpose is rejected).

Reference semantics: /root/reference/gnt/transformer_network.py:205-309.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfool_tpu.models.gnt import nerf_embed


def _dense_params(p, bias=True):
    out = [jnp.asarray(p["kernel"])]
    if bias:
        out.append(jnp.asarray(p["bias"]))
    return out


def _norm_params(p):
    return [jnp.asarray(p["scale"]), jnp.asarray(p["bias"])]


def _block_param_list(params, i):
    """Flat ordered leaves for transformer block ``i`` (view + [qfc] + ray)."""
    vt = params[f"view_trans_{i}"]
    a = vt["attn"]
    flat = (
        _norm_params(vt["attn_norm"])
        + _dense_params(a["q_fc"], bias=False)
        + _dense_params(a["k_fc"], bias=False)
        + _dense_params(a["v_fc"], bias=False)
        + _dense_params(a["pos_fc0"]) + _dense_params(a["pos_fc1"])
        + _dense_params(a["attn_fc0"]) + _dense_params(a["attn_fc1"])
        + _dense_params(a["out_fc"])
        + _norm_params(vt["ff_norm"])
        + _dense_params(vt["ff"]["fc1"]) + _dense_params(vt["ff"]["fc2"])
    )
    if i % 2 == 0:
        # the kernel concatenates [q(D) | pts_enc(pad Ep) | view_enc(pad Ep)]
        # with encodings zero-padded to a lane-aligned width; insert matching
        # zero rows into the first qfc kernel (E -> Ep per segment)
        w = jnp.asarray(params[f"q_fc_{i}_0"]["kernel"])  # [D + 2E, out]
        d_in = w.shape[0]
        e = (d_in - 64) // 2
        ep = -(-e // 64) * 64
        wp = jnp.zeros((64 + 2 * ep, w.shape[1]), w.dtype)
        wp = wp.at[:64 + e].set(w[:64 + e])
        wp = wp.at[64 + ep:64 + ep + e].set(w[64 + e:])
        flat += [wp, jnp.asarray(params[f"q_fc_{i}_0"]["bias"])]
        flat += _dense_params(params[f"q_fc_{i}_1"])
    rt = params[f"ray_trans_{i}"]
    ra = rt["attn"]
    flat += (
        _norm_params(rt["attn_norm"])
        + _dense_params(ra["q_fc"], bias=False)
        + _dense_params(ra["k_fc"], bias=False)
        + _dense_params(ra["v_fc"], bias=False)
        + _dense_params(ra["out_fc"])
        + _norm_params(rt["ff_norm"])
        + _dense_params(rt["ff"]["fc1"]) + _dense_params(rt["ff"]["fc2"])
    )
    return flat


def _dense(x, w, b=None, mm_dtype=None):
    # mm_dtype=bfloat16 runs the MXU with bf16 operands + f32 accumulation —
    # the numerics XLA's default-precision f32 dots use on TPU. Reshape BEFORE
    # the cast: Mosaic rejects some narrow-lane bf16 reshapes that are fine in
    # f32 ("infer-vector-layout: unsupported shape cast").
    x2 = x.reshape(-1, x.shape[-1])
    if mm_dtype is not None:
        x2 = x2.astype(mm_dtype)
        w = w.astype(mm_dtype)
    y = jax.lax.dot_general(
        x2, w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    return y.reshape(x.shape[:-1] + (w.shape[-1],))


def _layernorm(x, scale, bias, eps=1e-6, out_dtype=None):
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - m) ** 2, axis=-1, keepdims=True)
    y = (x32 - m) / jnp.sqrt(var + eps) * scale + bias
    return y.astype(out_dtype or x.dtype)


def _block_kernel(q_ref, x_ref, ray_diff_ref, mask_ref, pts_enc_ref,
                  view_enc_ref, *refs, qfc_flags, ret_attn, n_heads, mm_dtype):
    if ret_attn:
        *refs, q_out_ref, attn_out_ref = refs
    else:
        *refs, q_out_ref = refs
    # f32 activations: a bf16-activation variant hit Mosaic
    # "infer-vector-layout: unsupported shape cast" rejections (see
    # BENCH_NOTES.md); matmul operands are cast to mm_dtype inside _dense
    act = jnp.float32
    ws = [r[:].astype(jnp.float32) for r in refs]
    it = iter(ws)

    def take(n):
        return [next(it) for _ in range(n)]

    def dense(x, w, b=None):
        return _dense(x, w, b, mm_dtype=mm_dtype).astype(act)

    q = q_ref[:].astype(act)            # [B, S, D]
    x = x_ref[:].astype(act)            # [V, B, S, D]
    ray_diff = ray_diff_ref[:].astype(jnp.float32)  # 4-lane: bf16 reshapes of
    # narrow-lane tensors are rejected by Mosaic; the dense op casts operands
    mask = mask_ref[:].astype(jnp.float32)  # 0/1; f32 for compare-free masking
    d = q.shape[-1]
    hd = d // n_heads

    head_attns = None
    for sub_i, has_qfc in enumerate(qfc_flags):
        is_last = sub_i == len(qfc_flags) - 1
        # ---- view transformer (subtraction attention over the view axis)
        (vtn_s, vtn_b, vq_w, vk_w, vv_w, vp0_w, vp0_b, vp1_w, vp1_b,
         va0_w, va0_b, va1_w, va1_b, vo_w, vo_b,
         vfn_s, vfn_b, vf1_w, vf1_b, vf2_w, vf2_b) = take(21)
        residue = q
        t = _layernorm(q, vtn_s, vtn_b)
        qp = dense(t, vq_w)
        kp = dense(x, vk_w)
        vv = dense(kp, vv_w)
        pos = dense(jnp.maximum(dense(ray_diff, vp0_w, vp0_b), 0.0), vp1_w, vp1_b)
        attn = kp - qp[None] + pos
        attn = _dense(jnp.maximum(dense(attn, va0_w, va0_b), 0.0), va1_w, va1_b,
                      mm_dtype=mm_dtype)  # f32 out for the softmax island
        # compare-free zeros-mask: logits -> -1e9 where mask == 0
        attn = attn * mask + (mask - 1.0) * 1e9
        attn = jax.nn.softmax(attn, axis=0).astype(act)
        o = jnp.sum((vv + pos) * attn, axis=0)
        q = dense(o, vo_w, vo_b) + residue
        residue = q
        t = _layernorm(q, vfn_s, vfn_b)
        q = dense(jnp.maximum(dense(t, vf1_w, vf1_b), 0.0), vf2_w, vf2_b) + residue

        if has_qfc:
            qf0_w, qf0_b, qf1_w, qf1_b = take(4)
            pts_enc = pts_enc_ref[:].astype(act)    # [B, S, E]
            view_enc = view_enc_ref[:].astype(act)  # [B, E]
            view_b = jnp.broadcast_to(view_enc[:, None, :],
                                      pts_enc.shape[:2] + (view_enc.shape[-1],))
            q = jnp.concatenate([q, pts_enc, view_b], axis=-1)
            q = dense(jnp.maximum(dense(q, qf0_w, qf0_b), 0.0), qf1_w, qf1_b)

        # ---- ray transformer (qk self-attention over the sample axis)
        (rtn_s, rtn_b, rq_w, rk_w, rv_w, ro_w, ro_b,
         rfn_s, rfn_b, rf1w, rf1b, rf2w, rf2b) = take(13)
        residue = q
        t = _layernorm(q, rtn_s, rtn_b)
        q_all = dense(t, rq_w)
        k_all = dense(t, rk_w)
        v_all = dense(t, rv_w)
        head_outs = []
        head_attns = [] if (ret_attn and is_last) else None
        scale = 1.0 / jnp.sqrt(float(hd))
        for hh in range(n_heads):
            sl = slice(hh * hd, (hh + 1) * hd)
            a = jax.lax.dot_general(
                (q_all[..., sl] * scale), k_all[..., sl],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [B, S, S] f32
            a = jax.nn.softmax(a, axis=-1)
            if head_attns is not None:
                head_attns.append(a[:, 0, :])  # first query token's attention row
            head_outs.append(jax.lax.dot_general(
                a.astype(act), v_all[..., sl],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(act))
        o = jnp.concatenate(head_outs, axis=-1)
        q = dense(o, ro_w, ro_b) + residue
        residue = q
        t = _layernorm(q, rfn_s, rfn_b)
        q = dense(jnp.maximum(dense(t, rf1w, rf1b), 0.0), rf2w, rf2b) + residue

    q_out_ref[:] = q.astype(q_out_ref.dtype)
    if ret_attn:
        attn_out_ref[:] = (sum(head_attns) / float(n_heads)).astype(
            attn_out_ref.dtype
        )


@functools.partial(
    jax.jit,
    static_argnames=("qfc_flags", "ret_attn", "n_heads", "ray_block",
                     "interpret", "mm_dtype"),
)
def _gnt_block_pallas(q, x, ray_diff, mask, pts_enc, view_enc, flat_params,
                      qfc_flags, ret_attn, n_heads, ray_block, interpret,
                      mm_dtype):
    v, r, s, d = x.shape
    grid = (r // ray_block,)

    def idx4(i):
        return (0, i, 0, 0)

    def idx3(i):
        return (i, 0, 0)

    in_specs = [
        pl.BlockSpec((ray_block, s, d), idx3, memory_space=pltpu.VMEM),
        pl.BlockSpec((v, ray_block, s, d), idx4, memory_space=pltpu.VMEM),
        pl.BlockSpec((v, ray_block, s, 4), idx4, memory_space=pltpu.VMEM),
        pl.BlockSpec((v, ray_block, s, 1), idx4, memory_space=pltpu.VMEM),
        pl.BlockSpec((ray_block, s, pts_enc.shape[-1]), idx3,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ray_block, view_enc.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_params]
    out_shape = [jax.ShapeDtypeStruct((r, s, d), q.dtype)]
    out_specs = [pl.BlockSpec((ray_block, s, d), idx3, memory_space=pltpu.VMEM)]
    if ret_attn:
        out_shape.append(jax.ShapeDtypeStruct((r, s), q.dtype))
        out_specs.append(pl.BlockSpec((ray_block, s), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))

    kernel = functools.partial(_block_kernel, qfc_flags=qfc_flags,
                               ret_attn=ret_attn, n_heads=n_heads,
                               mm_dtype=None if mm_dtype == "none" else jnp.dtype(mm_dtype))

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
        **kwargs,
    )(q, x, ray_diff, mask, pts_enc, view_enc, *flat_params)
    return out if ret_attn else (out[0], None)


def gnt_aggregate_pallas(params, rgb_feat, ray_diff, mask, pts, ray_d,
                         trans_depth=8, ret_alpha=True, n_heads=4,
                         ray_block=8, posenc_freqs=10, interpret=False,
                         mm_dtype="bfloat16"):
    """Fused GNT aggregation. Views-first inputs, [R, 3(+S)] output.

    :param params: GNTAggregator flax param tree
    :param rgb_feat: [V, R, S, 3+C]; ray_diff [V, R, S, 4]; mask [V, R, S, 1]
    :param pts: [R, S, 3] sample points; ray_d [R, 3]
    :param ray_block: rays per grid step (R must be a multiple)
    """
    v, r, s, c = rgb_feat.shape
    assert r % ray_block == 0, (r, ray_block)

    # prologue (tiny, XLA): input projection, view max-pool, encodings
    rf0 = params["rgbfeat_fc0"]
    rf1 = params["rgbfeat_fc1"]
    x = _dense(jnp.maximum(_dense(rgb_feat, jnp.asarray(rf0["kernel"]),
                                  jnp.asarray(rf0["bias"])), 0.0),
               jnp.asarray(rf1["kernel"]), jnp.asarray(rf1["bias"]))
    x = x.astype(rgb_feat.dtype)
    q = jnp.max(x, axis=0)
    viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    view_enc = nerf_embed(viewdirs, posenc_freqs).astype(rgb_feat.dtype)
    pts_enc = nerf_embed(pts, posenc_freqs).astype(rgb_feat.dtype)
    # zero-pad encodings to lane-aligned width (matches the padded qfc rows)
    e = pts_enc.shape[-1]
    ep = -(-e // 64) * 64
    pts_enc = jnp.pad(pts_enc, ((0, 0), (0, 0), (0, ep - e)))
    view_enc = jnp.pad(view_enc, ((0, 0), (0, ep - e)))

    attn = None
    group = 2  # transformer blocks per pallas_call (amortizes per-step cost;
    #            a monolithic all-blocks body blows up Mosaic compile time)
    i = 0
    while i < trans_depth:
        n_in_call = min(group, trans_depth - i)
        flags = tuple((i + k) % 2 == 0 for k in range(n_in_call))
        want_attn = ret_alpha and i + n_in_call == trans_depth
        flat = []
        for k in range(n_in_call):
            flat += _block_param_list(params, i + k)
        q, a = _gnt_block_pallas(
            q, x, ray_diff, mask, pts_enc, view_enc, tuple(flat),
            qfc_flags=flags, ret_attn=want_attn, n_heads=n_heads,
            ray_block=ray_block, interpret=interpret,
            mm_dtype="none" if interpret else mm_dtype,
        )
        if want_attn:
            attn = a
        i += n_in_call

    # epilogue (tiny, XLA): final norm, sample mean, rgb head
    n = params["norm"]
    h = _layernorm(q.astype(jnp.float32), jnp.asarray(n["scale"]),
                   jnp.asarray(n["bias"]))
    rgb = _dense(jnp.mean(h, axis=1), jnp.asarray(params["rgb_fc"]["kernel"]),
                 jnp.asarray(params["rgb_fc"]["bias"])).astype(rgb_feat.dtype)
    if ret_alpha:
        return jnp.concatenate([rgb, attn], axis=-1)
    return rgb
