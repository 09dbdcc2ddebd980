"""Fused ray-attention Pallas kernel (GNT sample-axis self-attention).

The reference's ray transformer (/root/reference/gnt/transformer_network.py
Attention:121-171) self-attends along the S sample positions of each ray.
Under XLA the per-head score tensor [R, H, S, S] — 1.5x the size of the
[R, S, D] operand per depth at S=192 — materializes in HBM between the qk
matmul, the softmax (the xprof reduce_max army), and the AV matmul, plus the
head-split transposes. S=192 fits trivially in VMEM, so this kernel runs the
ENTIRE attention per ray tile on-chip: read x once, qkv projection, per-head
scores + softmax + AV, head merge, out_fc, one output write. No score bytes
ever touch HBM.

ret_attn contract: the GNT compositor needs only the head-mean of the FIRST
query row (models/gnt.py RayTransformer `jnp.mean(attn, axis=1)[:, 0]`), so
the kernel emits that [R, S] row directly instead of the full map.

Semantics mirror models/gnt.RayAttention op-for-op in the compute dtype
(f32-accumulated matmuls rounded back; softmax max-sub-exp-sum-div in the
input dtype). ``fused_ray_attention`` is the raw forward (no VJP);
``fused_ray_attention_ad`` wraps it in a custom VJP whose backward kernel
recomputes the attention per ray tile in VMEM (flash-attention style: score
and probability tensors never touch HBM in either direction), so the
differentiated attack/purification paths can use the fusion too.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfool_tpu.ops.vt_kernel import _mm, _prec


def _ra_kernel(x_ref, wqkv_ref, wo_ref, bo_ref, out_ref, attn0_ref, *,
               n_heads, s_valid):
    # x [Tr, S, D]
    dt = x_ref.dtype
    prec = _prec(dt)
    tr, s, d = x_ref.shape
    hd = d // n_heads
    x = x_ref[...].reshape(tr * s, d)
    qkv = _mm(x, wqkv_ref[...], prec).reshape(tr, s, 3 * d)
    scale = jnp.asarray(1.0 / float(hd) ** 0.5, dt)
    outs = []
    attn0 = jnp.zeros((tr, s), jnp.float32)
    kpad = None
    if s_valid != s:  # padded key positions must not receive weight
        kidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
        kpad = kidx >= s_valid
    bdims = (((2,), (2,)), ((0,), (0,)))
    for h in range(n_heads):  # static unroll
        q = qkv[..., h * hd:(h + 1) * hd]
        k = qkv[..., d + h * hd:d + (h + 1) * hd]
        v = qkv[..., 2 * d + h * hd:2 * d + (h + 1) * hd]
        a = jax.lax.dot_general(q, k, dimension_numbers=bdims,
                                precision=prec,
                                preferred_element_type=jnp.float32
                                ).astype(dt) * scale  # [Tr, S, S]
        if kpad is not None:
            a = jnp.where(kpad, jnp.asarray(-1e9, dt), a)
        m = jnp.max(a, axis=-1, keepdims=True)
        e = jnp.exp(a - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)
        attn0 = attn0 + a[:, 0, :].astype(jnp.float32)
        o = jax.lax.dot_general(
            a, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32
        ).astype(dt)  # [Tr, S, hd]
        outs.append(o)
    out = jnp.concatenate(outs, axis=-1).reshape(tr * s, d)
    out = _mm(out, wo_ref[...], prec) + bo_ref[...]
    out_ref[...] = out.reshape(tr, s, d)
    attn0_ref[...] = (attn0 / n_heads).astype(dt)


@functools.partial(jax.jit, static_argnames=("n_heads", "rays_tile"))
def fused_ray_attention(x, wqkv, wo, bo, n_heads: int = 4,
                        rays_tile: int = 16):
    """One fused pass of the per-ray sample-axis self-attention.

    :param x: [R, S, D] pre-LayerNormed rows
    :param wqkv: [D, 3D] pre-concatenated q/k/v projection
    :return: (out [R, S, D], attn0 [R, S]) — attention output after out_fc
        and the head-mean first-query-row attention (the compositing weights
        when ret_alpha)
    """
    r, s, d = x.shape
    dt = x.dtype
    tr = rays_tile
    rpad = -(-r // tr) * tr
    spad = -(-s // 8) * 8
    if (rpad, spad) != (r, s):
        x = jnp.pad(x, ((0, rpad - r), (0, spad - s), (0, 0)))
    bo2 = bo.reshape(1, -1).astype(dt)
    out, attn0 = pl.pallas_call(
        functools.partial(_ra_kernel, n_heads=n_heads, s_valid=s),
        grid=(rpad // tr,),
        in_specs=[
            pl.BlockSpec((tr, spad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec(wqkv.shape, lambda i: (0, 0)),
            pl.BlockSpec(wo.shape, lambda i: (0, 0)),
            pl.BlockSpec(bo2.shape, lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tr, spad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((tr, spad), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rpad, spad, d), dt),
            jax.ShapeDtypeStruct((rpad, spad), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, wqkv.astype(dt), wo.astype(dt), bo2)
    return out[:r, :s], attn0[:r, :s]


def _ra_bwd_kernel(x_ref, wqkv_ref, wo_ref, gout_ref, gattn0_ref,
                   dx_ref, dwqkv_ref, dwo_ref, *, n_heads, s_valid):
    # One ray tile: recompute qkv/scores/softmax in VMEM (nothing was saved),
    # then chain the cotangents back. Weight grads are per-tile partials
    # (summed outside — the grid is tiny relative to a [D,3D] f32 buffer).
    dt = x_ref.dtype
    prec = _prec(dt)
    tr, s, d = x_ref.shape
    hd = d // n_heads
    x = x_ref[...].reshape(tr * s, d)
    qkv = _mm(x, wqkv_ref[...], prec).reshape(tr, s, 3 * d)
    gout = gout_ref[...].reshape(tr * s, d)
    scale = jnp.asarray(1.0 / float(hd) ** 0.5, dt)
    kpad = None
    if s_valid != s:
        kidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
        kpad = kidx >= s_valid
    qk_dims = (((2,), (2,)), ((0,), (0,)))   # [tr,s,hd]x[tr,s,hd] -> [tr,s,s]
    av_dims = (((2,), (1,)), ((0,), (0,)))   # [tr,s,s]x[tr,s,hd] -> [tr,s,hd]
    # out = concat_h(o_h) @ wo + bo  ->  g_concat = gout @ wo^T
    gcat = jax.lax.dot_general(
        gout, wo_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32
    ).astype(dt).reshape(tr, s, d)
    gattn0 = gattn0_ref[...].astype(dt) / n_heads  # attn0 = mean_h a_h[:,0,:]
    gq_parts, gk_parts, gv_parts, o_parts = [], [], [], []
    for h in range(n_heads):  # static unroll
        q = qkv[..., h * hd:(h + 1) * hd]
        k = qkv[..., d + h * hd:d + (h + 1) * hd]
        v = qkv[..., 2 * d + h * hd:2 * d + (h + 1) * hd]
        sc = jax.lax.dot_general(q, k, dimension_numbers=qk_dims,
                                 precision=prec,
                                 preferred_element_type=jnp.float32
                                 ).astype(dt) * scale
        if kpad is not None:
            sc = jnp.where(kpad, jnp.asarray(-1e9, dt), sc)
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)  # [tr, s, s]
        go = gcat[..., h * hd:(h + 1) * hd]
        o_parts.append(jax.lax.dot_general(
            a, v, dimension_numbers=av_dims, precision=prec,
            preferred_element_type=jnp.float32).astype(dt))
        # g_a = go v^T, plus the attn0 cotangent on the first query row
        ga = jax.lax.dot_general(go, v, dimension_numbers=qk_dims,
                                 precision=prec,
                                 preferred_element_type=jnp.float32
                                 ).astype(dt)
        row0 = (jax.lax.broadcasted_iota(jnp.int32, (1, s, 1), 1) == 0)
        ga = ga + jnp.where(row0, gattn0[:, None, :], jnp.asarray(0, dt))
        # softmax bwd; masked key columns have a==0 -> gs==0 automatically
        gs = (ga - jnp.sum(ga * a, axis=-1, keepdims=True)) * a * scale
        gq_parts.append(jax.lax.dot_general(
            gs, k, dimension_numbers=av_dims, precision=prec,
            preferred_element_type=jnp.float32).astype(dt))
        gk_parts.append(jax.lax.dot_general(
            gs, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32).astype(dt))
        gv_parts.append(jax.lax.dot_general(
            a, go, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=prec, preferred_element_type=jnp.float32).astype(dt))
    gqkv = jnp.concatenate(gq_parts + gk_parts + gv_parts,
                           axis=-1).reshape(tr * s, 3 * d)
    dx = jax.lax.dot_general(
        gqkv, wqkv_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32).astype(dt)
    dx_ref[...] = dx.reshape(tr, s, d)
    dwqkv_ref[...] = jax.lax.dot_general(
        x, gqkv, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)[None]
    cat = jnp.concatenate(o_parts, axis=-1).reshape(tr * s, d)
    dwo_ref[...] = jax.lax.dot_general(
        cat, gout, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)[None]


def _ra_bwd(x, wqkv, wo, gout, gattn0, n_heads, rays_tile):
    r, s, d = x.shape
    dt = x.dtype
    tr = rays_tile
    rpad = -(-r // tr) * tr
    spad = -(-s // 8) * 8
    if (rpad, spad) != (r, s):
        x = jnp.pad(x, ((0, rpad - r), (0, spad - s), (0, 0)))
        gout = jnp.pad(gout, ((0, rpad - r), (0, spad - s), (0, 0)))
        gattn0 = jnp.pad(gattn0, ((0, rpad - r), (0, spad - s)))
    grids = rpad // tr
    dx, dwqkv_p, dwo_p = pl.pallas_call(
        functools.partial(_ra_bwd_kernel, n_heads=n_heads, s_valid=s),
        grid=(grids,),
        in_specs=[
            pl.BlockSpec((tr, spad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec(wqkv.shape, lambda i: (0, 0)),
            pl.BlockSpec(wo.shape, lambda i: (0, 0)),
            pl.BlockSpec((tr, spad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((tr, spad), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tr, spad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d, 3 * d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d, d), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rpad, spad, d), dt),
            jax.ShapeDtypeStruct((grids, d, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((grids, d, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x, wqkv.astype(dt), wo.astype(dt), gout, gattn0)
    return dx[:r, :s], jnp.sum(dwqkv_p, axis=0), jnp.sum(dwo_p, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_ray_attention_ad(x, wqkv, wo, bo, n_heads: int = 4,
                           rays_tile: int = 16):
    """`fused_ray_attention` with a custom VJP (flash-style recompute
    backward, `_ra_bwd_kernel`) — safe to use under jax.grad, so the
    differentiated GNT attack / purification paths can keep the fusion."""
    return fused_ray_attention(x, wqkv, wo, bo, n_heads, rays_tile)


def _ra_ad_fwd(x, wqkv, wo, bo, n_heads, rays_tile):
    out = fused_ray_attention(x, wqkv, wo, bo, n_heads, rays_tile)
    # residuals must be jax types: keep a zero-size dtype witness for bo
    return out, (x, wqkv, wo, jnp.zeros((0,), bo.dtype))


def _ra_ad_bwd(n_heads, rays_tile, res, g):
    x, wqkv, wo, bo_wit = res
    bo_dtype = bo_wit.dtype
    gout, gattn0 = g
    gout = gout.astype(x.dtype)
    gattn0 = gattn0.astype(x.dtype)
    dx, dwqkv, dwo = _ra_bwd(x, wqkv, wo, gout, gattn0, n_heads, rays_tile)
    dbo = jnp.sum(gout, axis=(0, 1), dtype=jnp.float32)
    return (dx, dwqkv.astype(wqkv.dtype), dwo.astype(wo.dtype),
            dbo.astype(bo_dtype))


fused_ray_attention_ad.defvjp(_ra_ad_fwd, _ra_ad_bwd)
