"""Fused ViewAttention Pallas kernel (GNT aggregation hot loop).

The reference's subtraction attention over source views
(/root/reference/gnt/transformer_network.py Attention2D:55-89) is, per
transformer depth, a ~13-HBM-pass chain over the [V, R, S, D] operands under
XLA: kv matmul, pos MLP, attention assembly (kp - q + pos), the d->d/8->d
attention MLP, masked softmax over V, and the weighted sum each materialize
[V, R*S, D]-sized intermediates (measured: the depth-8 chain runs at ~40% of
the perfect-fusion HBM floor — utils/roofline.gnt_aggregation_traffic, and
the xprof op profile shows the per-depth reduce_max/copy army). This kernel
streams k/pos/mask ONE (rows-tile, view) block at a time and keeps every
intermediate in VMEM: per depth the big operand crosses HBM once on read
plus a D-wide output write — the ~13x traffic collapse XLA's fusion cannot
reach across the softmax/reduce boundaries.

Semantics mirror models/gnt.ViewAttention op-for-op in the COMPUTE dtype
(matmuls accumulate f32 and round back, exactly like XLA's bf16 dot; the
softmax runs max-sub-exp-sum-div in the input dtype like jax.nn.softmax), so
the fused path is numerically interchangeable with the XLA path at bf16
rounding scale (tests/test_vt_kernel.py).

Forward-only: whole-frame rendering does not differentiate; the attack path
keeps XLA autodiff (no custom VJP is registered).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _prec(dt):
    """f32 operands need HIGHEST or the MXU rounds them to bf16 (the round-2
    SPG loss anomaly — ops/bspg_kernel._sel_precision)."""
    return (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _mm(a, b, prec):
    """Matmul with XLA's accumulate-f32-round-to-operand-dtype semantics."""
    return jnp.dot(a, b, precision=prec,
                   preferred_element_type=jnp.float32).astype(a.dtype)


def _vt_kernel(qln_ref, k_ref, pos_ref, mask_ref,
               wq_ref, wkv_ref, wp0_ref, bp0_ref, wp1_ref, bp1_ref,
               wa0_ref, ba0_ref, wa1_ref, ba1_ref, wo_ref, bo_ref,
               out_ref):
    # qln [T, D]; k [V, T, D]; pos [V, T, 4]; mask [V, T, 1].
    # Every stage runs as ONE [V*T, .] op: the view axis merges into the
    # matmul M dim via free major-dim reshapes (no per-view loop — Mosaic
    # vectorizes big ops better and the MXU sees M = V*T rows).
    dt = k_ref.dtype
    prec = _prec(dt)
    v, t, d = k_ref.shape
    qp = _mm(qln_ref[...], wq_ref[...], prec)  # [T, D]
    kv = _mm(k_ref[...].reshape(v * t, d), wkv_ref[...], prec)  # [VT, 2D]
    kp, vv = kv[:, :d], kv[:, d:]
    p = _mm(pos_ref[...].reshape(v * t, -1), wp0_ref[...], prec) + bp0_ref[...]
    p = _mm(jnp.maximum(p, 0), wp1_ref[...], prec) + bp1_ref[...]
    a = (kp.reshape(v, t, d) - qp[None] + p.reshape(v, t, d)).reshape(v * t, d)
    a = _mm(a, wa0_ref[...], prec) + ba0_ref[...]
    a = _mm(jnp.maximum(a, 0), wa1_ref[...], prec) + ba1_ref[...]
    # compare in f32: Mosaic has no bf16 vector cmp ("Target does not
    # support this comparison"); mask values are exact 0/1 either way
    a = jnp.where(mask_ref[...].reshape(v * t, 1).astype(jnp.float32) == 0,
                  jnp.asarray(-1e9, dt), a)
    a = a.reshape(v, t, d)
    m = jnp.max(a, axis=0)
    e = jnp.exp(a - m[None])
    w = e / jnp.sum(e, axis=0)[None]
    x = jnp.sum((vv + p).reshape(v, t, d) * w, axis=0)  # [T, D]
    out_ref[...] = _mm(x, wo_ref[...], prec) + bo_ref[...]


def _bd2(w):
    """2x block-diagonal expansion: [I, O] -> [2I, 2O] with the two copies
    acting on independent halves (the lane-pack weights; +0.0 terms only, so
    packed matmuls are value-identical to the unpacked ones)."""
    i, o = w.shape
    z = jnp.zeros((i, o), w.dtype)
    return jnp.block([[w, z], [z, w]])


def _vt_kernel_lp(qln_ref, k_ref, pos_ref, mask_ref,
                  wq_ref, wkv_ref, wp0_ref, bp0_ref, wp1_ref, bp1_ref,
                  wa0_ref, ba0_ref, wa1_ref, ba1_ref, wo_ref, bo_ref,
                  out_ref):
    # Lane-packed variant: two attention rows ride one 2D-wide register row
    # (qln [T, 2D]; k [V, T, 2D]; pos [V, T, 8]; mask [V, T, 2]; weights
    # pre-block-diagonalized host-side). Every stage is rowwise, so packing
    # is exact; the win is full 128-lane VREGs and K=N=128 MXU tiles where
    # the D=64 kernel pads half of both away (probe_kernel_micro).
    dt = k_ref.dtype
    prec = _prec(dt)
    v, t, d2 = k_ref.shape
    d = d2 // 2
    qp = _mm(qln_ref[...], wq_ref[...], prec)  # [T, 2D]
    kv = _mm(k_ref[...].reshape(v * t, d2), wkv_ref[...], prec)  # [VT, 4D]
    kp, vv = kv[:, :d2], kv[:, d2:]
    p = _mm(pos_ref[...].reshape(v * t, -1), wp0_ref[...], prec) + bp0_ref[...]
    p = _mm(jnp.maximum(p, 0), wp1_ref[...], prec) + bp1_ref[...]
    a = (kp.reshape(v, t, d2) - qp[None] + p.reshape(v, t, d2)
         ).reshape(v * t, d2)
    a = _mm(a, wa0_ref[...], prec) + ba0_ref[...]
    a = _mm(jnp.maximum(a, 0), wa1_ref[...], prec) + ba1_ref[...]
    # per-half mask via lane slices (rank-3 broadcasts stay out of Mosaic);
    # f32 compare as in the unpacked kernel
    m2 = mask_ref[...].reshape(v * t, 2).astype(jnp.float32)
    neg = jnp.asarray(-1e9, dt)
    a = jnp.concatenate(
        [jnp.where(m2[:, :1] == 0, neg, a[:, :d]),
         jnp.where(m2[:, 1:] == 0, neg, a[:, d:])], axis=-1)
    a = a.reshape(v, t, d2)
    m = jnp.max(a, axis=0)
    e = jnp.exp(a - m[None])
    w = e / jnp.sum(e, axis=0)[None]
    x = jnp.sum((vv + p).reshape(v, t, d2) * w, axis=0)  # [T, 2D]
    out_ref[...] = _mm(x, wo_ref[...], prec) + bo_ref[...]


@functools.partial(jax.jit, static_argnames=("rows_tile", "lane_pack"))
def fused_view_attention(qln, k, pos, mask, wq, wkv, wp0, bp0, wp1, bp1,
                         wa0, ba0, wa1, ba1, wo, bo, rows_tile: int = 1024,
                         lane_pack: bool = False):
    """One fused pass of the subtraction view attention.

    :param qln: [N, D] pre-LayerNormed query rows (q-side)
    :param k: [V, N, D] per-view features (the big operand, read once)
    :param pos: [V, N, 4] ray-difference encodings
    :param mask: [V, N, 1] per-view projection validity
    :param wkv: [D, 2D] pre-combined ``concat(wk, wk @ wv)`` (models/gnt.py
        ViewAttention MXU note: k_fc/v_fc chain without a nonlinearity)
    :param lane_pack: pair adjacent rows into the 128-lane axis with
        block-diagonal weights (_vt_kernel_lp) — halves rows at double
        width; exact (rowwise ops only)
    :return: [N, D] attention output (after out_fc)
    """
    n, d = qln.shape
    v = k.shape[0]
    dt = k.dtype
    if lane_pack:
        n2 = -(-n // 2)
        if 2 * n2 != n:  # odd row count: zero-pad one row (mask 0 -> inert)
            qln = jnp.pad(qln, ((0, 1), (0, 0)))
            k = jnp.pad(k, ((0, 0), (0, 1), (0, 0)))
            pos = jnp.pad(pos, ((0, 0), (0, 1), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, 1), (0, 0)))
        out2 = _fused_va_lp(
            qln.reshape(n2, 2 * d), k.reshape(v, n2, 2 * d),
            pos.reshape(v, n2, 2 * pos.shape[-1]), mask.reshape(v, n2, 2),
            _bd2(wq), jnp.concatenate([_bd2(wkv[:, :d]), _bd2(wkv[:, d:])],
                                      axis=-1),
            _bd2(wp0), jnp.concatenate([bp0, bp0]),
            _bd2(wp1), jnp.concatenate([bp1, bp1]),
            _bd2(wa0), jnp.concatenate([ba0, ba0]),
            _bd2(wa1), jnp.concatenate([ba1, ba1]),
            _bd2(wo), jnp.concatenate([bo, bo]),
            max(128, rows_tile // 2))
        return out2.reshape(2 * n2, d)[:n]
    t = rows_tile if dt != jnp.float32 else min(rows_tile, 512)
    npad = -(-n // t) * t
    if npad != n:
        qln = jnp.pad(qln, ((0, npad - n), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, npad - n), (0, 0)))
        pos = jnp.pad(pos, ((0, 0), (0, npad - n), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, npad - n), (0, 0)))
    row2 = lambda b: b.reshape(1, -1).astype(dt)
    weights = (wq.astype(dt), wkv.astype(dt), wp0.astype(dt), row2(bp0),
               wp1.astype(dt), row2(bp1), wa0.astype(dt), row2(ba0),
               wa1.astype(dt), row2(ba1), wo.astype(dt), row2(bo))
    wspec = [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in weights]
    out = pl.pallas_call(
        _vt_kernel,
        grid=(npad // t,),
        in_specs=[
            pl.BlockSpec((t, d), lambda i: (i, 0)),
            pl.BlockSpec((v, t, d), lambda i: (0, i, 0)),
            pl.BlockSpec((v, t, pos.shape[-1]), lambda i: (0, i, 0)),
            pl.BlockSpec((v, t, 1), lambda i: (0, i, 0)),
        ] + wspec,
        out_specs=pl.BlockSpec((t, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, d), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(qln, k, pos, mask, *weights)
    return out[:n]


def _fused_va_lp(qln2, k2, pos2, mask2, wq, wkv, wp0, bp0, wp1, bp1,
                 wa0, ba0, wa1, ba1, wo, bo, rows_tile):
    """pallas_call wrapper for the lane-packed kernel (packed shapes in/out:
    qln2 [N2, 2D], k2 [V, N2, 2D], pos2 [V, N2, 8], mask2 [V, N2, 2])."""
    n2, d2 = qln2.shape
    v = k2.shape[0]
    dt = k2.dtype
    t = rows_tile if dt != jnp.float32 else min(rows_tile, 256)
    npad = -(-n2 // t) * t
    if npad != n2:
        qln2 = jnp.pad(qln2, ((0, npad - n2), (0, 0)))
        k2 = jnp.pad(k2, ((0, 0), (0, npad - n2), (0, 0)))
        pos2 = jnp.pad(pos2, ((0, 0), (0, npad - n2), (0, 0)))
        mask2 = jnp.pad(mask2, ((0, 0), (0, npad - n2), (0, 0)))
    row2 = lambda b: b.reshape(1, -1).astype(dt)
    weights = (wq.astype(dt), wkv.astype(dt), wp0.astype(dt), row2(bp0),
               wp1.astype(dt), row2(bp1), wa0.astype(dt), row2(ba0),
               wa1.astype(dt), row2(ba1), wo.astype(dt), row2(bo))
    wspec = [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in weights]
    out = pl.pallas_call(
        _vt_kernel_lp,
        grid=(npad // t,),
        in_specs=[
            pl.BlockSpec((t, d2), lambda i: (i, 0)),
            pl.BlockSpec((v, t, d2), lambda i: (0, i, 0)),
            pl.BlockSpec((v, t, pos2.shape[-1]), lambda i: (0, i, 0)),
            pl.BlockSpec((v, t, 2), lambda i: (0, i, 0)),
        ] + wspec,
        out_specs=pl.BlockSpec((t, d2), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, d2), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(qln2, k2, pos2, mask2, *weights)
    return out[:n2]
