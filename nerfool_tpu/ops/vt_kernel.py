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


@functools.partial(jax.jit, static_argnames=("rows_tile",))
def fused_view_attention(qln, k, pos, mask, wq, wkv, wp0, bp0, wp1, bp1,
                         wa0, ba0, wa1, ba1, wo, bo, rows_tile: int = 1024):
    """One fused pass of the subtraction view attention.

    :param qln: [N, D] pre-LayerNormed query rows (q-side)
    :param k: [V, N, D] per-view features (the big operand, read once)
    :param pos: [V, N, 4] ray-difference encodings
    :param mask: [V, N, 1] per-view projection validity
    :param wkv: [D, 2D] pre-combined ``concat(wk, wk @ wv)`` (models/gnt.py
        ViewAttention MXU note: k_fc/v_fc chain without a nonlinearity)
    :return: [N, D] attention output (after out_fc)
    """
    n, d = qln.shape
    v = k.shape[0]
    dt = k.dtype
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
