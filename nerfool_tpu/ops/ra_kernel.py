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
input dtype). Forward-only — no VJP; render paths only.
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
