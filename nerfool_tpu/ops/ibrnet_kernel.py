"""Pallas TPU kernel: fused IBRNet aggregation.

The XLA version of the aggregator (models/ibrnet.py) round-trips ~30
[V,R,S,C]-sized intermediates through HBM; this kernel keeps one block of rays
entirely in VMEM — gathered features in, raw (rgb, sigma) out — with every MLP
weight resident on-chip (the whole network is < 100 KB). Used on the forward
(rendering) path; the attack's backward keeps the XLA implementation (same
math, verified by tests/test_pallas_kernel.py).

Layout contract matches the renderer: views-first [V, R, S, C] inputs,
[R, S, 4] output, one grid step per block of rays.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfool_tpu.models.ibrnet import sinusoid_pos_encoding

# ordered flat list of (path, transpose?) for the IBRNet param tree
_WEIGHTS = [
    ("ray_dir_fc", "fc0"), ("ray_dir_fc", "fc1"),
    ("base_fc", "fc0"), ("base_fc", "fc1"),
    ("vis_fc", "fc0"), ("vis_fc", "fc1"),
    ("vis_fc2", "fc0"), ("vis_fc2", "fc1"),
    ("geometry_fc", "fc0"), ("geometry_fc", "fc1"),
    ("out_geometry_fc", "fc0"), ("out_geometry_fc", "fc1"),
    ("rgb_fc", "fc0"), ("rgb_fc", "fc1"), ("rgb_fc", "fc2"),
]


def _flatten_params(params):
    flat = []
    for grp, fc in _WEIGHTS:
        flat.append(jnp.asarray(params[grp][fc]["kernel"]))
        flat.append(jnp.asarray(params[grp][fc]["bias"]))
    attn = params["ray_attention"]
    flat += [jnp.asarray(attn[k]["kernel"]) for k in ("w_qs", "w_ks", "w_vs", "fc")]
    flat += [jnp.asarray(attn["layer_norm"]["scale"]),
             jnp.asarray(attn["layer_norm"]["bias"])]
    s = params.get("s", jnp.asarray(0.2))
    flat.append(jnp.asarray(s).reshape(1, 1))
    return flat


def _elu(x):
    return jnp.where(x > 0, x, jnp.exp(x) - 1.0)


def _kernel(rgb_feat_ref, ray_diff_ref, mask_ref, pos_enc_ref, *refs,
            out_ref, anti_alias_pooling):
    # unpack weight refs in _flatten_params order; compute in f32 throughout —
    # the block is VMEM-resident so the cast is free of HBM traffic, and the
    # target VPU rejects sub-32-bit comparisons/selects (bf16 stays the wire
    # format of the inputs and output)
    ws = [r[:].astype(jnp.float32) for r in refs]
    (rd0_w, rd0_b, rd1_w, rd1_b, b0_w, b0_b, b1_w, b1_b,
     v0_w, v0_b, v1_w, v1_b, v20_w, v20_b, v21_w, v21_b,
     g0_w, g0_b, g1_w, g1_b, og0_w, og0_b, og1_w, og1_b,
     r0_w, r0_b, r1_w, r1_b, r2_w, r2_b,
     wq, wk, wv, wo, ln_scale, ln_bias, s_param) = ws

    rgb_feat = rgb_feat_ref[:].astype(jnp.float32)  # [V, R, S, C]
    ray_diff = ray_diff_ref[:].astype(jnp.float32)  # [V, R, S, 4]
    mask = mask_ref[:].astype(jnp.float32)  # [V, R, S, 1]
    v, r, s, c = rgb_feat.shape

    def dense(x, w, b):
        y = jax.lax.dot_general(
            x.reshape(-1, x.shape[-1]), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b
        return y.reshape(x.shape[:-1] + (w.shape[-1],))

    rgb_in = rgb_feat[..., :3]
    df = _elu(dense(_elu(dense(ray_diff, rd0_w, rd0_b)), rd1_w, rd1_b))
    feat = rgb_feat + df

    if anti_alias_pooling:
        dot = ray_diff[..., 3:4]
        # scalar squeeze of sub-32-bit refs is unsupported in Mosaic: read the
        # [1,1] param in f32, then cast back to the compute dtype
        s_val = jnp.abs(s_param.astype(jnp.float32))[0, 0].astype(dot.dtype)
        exp_dot = jnp.exp(s_val * (dot - 1.0))
        weight = (exp_dot - jnp.min(exp_dot, axis=0, keepdims=True)) * mask
    else:
        weight = mask
    weight = weight / (jnp.sum(weight, axis=0, keepdims=True) + 1e-8)

    mean = jnp.sum(feat * weight, axis=0, keepdims=True)
    var = jnp.sum(weight * (feat - mean) ** 2, axis=0, keepdims=True)
    gf = jnp.concatenate([mean, var], axis=-1)  # [1,R,S,2C]
    x = jnp.concatenate(
        [jnp.broadcast_to(gf, (v,) + gf.shape[1:]), feat], axis=-1
    )
    x = _elu(dense(_elu(dense(x, b0_w, b0_b)), b1_w, b1_b))

    xv = _elu(dense(_elu(dense(x * weight, v0_w, v0_b)), v1_w, v1_b))
    x_res, vis = xv[..., :-1], xv[..., -1:]
    vis = jax.nn.sigmoid(vis) * mask
    x = x + x_res
    vis = jax.nn.sigmoid(
        dense(_elu(dense(x * vis, v20_w, v20_b)), v21_w, v21_b)
    ) * mask
    weight = vis / (jnp.sum(vis, axis=0, keepdims=True) + 1e-8)

    mean = jnp.sum(x * weight, axis=0, keepdims=True)
    var = jnp.sum(weight * (x - mean) ** 2, axis=0, keepdims=True)
    gfeat = jnp.concatenate(
        [mean[0], var[0], jnp.mean(weight, axis=0)], axis=-1
    )  # [R, S, 65]
    gfeat = _elu(dense(_elu(dense(gfeat, g0_w, g0_b)), g1_w, g1_b))  # [R,S,16]
    num_valid = jnp.sum(mask, axis=0)  # [R, S, 1]
    gfeat = gfeat + pos_enc_ref[:]  # [S,16] broadcast over R

    # 4-head self-attention along the sample axis (d_model 16, d_k = d_v = 4),
    # unrolled per head as column-sliced matmuls: Mosaic's layout inference
    # rejects the [R,S,16]->[R*4,S,4] head transpose, and dot_general supports
    # one batch dim (rays) directly
    attn_mask = (num_valid > 1).astype(gfeat.dtype)  # [R,S,1]
    am = jnp.broadcast_to(attn_mask.reshape(r, s, 1), (r, s, s))
    q_all = dense(gfeat, wq, jnp.zeros((16,), gfeat.dtype))
    k_all = dense(gfeat, wk, jnp.zeros((16,), gfeat.dtype))
    v_all = dense(gfeat, wv, jnp.zeros((16,), gfeat.dtype))
    head_outs = []
    for hh in range(4):
        sl = slice(hh * 4, (hh + 1) * 4)
        attn = jax.lax.dot_general(
            q_all[..., sl] / 2.0, k_all[..., sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [R, S, S]
        attn = jnp.where(am == 0, -1e9, attn)  # mask query rows
        attn = jax.nn.softmax(attn, axis=-1).astype(gfeat.dtype)
        head_outs.append(jax.lax.dot_general(
            attn, v_all[..., sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))  # [R, S, 4]
    av = jnp.concatenate(head_outs, axis=-1).astype(gfeat.dtype)
    av = dense(av, wo, jnp.zeros((16,), av.dtype)) + gfeat
    m = jnp.mean(av, axis=-1, keepdims=True)
    var_ln = jnp.mean((av - m) ** 2, axis=-1, keepdims=True)
    gfeat = (av - m) / jnp.sqrt(var_ln + 1e-6) * ln_scale + ln_bias

    sigma = jnp.maximum(
        dense(_elu(dense(gfeat, og0_w, og0_b)), og1_w, og1_b), 0.0
    )
    sigma = jnp.where(num_valid < 1, 0.0, sigma)  # [R,S,1]

    xr = jnp.concatenate([x, vis, ray_diff], axis=-1)
    xr = dense(_elu(dense(_elu(dense(xr, r0_w, r0_b)), r1_w, r1_b)), r2_w, r2_b)
    xr = jnp.where(mask == 0, -1e9, xr)
    bw = jax.nn.softmax(xr, axis=0)
    rgb_out = jnp.sum(rgb_in * bw, axis=0)  # [R,S,3]

    out_ref[:] = jnp.concatenate([rgb_out, sigma], axis=-1).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("anti_alias_pooling", "ray_block", "interpret")
)
def ibrnet_aggregate_pallas(params, rgb_feat, ray_diff, mask,
                            anti_alias_pooling=True, ray_block=16,
                            interpret=False):
    """Fused IBRNet aggregation. Views-first inputs, [R, S, 4] output.

    :param params: the IBRNetAggregator flax param tree (f32 or bf16 leaves)
    :param rgb_feat: [V, R, S, 3+C]; ray_diff [V, R, S, 4]; mask [V, R, S, 1]
    :param ray_block: rays per grid step (R must be a multiple)
    """
    v, r, s, c = rgb_feat.shape
    assert r % ray_block == 0, (r, ray_block)
    flat = _flatten_params(params)
    pos_enc = sinusoid_pos_encoding(s, 16, dtype=rgb_feat.dtype)

    grid = (r // ray_block,)

    def idx(i):
        return (0, i, 0, 0)

    in_specs = [
        pl.BlockSpec((v, ray_block, s, c), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((v, ray_block, s, 4), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((v, ray_block, s, 1), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # pos_enc
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]
    out_spec = pl.BlockSpec(
        (ray_block, s, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_kernel, anti_alias_pooling=anti_alias_pooling)

    def wrapped(*args):
        *ins, out_ref = args
        kernel(*ins, out_ref=out_ref)

    kwargs = {}
    if not interpret:
        # f32 intermediates for a [V, ray_block, S, C] block overflow the
        # default 16M scoped-vmem stack; v5e has 128M VMEM per core
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl.pallas_call(
        wrapped,
        out_shape=jax.ShapeDtypeStruct((r, s, 4), rgb_feat.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
        **kwargs,
    )(rgb_feat, ray_diff, mask, pos_enc, *flat)
