"""Pallas selection kernel for block segment-patch gather.

Reconstructs every sample's exact bilinear tap from a block's gathered patch
rows with ONE one-hot matmul per (block, view): W [nS, Ks*(p+1)^2] has <= 4
nonzeros per row (slot-equality x bilinear y x bilinear x, with per-corner
zero-padding validity folded in) and rides the MXU against the patch block
G [Ks*(p+1)^2, C]. The one-hot lives only in VMEM — the XLA fallback in
ops/bspg.py materializes the same operand in HBM, which costs more than the
gather it supports (measured: ~54ms per 4096-ray chunk at flagship scale,
issue-rate-free but bandwidth-bound). Forward-only: whole-frame rendering does
not differentiate; the attack path keeps XLA autodiff.

Mosaic blocking: (view-group, block) pairs are flattened and processed GB=8
per grid step (second-to-last block dims must be 8-divisible), with a batched
dot_general over the 8 rows.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


GB = 8  # (view, block) rows per grid step


def select_block_pallas_ingredients(g, slots, pid, ly, fy, vy0, vy1,
                                    lx, fx, vx0, vx1, spec, c, sblk=None,
                                    out_dtype=None):
    """Pallas selection from raw per-sample ingredients.

    :param g: [Vg, B, Ks, (p+1)^2*c]
    :param slots: [Vg, B, Ks] int32
    :param pid, ly, lx: [Vg, B, nS] int32
    :param fy, fx: [Vg, B, nS] fractional parts (compute dtype)
    :param vy0, vy1, vx0, vx1: [Vg, B, nS] corner-validity (0/1, compute dtype)
    :return: [Vg, B, nS, c]
    """
    vg, b, ks, row = g.shape
    p1 = spec.p + 1
    ns = pid.shape[-1]
    width = ks * p1 * p1
    dt = g.dtype
    out_dtype = out_dtype or dt
    n_rv = vg * b
    assert n_rv % GB == 0, (vg, b)
    if sblk is None:
        # bound the in-kernel one-hot tile (GB x sblk x width bf16) to ~4MB
        cap = max(128, int(4e6 // max(GB * width * 2, 1)))
        sblk = min(2048, ns, cap)
        sblk = max(128, (sblk // 128) * 128)
    while ns % sblk:
        sblk //= 2
    nsb = ns // sblk

    # per-lane constants of the combined (slot, dy, dx) one-hot axis
    j = np.arange(width)
    dy_lane = jnp.asarray((j // p1) % p1, jnp.int32)[None]
    dx_lane = jnp.asarray(j % p1, jnp.int32)[None]
    slots_rep = jnp.repeat(slots, p1 * p1, axis=-1).reshape(n_rv, width)

    # weight ingredients ride in f32: Mosaic cannot insert minor dims on
    # sub-32-bit vectors ("Insertion of minor dim ... only supported for
    # 32-bit types"), so the in-kernel broadcasts build W in f32 and cast to
    # the table dtype only at the dot
    f32 = jnp.float32
    wy0 = ((1.0 - fy) * vy0).reshape(n_rv, ns).astype(f32)
    wy1 = (fy * vy1).reshape(n_rv, ns).astype(f32)
    wx0 = ((1.0 - fx) * vx0).reshape(n_rv, ns).astype(f32)
    wx1 = (fx * vx1).reshape(n_rv, ns).astype(f32)
    pid2 = pid.reshape(n_rv, ns)
    ly2 = ly.reshape(n_rv, ns)
    lx2 = lx.reshape(n_rv, ns)
    g3 = g.reshape(n_rv, width, c)

    grid = (n_rv // GB, nsb)
    const = pl.BlockSpec((1, width), lambda i, s: (0, 0))
    persamp = pl.BlockSpec((GB, sblk), lambda i, s: (i, s))

    out = pl.pallas_call(
        functools.partial(_select_kernel, dt=dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((GB, width), lambda i, s: (i, 0)),     # slots_rep
            const, const,                                        # dy/dx lanes
            persamp, persamp, persamp, persamp,                  # pid, ly, wy0, wy1
            persamp, persamp, persamp,                           # lx, wx0, wx1
            pl.BlockSpec((GB, width, c), lambda i, s: (i, 0, 0)),  # g3
        ],
        out_specs=pl.BlockSpec((GB, sblk, c), lambda i, s: (i, s, 0)),
        out_shape=jax.ShapeDtypeStruct((n_rv, ns, c), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(slots_rep, dy_lane, dx_lane, pid2, ly2, wy0, wy1, lx2, wx0, wx1, g3)
    return out.reshape(vg, b, ns, c)


def _select_kernel(slots_rep_ref, dy_lane_ref, dx_lane_ref,
                   pid_ref, ly_ref, wy0_ref, wy1_ref,
                   lx_ref, wx0_ref, wx1_ref, g_ref, out_ref, *, dt):
    pid = pid_ref[...]          # [GB, S]
    ly = ly_ref[...]
    lx = lx_ref[...]
    wy0 = wy0_ref[...]
    wy1 = wy1_ref[...]
    wx0 = wx0_ref[...]
    wx1 = wx1_ref[...]
    srep = slots_rep_ref[...]   # [GB, W]
    dyl = dy_lane_ref[0]        # [W]
    dxl = dx_lane_ref[0]

    eq = pid[:, :, None] == srep[:, None, :]                      # [GB, S, W]
    wy = jnp.where(dyl[None, None, :] == ly[:, :, None], wy0[:, :, None],
                   jnp.where(dyl[None, None, :] == ly[:, :, None] + 1,
                             wy1[:, :, None], 0.0))
    wx = jnp.where(dxl[None, None, :] == lx[:, :, None], wx0[:, :, None],
                   jnp.where(dxl[None, None, :] == lx[:, :, None] + 1,
                             wx1[:, :, None], 0.0))
    w = jnp.where(eq, wy * wx, 0.0).astype(dt)
    out = jax.lax.dot_general(
        w, g_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = out.astype(out_ref.dtype)
