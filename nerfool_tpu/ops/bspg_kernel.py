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
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    if sblk is None:
        sblk = ns if ns <= 2048 else 2048
    while ns % sblk:
        sblk //= 2
    nsb = ns // sblk

    # per-lane constants of the combined (slot, dy, dx) one-hot axis
    j = np.arange(width)
    dy_lane = jnp.asarray((j // p1) % p1, jnp.int32)
    dx_lane = jnp.asarray(j % p1, jnp.int32)
    slots_rep = jnp.repeat(slots, p1 * p1, axis=-1)  # [Vg, B, width]

    wy0 = (1.0 - fy) * vy0
    wy1 = fy * vy1
    wx0 = (1.0 - fx) * vx0
    wx1 = fx * vx1

    g3 = g.reshape(vg, b, width, c)

    grid = (vg, b, nsb)
    const = lambda: pl.BlockSpec((width,), lambda v, bb, s: (0,))
    persamp = lambda: pl.BlockSpec((1, 1, sblk), lambda v, bb, s: (v, bb, s))

    out = pl.pallas_call(
        functools.partial(_select_kernel_grid, dt=dt, sblk=sblk, width=width),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, width), lambda v, bb, s: (v, bb, 0)),  # slots_rep
            const(), const(),                                           # dy/dx lanes
            persamp(), persamp(), persamp(), persamp(),                 # pid, ly, wy0, wy1
            persamp(), persamp(), persamp(),                            # lx, wx0, wx1
            pl.BlockSpec((1, 1, width, c), lambda v, bb, s: (v, bb, 0, 0)),  # g3
        ],
        out_specs=pl.BlockSpec((1, 1, sblk, c), lambda v, bb, s: (v, bb, s, 0)),
        out_shape=jax.ShapeDtypeStruct((vg, b, ns, c), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(slots_rep, dy_lane, dx_lane, pid, ly, wy0, wy1, lx, wx0, wx1, g3)
    return out


def _select_kernel_grid(slots_rep_ref, dy_lane_ref, dx_lane_ref,
                        pid_ref, ly_ref, wy0_ref, wy1_ref,
                        lx_ref, wx0_ref, wx1_ref, g_ref, out_ref, *,
                        dt, sblk, width):
    pid = pid_ref[0, 0, :]
    ly = ly_ref[0, 0, :]
    lx = lx_ref[0, 0, :]
    wy0 = wy0_ref[0, 0, :]
    wy1 = wy1_ref[0, 0, :]
    wx0 = wx0_ref[0, 0, :]
    wx1 = wx1_ref[0, 0, :]
    srep = slots_rep_ref[0, 0, :]
    dyl = dy_lane_ref[...]
    dxl = dx_lane_ref[...]

    eq = pid[:, None] == srep[None, :]
    wy = jnp.where(dyl[None, :] == ly[:, None], wy0[:, None],
                   jnp.where(dyl[None, :] == ly[:, None] + 1,
                             wy1[:, None], 0.0))
    wx = jnp.where(dxl[None, :] == lx[:, None], wx0[:, None],
                   jnp.where(dxl[None, :] == lx[:, None] + 1,
                             wx1[:, None], 0.0))
    w = jnp.where(eq, wy * wx, 0.0).astype(dt)
    out = jax.lax.dot_general(
        w, g_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)
