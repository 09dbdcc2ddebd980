"""Pallas selection kernel for block segment-patch gather.

Reconstructs every sample's exact bilinear tap from a block's gathered patch
rows with one one-hot matmul per (block, view): W [nS, Ks*(p+1)^2] has <= 4
nonzeros per row (slot-equality x bilinear y x bilinear x, with per-corner
zero-padding validity folded in) and rides the MXU against the patch block
G [Ks*(p+1)^2, C]. The one-hot lives only in VMEM — the XLA fallback in
ops/bspg.py materializes the same operand in HBM, which costs more than the
gather it supports. Forward-only: whole-frame rendering does not
differentiate; the attack path keeps XLA autodiff.

Mosaic blocking: (view-group, block) pairs are flattened and processed GB=8
rows per grid step (second-to-last block dims must be 8-divisible). The
one-hot width axis is chunked with grid accumulation (wide-K views would
otherwise blow the 16MB VMEM scoped limit), and weight ingredients ride in
f32 (Mosaic cannot insert minor dims on sub-32-bit vectors).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


GB = 8       # (view, block) rows per grid step
WBLK = 1024  # one-hot width chunk (lanes)


def _sel_precision(dt):
    """Matmul precision for the exact-selection contractions.

    f32 tables (the attack/parity path) need HIGHEST: at DEFAULT the MXU
    rounds both operands to bf16, mangling the fractional bilinear weights
    and f32 table values by ~1e-3 relative (the round-2 SPG loss anomaly —
    BENCH_NOTES.md). bf16 tables (the opt-in bf16 render path) are already
    rounded by construction and Mosaic rejects fp32 contract precision on
    bf16 vectors, so they keep DEFAULT."""
    return (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)


def select_block_pallas_ingredients(g, slots, pid, ly, fy, vy0, vy1,
                                    lx, fx, vx0, vx1, spec, c, sblk=None,
                                    out_dtype=None):
    """Pallas selection from raw per-sample ingredients.

    :param g: [Vg, B, Ks, (p+1)^2*c]
    :param slots: [Vg, B, Ks] int32
    :param pid, ly, lx: [Vg, B, nS] int32
    :param fy, fx: [Vg, B, nS] fractional parts (compute dtype)
    :param vy0, vy1, vx0, vx1: [Vg, B, nS] corner-validity (0/1, compute dtype)
    :return: [Vg, B, nS, c] float32
    """
    vg, b, ks, row = g.shape
    p1 = spec.p + 1
    ns = pid.shape[-1]
    width = ks * p1 * p1
    dt = g.dtype
    n_rv = vg * b
    assert n_rv % GB == 0, (vg, b)

    wblk = min(WBLK, -(-width // 128) * 128)
    wpad = -(-width // wblk) * wblk
    nwb = wpad // wblk
    if sblk is None:
        # the kernel's f32 temporaries are [GB, sblk, wblk] x ~3; keep them
        # ~8MB total. Power of two so sblk divides the per-block sample count
        # and stays a multiple of 8 sublanes.
        cap = max(128, min(1024, ns, int(12e6 // (GB * wblk * 4 * 3))))
        sblk = 1 << (cap.bit_length() - 1)
    while ns % sblk and sblk > 1:
        sblk //= 2
    nsb = ns // sblk

    # per-lane constants of the combined (slot, dy, dx) one-hot axis, padded
    # with sentinels that never match (slot -1, dy/dx = p+2)
    j = np.arange(wpad)
    dy_lane = np.where(j < width, (j // p1) % p1, p1 + 2).astype(np.int32)
    dx_lane = np.where(j < width, j % p1, p1 + 2).astype(np.int32)
    slots_rep = jnp.repeat(slots, p1 * p1, axis=-1).reshape(n_rv, width)
    slots_rep = jnp.pad(slots_rep, ((0, 0), (0, wpad - width)),
                        constant_values=-1)

    f32 = jnp.float32
    wy0 = ((1.0 - fy) * vy0).reshape(n_rv, ns).astype(f32)
    wy1 = (fy * vy1).reshape(n_rv, ns).astype(f32)
    wx0 = ((1.0 - fx) * vx0).reshape(n_rv, ns).astype(f32)
    wx1 = (fx * vx1).reshape(n_rv, ns).astype(f32)
    pid2 = pid.reshape(n_rv, ns)
    ly2 = ly.reshape(n_rv, ns)
    lx2 = lx.reshape(n_rv, ns)
    g3 = g.reshape(n_rv, width, c)
    if wpad != width:
        g3 = jnp.pad(g3, ((0, 0), (0, wpad - width), (0, 0)))

    grid = (n_rv // GB, nsb, nwb)  # width chunk iterates fastest: accumulate
    const = pl.BlockSpec((1, wblk), lambda i, s, w: (0, w))
    persamp = pl.BlockSpec((GB, sblk), lambda i, s, w: (i, s))

    out = pl.pallas_call(
        functools.partial(_select_kernel, dt=dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((GB, wblk), lambda i, s, w: (i, w)),     # slots_rep
            const, const,                                          # dy/dx lanes
            persamp, persamp, persamp, persamp,                    # pid, ly, wy0, wy1
            persamp, persamp, persamp,                             # lx, wx0, wx1
            pl.BlockSpec((GB, wblk, c), lambda i, s, w: (i, w, 0)),  # g3
        ],
        out_specs=pl.BlockSpec((GB, sblk, c), lambda i, s, w: (i, s, 0)),
        out_shape=jax.ShapeDtypeStruct((n_rv, ns, c), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(slots_rep, jnp.asarray(dy_lane)[None], jnp.asarray(dx_lane)[None],
      pid2, ly2, wy0, wy1, lx2, wx0, wx1, g3)
    if out_dtype is not None and out_dtype != jnp.float32:
        out = out.astype(out_dtype)
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
    srep = slots_rep_ref[...]   # [GB, Wb]
    dyl = dy_lane_ref[0]        # [Wb]
    dxl = dx_lane_ref[0]

    eq = pid[:, :, None] == srep[:, None, :]                      # [GB, S, Wb]
    wy = jnp.where(dyl[None, None, :] == ly[:, :, None], wy0[:, :, None],
                   jnp.where(dyl[None, None, :] == ly[:, :, None] + 1,
                             wy1[:, :, None], 0.0))
    wx = jnp.where(dxl[None, None, :] == lx[:, :, None], wx0[:, :, None],
                   jnp.where(dxl[None, None, :] == lx[:, :, None] + 1,
                             wx1[:, :, None], 0.0))
    w = jnp.where(eq, wy * wx, 0.0).astype(dt)
    part = jax.lax.dot_general(
        w, g_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(dt),
    )

    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


def select_block_pallas_smallc(g, slots, pid, ly, fy, vy0, vy1,
                               lx, fx, vx0, vx1, spec, c, sblk=None,
                               out_dtype=None):
    """Two-stage Pallas selection for narrow-channel tables (rgb, c<=8).

    The combined (slot, dy, dx) one-hot would contract a K*(p+1)^2-wide axis
    against an N=c matmul whose 3 output lanes pad to 128 on the MXU (~2%
    utilization — measured to dominate whole-frame rendering). Instead:
      stage 1: slot-equality one-hot [S, Ks] @ G' [Ks, c*(p+1)^2] on the MXU
               (full lanes; G' is channel-major so stage 2 reduces over lanes)
      stage 2: spatial (dy, dx) bilinear weights [S, (p+1)^2] broadcast over
               the c channel planes of z, reduced over the lane axis (VPU).
    """
    vg, b, ks, row = g.shape
    p1 = spec.p + 1
    sp = p1 * p1
    csp = c * sp
    ns = pid.shape[-1]
    dt = g.dtype
    n_rv = vg * b
    assert n_rv % GB == 0, (vg, b)
    if sblk is None:
        # stage-2 holds ~5 [GB, sblk, c*sp] f32 temporaries (z, wy, wx, zw,
        # fusion slack) in the 16M scoped-vmem stack
        cap = max(128, min(1024, ns, int(2e6 // (GB * csp * 4))))
        sblk = 1 << (cap.bit_length() - 1)
    while ns % sblk and sblk > 1:
        sblk //= 2
    nsb = ns // sblk

    # channel-major row layout: [Ks, sp, c] -> [Ks, c, sp]
    gc = g.reshape(n_rv, ks, sp, c).transpose(0, 1, 3, 2)
    gc = gc.reshape(n_rv, ks, csp)

    # lane constants over the channel-major c*sp axis: lane j covers channel
    # j // sp at spatial offset j % sp. Mosaic cannot lane-split (c, sp), so
    # the spatial weights are built on the full c*sp axis (repeating per
    # channel) and channels are collapsed by a constant [c*sp, c] indicator
    # matmul instead of a reshape.
    j = np.arange(csp)
    off = j % sp
    dy_lane = jnp.asarray(off // p1, jnp.int32)[None]
    dx_lane = jnp.asarray(off % p1, jnp.int32)[None]
    ch_onehot = jnp.asarray((j // sp)[:, None] == np.arange(c)[None, :],
                            jnp.float32)

    f32 = jnp.float32
    wy0 = ((1.0 - fy) * vy0).reshape(n_rv, ns).astype(f32)
    wy1 = (fy * vy1).reshape(n_rv, ns).astype(f32)
    wx0 = ((1.0 - fx) * vx0).reshape(n_rv, ns).astype(f32)
    wx1 = (fx * vx1).reshape(n_rv, ns).astype(f32)
    pid2 = pid.reshape(n_rv, ns)
    ly2 = ly.reshape(n_rv, ns)
    lx2 = lx.reshape(n_rv, ns)
    slots2 = slots.reshape(n_rv, ks)

    grid = (n_rv // GB, nsb)
    const = pl.BlockSpec((1, csp), lambda i, s: (0, 0))
    persamp = pl.BlockSpec((GB, sblk), lambda i, s: (i, s))

    out = pl.pallas_call(
        functools.partial(_select_smallc_kernel, dt=dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((GB, ks), lambda i, s: (i, 0)),          # slots
            const, const,                                          # dy/dx lanes
            pl.BlockSpec((csp, c), lambda i, s: (0, 0)),           # ch_onehot
            persamp, persamp, persamp, persamp,                    # pid, ly, wy0, wy1
            persamp, persamp, persamp,                             # lx, wx0, wx1
            pl.BlockSpec((GB, ks, csp), lambda i, s: (i, 0, 0)),   # gc
        ],
        out_specs=pl.BlockSpec((GB, sblk, c), lambda i, s: (i, s, 0)),
        out_shape=jax.ShapeDtypeStruct((n_rv, ns, c),
                                       out_dtype or jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(slots2, dy_lane, dx_lane, ch_onehot, pid2, ly2, wy0, wy1, lx2, wx0,
      wx1, gc)
    return out.reshape(vg, b, ns, c)


def _select_smallc_kernel(slots_ref, dy_lane_ref, dx_lane_ref, ch_ref,
                          pid_ref, ly_ref, wy0_ref, wy1_ref,
                          lx_ref, wx0_ref, wx1_ref, g_ref, out_ref, *, dt):
    pid = pid_ref[...]          # [GB, S]
    srep = slots_ref[...]       # [GB, Ks]
    eq = (pid[:, :, None] == srep[:, None, :]).astype(dt)          # [GB,S,Ks]
    z = jax.lax.dot_general(
        eq, g_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(dt),
    )                                                              # [GB,S,c*sp]

    dyl = dy_lane_ref[0]        # [c*sp]
    dxl = dx_lane_ref[0]
    ly = ly_ref[...]
    lx = lx_ref[...]
    wy = jnp.where(dyl[None, None, :] == ly[:, :, None], wy0_ref[...][:, :, None],
                   jnp.where(dyl[None, None, :] == ly[:, :, None] + 1,
                             wy1_ref[...][:, :, None], 0.0))       # [GB,S,c*sp]
    wx = jnp.where(dxl[None, None, :] == lx[:, :, None], wx0_ref[...][:, :, None],
                   jnp.where(dxl[None, None, :] == lx[:, :, None] + 1,
                             wx1_ref[...][:, :, None], 0.0))
    zw = z * (wy * wx)                                             # [GB,S,c*sp]
    out_ref[...] = jax.lax.dot_general(
        zw, ch_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(dt),
    ).astype(out_ref.dtype)                                        # [GB,S,c]


# ---------------------------------------------------------------------------
# Windowed selection (slot windows per (block, depth-chunk-group))
#
# Samples arrive DEPTH-MAJOR per block, so a contiguous sample chunk spans a
# narrow depth range whose epipolar footprint touches only a narrow window of
# the walk's slot sequence (slot position ~ 3 * L1 cell distance from the
# walk start + the 9-slot init ring). Rows stay block-major: a grid step's GB
# rows are GB consecutive chunks of ONE block, so one window covers one
# block's walk over GB*sblk samples (sharing a window across raster-adjacent
# blocks was measured to widen it 2-3x — their walks are phase-shifted). The
# XLA side computes a per-step window start w0b (units of KB slots); the
# kernels DMA only the m = Kw/KB window blocks of that block's patch rows via
# scalar-prefetch index maps — the one-hot width shrinks from Ks*(p+1)^2 to
# Kw*(p+1)^2 without any HBM duplication of patch rows, and the single-block
# window turns the selection matmul into one unbatched [GB*sblk, W] @ [W, c].
# ---------------------------------------------------------------------------

KB = 8  # slot-window granularity (slots per prefetch block)


def _win_compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def select_win_fused(g_fused, slots_rep_win, w0b, pid, ly, wy0, wy1,
                     lx, wx0, wx1, dy_lane, dx_lane, *, n_rv, kw, sp, c,
                     sblk, out_dtype):
    """Windowed one-hot selection (wide-channel tables, e.g. features).

    :param g_fused: [n_rv, ks_pad*sp, c] patch rows on the fused
        (slot, dy, dx) axis (a free XLA reshape of [n_rv, ks_pad, sp*c])
    :param slots_rep_win: [n_steps, 1, kw*sp] windowed slot ids repeated
        over sp, ONE row per grid step (all GB chunk rows of a step share the
        step's window; streaming the row per GB-row block would cost 8x the
        HBM. Mosaic needs the sublane block dim to equal the array dim, hence
        the explicit singleton axis)
    :param w0b: [n_steps] int32 window block starts (units of KB slots),
        one per GB-chunk grid step
    :param pid..wx1: [n_flat, sblk] per-sample ingredients (block-major flat:
        row j = rv * nsb + chunk)
    :return: [n_flat, sblk, c] out_dtype
    """
    n_flat = pid.shape[0]
    w = kw * sp
    m = kw // KB
    nsb = n_flat // n_rv
    assert kw % KB == 0 and nsb % GB == 0 and n_flat % n_rv == 0
    npg = nsb // GB
    n_steps = n_flat // GB
    assert slots_rep_win.shape == (n_steps, 1, w), (
        slots_rep_win.shape, n_steps)
    grid = (n_steps,)
    from jax.experimental.pallas import tpu as pltpu

    gspec = []
    for j in range(m):
        gspec.append(pl.BlockSpec(
            (1, KB * sp, c),
            lambda i, ref, j=j: (i // npg, ref[i] + j, 0),
        ))
    persamp = pl.BlockSpec((GB, sblk), lambda i, ref: (i, 0))
    const = pl.BlockSpec((1, w), lambda i, ref: (0, 0))

    out = pl.pallas_call(
        functools.partial(_select_win_fused_kernel, m=m),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, w),
                             lambda i, ref: (i, 0, 0)),  # slots_rep_win
                const, const,                                   # dy/dx lanes
                persamp, persamp, persamp, persamp,             # pid, ly, wy0, wy1
                persamp, persamp, persamp,                      # lx, wx0, wx1
                *gspec,
            ],
            out_specs=pl.BlockSpec((GB, sblk, c), lambda i, ref: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_flat, sblk, c), out_dtype),
        compiler_params=_win_compiler_params(),
        interpret=jax.default_backend() != "tpu",
    )(w0b, slots_rep_win, dy_lane, dx_lane, pid, ly, wy0, wy1, lx, wx0, wx1,
      *([g_fused] * m))
    return out


def _select_win_fused_kernel(w0b_ref, slots_rep_ref, dy_lane_ref, dx_lane_ref,
                             pid_ref, ly_ref, wy0_ref, wy1_ref,
                             lx_ref, wx0_ref, wx1_ref, *rest, m):
    g_refs, out_ref = rest[:m], rest[m]
    gwin = jnp.concatenate([g_refs[j][...] for j in range(m)], axis=1)
    dt = gwin.dtype             # [1, Kw*sp, c] (one block's window)
    gb, sblk = pid_ref.shape
    pid = pid_ref[...]          # [GB, S]
    ly = ly_ref[...]
    lx = lx_ref[...]
    srep = slots_rep_ref[0, 0]  # [W] (shared by the step's GB rows)
    dyl = dy_lane_ref[0]        # [W]
    dxl = dx_lane_ref[0]

    eq = pid[:, :, None] == srep[None, None, :]                   # [GB, S, W]
    wy = jnp.where(dyl[None, None, :] == ly[:, :, None], wy0_ref[...][:, :, None],
                   jnp.where(dyl[None, None, :] == ly[:, :, None] + 1,
                             wy1_ref[...][:, :, None], 0.0))
    wx = jnp.where(dxl[None, None, :] == lx[:, :, None], wx0_ref[...][:, :, None],
                   jnp.where(dxl[None, None, :] == lx[:, :, None] + 1,
                             wx1_ref[...][:, :, None], 0.0))
    w = jnp.where(eq, wy * wx, 0.0).astype(dt)
    w2 = w.reshape(gb * sblk, w.shape[-1])      # major-dim merge: no-op
    out = jax.lax.dot_general(
        w2, gwin[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(dt),
    )
    out_ref[...] = out.reshape(gb, sblk, -1).astype(out_ref.dtype)


def select_win_smallc(g, slots_win, w0b, pid, ly, wy0, wy1, lx, wx0, wx1,
                      dy_lane, dx_lane, ch_onehot, *, n_rv, kw, sp, c,
                      sblk, out_dtype):
    """Windowed two-stage selection (narrow-channel tables, e.g. rgb).

    :param g: [n_rv, ks_pad, c*sp] channel-major patch rows
    :param slots_win: [n_steps, 1, kw] windowed slot ids, ONE row per grid
        step (shared by the step's GB chunk rows; singleton sublane axis for
        Mosaic's block-shape rule)
    """
    n_flat = pid.shape[0]
    csp = c * sp
    m = kw // KB
    nsb = n_flat // n_rv
    assert kw % KB == 0 and nsb % GB == 0
    npg = nsb // GB
    n_steps = n_flat // GB
    assert slots_win.shape == (n_steps, 1, kw), (
        slots_win.shape, n_steps)
    from jax.experimental.pallas import tpu as pltpu

    gspec = []
    for j in range(m):
        gspec.append(pl.BlockSpec(
            (1, KB, csp),
            lambda i, ref, j=j: (i // npg, ref[i] + j, 0),
        ))
    persamp = pl.BlockSpec((GB, sblk), lambda i, ref: (i, 0))
    const = pl.BlockSpec((1, csp), lambda i, ref: (0, 0))

    out = pl.pallas_call(
        functools.partial(_select_win_smallc_kernel, m=m),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((1, 1, kw),
                             lambda i, ref: (i, 0, 0)),  # slots_win
                const, const,                                     # dy/dx lanes
                pl.BlockSpec((csp, c), lambda i, ref: (0, 0)),    # ch_onehot
                persamp, persamp, persamp, persamp,               # pid, ly, wy0, wy1
                persamp, persamp, persamp,                        # lx, wx0, wx1
                *gspec,
            ],
            out_specs=pl.BlockSpec((GB, sblk, c), lambda i, ref: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_flat, sblk, c), out_dtype),
        compiler_params=_win_compiler_params(),
        interpret=jax.default_backend() != "tpu",
    )(w0b, slots_win, dy_lane, dx_lane, ch_onehot, pid, ly, wy0, wy1,
      lx, wx0, wx1, *([g] * m))
    return out


def _select_win_smallc_kernel(w0b_ref, slots_ref, dy_lane_ref, dx_lane_ref,
                              ch_ref, pid_ref, ly_ref, wy0_ref, wy1_ref,
                              lx_ref, wx0_ref, wx1_ref, *rest, m):
    g_refs, out_ref = rest[:m], rest[m]
    gwin = jnp.concatenate([g_refs[j][...] for j in range(m)], axis=1)
    dt = gwin.dtype             # [1, Kw, c*sp]
    gb, sblk = pid_ref.shape
    pid = pid_ref[...]          # [GB, S]
    swin = slots_ref[0, 0]      # [Kw] (shared by the step's GB rows)
    eq = (pid[:, :, None] == swin[None, None, :]).astype(dt)       # [GB,S,Kw]
    eq2 = eq.reshape(gb * sblk, eq.shape[-1])   # major-dim merge: no-op
    z = jax.lax.dot_general(
        eq2, gwin[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(dt),
    ).reshape(gb, sblk, -1)                                        # [GB,S,c*sp]

    dyl = dy_lane_ref[0]        # [c*sp]
    dxl = dx_lane_ref[0]
    ly = ly_ref[...]
    lx = lx_ref[...]
    wy = jnp.where(dyl[None, None, :] == ly[:, :, None], wy0_ref[...][:, :, None],
                   jnp.where(dyl[None, None, :] == ly[:, :, None] + 1,
                             wy1_ref[...][:, :, None], 0.0))
    wx = jnp.where(dxl[None, None, :] == lx[:, :, None], wx0_ref[...][:, :, None],
                   jnp.where(dxl[None, None, :] == lx[:, :, None] + 1,
                             wx1_ref[...][:, :, None], 0.0))
    zw = z * (wy * wx)
    out = jax.lax.dot_general(
        zw, ch_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_sel_precision(dt),
    )
    out_ref[...] = out.astype(out_ref.dtype)
