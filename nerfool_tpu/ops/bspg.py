"""Block segment-patch gather (BSPG): epipolar sampling for raster ray blocks.

Whole-image rendering processes rays in raster order, so an 8x8 block of
target pixels has epipolar segments that sweep a narrow tube in every source
view. The tube is rigorously bounded: any sample point of any block ray at
depth z in [near, far] projects inside

    conv(corner-ray projections at near  ∪  corner-ray projections at far)
      ⊆  center-segment ⊕ Chebyshev-disc(r),
    r = max(radius of the near corner quad, radius of the far corner quad)

(projective maps preserve convexity for in-front geometry; a point between the
quads is a convex blend of a near-quad and a far-quad point, so its distance to
the blended center-segment point is at most the larger quad radius).

BSPG therefore gathers patch rows per (BLOCK, view), not per (ray, view):
walk the center segment at patch granularity (shared machinery with
ops/spg.py) and emit each path patch's 3x3 neighborhood — 9 + 3*crossings
slots, distinct by construction on a monotone path. Coverage is exact when
r + 2 <= P cells (planner-verified per scene; the +2 absorbs floor effects and
the bilinear footprint). This cuts gather rows by ~(block size) versus per-ray
SPG — at flagship scale from ~5M per-tap rows to ~2-4e4 patch rows per 8k-ray
chunk — leaving sample reconstruction (one-hot MXU matmuls, see
select_samples / the Pallas kernel) as the only per-sample cost.

Replaces the reference's per-tap F.grid_sample hot path
(/root/reference/ibrnet/projection.py:119-125) for whole-frame rendering; the
attack's random-pixel batches use ops/spg.py or the per-tap gather instead.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfool_tpu.ops.spg import (
    EPS_Z,
    SPGSpec,
    _axis_crossings,
    _cb,
    _clip_segment,
    _clip_segment_np,
    _patch_grid,
    _sample_weights,
    pack_patch_table,
    project_endpoints,
)


@dataclasses.dataclass(frozen=True)
class BSPGSpec:
    """Static description of a block gather (hashable)."""

    p: int
    h: int                 # sampled grid dims
    w: int
    h_full: int
    w_full: int
    pby: int
    pbx: int
    block: Tuple[int, int]  # (bh, bw) rays per block
    groups: Tuple[Tuple[Tuple[int, ...], int], ...]  # (views, K_path)
    # per-group plan-time bound on the L1 patch-cell span any depth-major
    # sample chunk can realize (plan_window_spans); None disables windowed
    # selection
    kwin: Tuple[int, ...] = None

    @property
    def sy(self):
        return 1.0 if self.h_full <= 1 else (self.h - 1) / (self.h_full - 1)

    @property
    def sx(self):
        return 1.0 if self.w_full <= 1 else (self.w - 1) / (self.w_full - 1)

    def k_slots(self, k_path):
        return 9 + 3 * (k_path - 1)

    def as_spg(self) -> SPGSpec:
        return SPGSpec(p=self.p, h=self.h, w=self.w, h_full=self.h_full,
                       w_full=self.w_full, pby=self.pby, pbx=self.pbx,
                       groups=self.groups)


def plan_block_groups(target_cams, src_cams, depth_range, hw_sample, p,
                      block=(8, 8), margin=2, bucket=2, n_groups=3,
                      render_stride=1):
    """Host planner: per-view center-path crossing budgets K_path for 8x8 ray
    blocks, plus verification that the tube radius fits the 1-ring dilation
    (r + 2 <= p cells).

    :return: (groups, r_max_cells). Raises if any view violates the dilation
        bound — callers should retry with a larger p or smaller block.
    """
    target_cams = np.asarray(target_cams, np.float64).reshape(-1, 34)
    src_cams = np.asarray(src_cams, np.float64).reshape(-1, 34)
    near, far = float(depth_range[0]), float(depth_range[1])
    h_s, w_s = hw_sample
    v = src_cams.shape[0]
    k_v = np.zeros(v, np.int64)
    r_max = 0.0
    bh, bw = block

    for tcam in target_cams:
        h, w = int(tcam[0]), int(tcam[1])
        intr = tcam[2:18].reshape(4, 4)
        c2w = tcam[18:34].reshape(4, 4)
        # block-corner ray grid: block corners at pixel offsets {0, b-1}*stride
        ys0 = np.arange(0, h, bh * render_stride, dtype=np.float64)
        xs0 = np.arange(0, w, bw * render_stride, dtype=np.float64)
        cy = np.stack(np.meshgrid(ys0, xs0, indexing="ij"), -1).reshape(-1, 2)
        corners = []
        for dy in (0.0, (bh - 1) * render_stride):
            for dx in (0.0, (bw - 1) * render_stride):
                corners.append(cy + np.array([dy, dx]))
        corners = np.stack(corners, 1)  # [B, 4, 2] (y, x)
        # pixel convention matches utils.cameras.get_rays (no half-pixel shift)
        pix = np.concatenate(
            [corners[..., 1:2], corners[..., 0:1],
             np.ones_like(corners[..., :1])], axis=-1,
        ).reshape(-1, 3).T  # [3, B*4]
        dirs = c2w[:3, :3] @ (np.linalg.inv(intr[:3, :3]) @ pix)
        o = c2w[:3, 3:4]
        for vi, scam in enumerate(src_cams):
            hf, wf = scam[0], scam[1]
            sy = 1.0 if hf <= 1 else (h_s - 1) / (hf - 1)
            sx = 1.0 if wf <= 1 else (w_s - 1) / (wf - 1)
            proj = scam[2:18].reshape(4, 4) @ np.linalg.inv(
                scam[18:34].reshape(4, 4))
            pa = (proj[:3, :3] @ (o + dirs * near) + proj[:3, 3:4]
                  ).reshape(3, -1, 4)  # [3, B, 4] homogeneous corners @near
            pb = (proj[:3, :3] @ (o + dirs * far) + proj[:3, 3:4]
                  ).reshape(3, -1, 4)
            # center segment = mean of HOMOGENEOUS corners (projection is
            # linear in homogeneous space, so this IS the block-center ray)
            ca_h, cb_h = pa.mean(axis=2), pb.mean(axis=2)  # [3, B]
            qa, qb = _clip_segment_np(ca_h, cb_h, w_s, h_s, sx, sy, margin=p)
            cbs = lambda x: np.floor(x).astype(np.int64) + 1
            kx = np.abs(cbs(qa[0]) // p - cbs(qb[0]) // p)
            ky = np.abs(cbs(qa[1]) // p - cbs(qb[1]) // p)
            k_v[vi] = max(k_v[vi], int((kx + ky).max()) + 1)

            # tube radius: max corner deviation from center at MATCHED depths
            # over a dense z grid, counting only view-relevant blocks (center
            # projection inside the margin-expanded rect). Any z-flip (point
            # at/behind the source camera plane) on a relevant block breaks
            # the convexity argument -> reject.
            scl = np.array([[sx], [sy]])
            # a quad needs coverage when it can contain in-rect cells: center
            # within rect+p suffices given the r+2<=p acceptance bound, but a
            # quad with an in-rect CORNER and a far-out center must also be
            # counted (it would otherwise dodge the radius check unsoundly)
            rect_lo = np.array([[-1.0 - p], [-1.0 - p]])
            rect_hi = np.array([[w_s + p], [h_s + p]])
            in_lo = np.array([[-1.0], [-1.0]])
            in_hi = np.array([[float(w_s)], [float(h_s)]])
            zg = np.geomspace(near, far, 24)
            flip_rel = False
            for z in zg:
                t = (z - near) / (far - near)
                phc = ca_h + t * (cb_h - ca_h)      # [3, B]
                ph = pa + t * (pb - pa)             # [3, B, 4]
                okc = phc[2] > EPS_Z
                qc = np.where(okc, phc[:2] / np.clip(phc[2], EPS_Z, None),
                              np.inf) * scl
                okk = ph[2] > EPS_Z                 # [B, 4]
                qk = np.where(okk, ph[:2] / np.clip(ph[2], EPS_Z, None),
                              np.inf) * scl[..., None]
                corner_in = ((qk >= in_lo[..., None]).all(0)
                             & (qk <= in_hi[..., None]).all(0)).any(1)
                rel = (okc & (qc >= rect_lo).all(0)
                       & (qc <= rect_hi).all(0)) | corner_in
                if not rel.any():
                    continue
                if (~okk.all(axis=1) & rel).any():
                    flip_rel = True
                    break
                dev = np.abs(qk - qc[:, :, None]).max(axis=(0, 2))
                r_max = max(r_max, float(dev[rel].max()))
            if flip_rel:
                raise ValueError(
                    "BSPG convexity bound violated: a view-relevant ray block "
                    "crosses the source camera plane; fall back to per-ray SPG"
                )

    if r_max + 2.0 > p:
        raise ValueError(
            f"BSPG dilation bound violated: tube radius {r_max:.1f} cells + 2 "
            f"> patch size {p}; use a larger p or a smaller ray block"
        )
    cap = _patch_grid(h_s, p) + _patch_grid(w_s, p) - 1
    k_v = np.minimum(k_v + margin, cap)
    k_v = -(-k_v // bucket) * bucket
    uniq = sorted(set(int(k) for k in k_v))
    while len(uniq) > n_groups:
        gaps = [uniq[i + 1] - uniq[i] for i in range(len(uniq) - 1)]
        i = int(np.argmin(gaps))
        lo = uniq.pop(i)
        k_v[k_v == lo] = uniq[i]
    groups = []
    for k in sorted(set(int(x) for x in k_v)):
        views = tuple(int(i) for i in np.where(k_v == k)[0])
        groups.append((views, int(k)))
    return tuple(groups), r_max


def plan_window_spans(target_cams, src_cams, depth_range, hw_sample, p,
                      block=(8, 8), render_stride=1, n_samples=64,
                      n_importance=64, inv_uniform=False, ray_grid=3,
                      group_rows=1, slack=3, channels=32):
    """Host planner: per-view upper bound on the L1 patch-cell span any
    depth-major chunk group of the windowed selector can realize.

    A grid step covers ``GB * sblk / n_rays`` consecutive depth slices of ONE
    block (the fine pass's merged z-values have gaps bounded by the coarse
    spacing, so evaluating sliding windows two slices wider on the coarse
    grid bounds it too). Rays are lattice-sampled per block (``ray_grid`` x
    ``ray_grid`` including the corners); interior-ray projections lie in the
    corner convex hull, whose L1-distance max is attained at the vertices,
    and the min-side hull/floor wobble is absorbed by ``slack`` extra cells.
    ``group_rows`` > 1 additionally unions the span over that many
    raster-consecutive blocks (not used by the current kernels — measured to
    widen windows 2-3x).

    :param p: patch size, or an iterable of patch sizes — the projection work
        is shared across sizes (cells are integer divisions of one projected
        grid), which is what makes multi-size planning affordable
    :param channels: table channel count (chunk length depends on it)
    :return: spans [V] int64 for scalar ``p``; {p: spans} for an iterable
    """
    ps = (p,) if np.isscalar(p) else tuple(p)
    target_cams = np.asarray(target_cams, np.float64).reshape(-1, 34)
    src_cams = np.asarray(src_cams, np.float64).reshape(-1, 34)
    near, far = float(depth_range[0]), float(depth_range[1])
    h_s, w_s = hw_sample
    v = src_cams.shape[0]
    bh, bw = block
    n_rays = bh * bw

    # sliding-window width in coarse depth slices (+2: fine-merge, boundary).
    # A kernel grid step spans GB chunks of one block.
    from nerfool_tpu.ops.bspg_kernel import GB
    sblk = _window_sblk(n_rays * n_samples, channels) or n_rays
    gs = GB * sblk
    window = -(-gs // n_rays) + (0 if gs % n_rays == 0 else 1) + 2

    # actual sample depths (det): uniform in z or in 1/z
    steps = np.arange(n_samples, dtype=np.float64)
    if inv_uniform:
        z_grid = 1.0 / (1.0 / near + steps * (1.0 / far - 1.0 / near)
                        / (n_samples - 1))
    else:
        z_grid = near + steps * (far - near) / (n_samples - 1)
    t_grid = (z_grid - near) / (far - near)  # homogeneous lerp fractions
    f32 = np.float32

    spans = {pp: np.zeros(v, np.int64) for pp in ps}
    for tcam in target_cams:
        h, w = int(tcam[0]), int(tcam[1])
        intr = tcam[2:18].reshape(4, 4)
        c2w = tcam[18:34].reshape(4, 4)
        ys0 = np.arange(0, h, bh * render_stride, dtype=np.float64)
        xs0 = np.arange(0, w, bw * render_stride, dtype=np.float64)
        base = np.stack(np.meshgrid(ys0, xs0, indexing="ij"), -1).reshape(-1, 2)
        nb = base.shape[0]
        offs = np.stack(np.meshgrid(
            np.linspace(0.0, (bh - 1) * render_stride, ray_grid),
            np.linspace(0.0, (bw - 1) * render_stride, ray_grid),
            indexing="ij"), -1).reshape(-1, 2)      # [L, 2] (y, x)
        nl = offs.shape[0]
        lat = base[:, None, :] + offs[None, :, :]   # [B, L, 2]
        pix = np.concatenate([lat[..., 1:2], lat[..., 0:1],
                              np.ones_like(lat[..., :1])],
                             axis=-1).reshape(-1, 3).T
        dirs = c2w[:3, :3] @ (np.linalg.inv(intr[:3, :3]) @ pix)  # [3, B*L]
        o = c2w[:3, 3:4]
        # 4-corner subset of the lattice for the center-segment start cells
        cidx = np.array([0, ray_grid - 1, (ray_grid - 1) * ray_grid,
                         ray_grid * ray_grid - 1])
        pad = (-nb) % group_rows
        b8 = (nb + pad) // group_rows

        for vi, scam in enumerate(src_cams):
            hf, wf = scam[0], scam[1]
            sy = 1.0 if hf <= 1 else (h_s - 1) / (hf - 1)
            sx = 1.0 if wf <= 1 else (w_s - 1) / (wf - 1)
            proj = scam[2:18].reshape(4, 4) @ np.linalg.inv(
                scam[18:34].reshape(4, 4))
            pa = (proj[:3, :3] @ (o + dirs * near) + proj[:3, 3:4])  # [3,B*L]
            pb = (proj[:3, :3] @ (o + dirs * far) + proj[:3, 3:4])
            ph2 = (pa[2][:, None]
                   + t_grid[None, :].astype(f32) * (pb - pa)[2][:, None])
            ok = ph2 > EPS_Z
            z = np.clip(ph2, EPS_Z, None)
            scl = np.array([sx, sy], f32).reshape(2, 1, 1)
            q = np.empty((2, nb * nl, n_samples), f32)
            for ax in range(2):
                ph_ax = (pa[ax][:, None] + t_grid[None, :].astype(f32)
                         * (pb - pa)[ax][:, None])
                q[ax] = np.where(ok, ph_ax / z, np.inf)
            q *= scl
            # relevance: any lattice ray inside the base rect at this z
            in_rect = (ok & (q[0] >= -1.0) & (q[0] <= w_s)
                       & (q[1] >= -1.0) & (q[1] <= h_s))
            rel = in_rect.reshape(nb, nl, n_samples).any(axis=1)    # [B, S]
            if pad:
                rel = np.concatenate(
                    [rel, np.zeros((pad, n_samples), bool)], axis=0)
            rel8 = rel.reshape(b8, group_rows, n_samples)[:, :, None, :]
            pa4 = pa.reshape(3, nb, nl)[:, :, cidx]
            pb4 = pb.reshape(3, nb, nl)[:, :, cidx]

            for pp in ps:
                # clamped walk-space cells (clip rect is grid + p margin)
                qc = np.clip(q, [[[-1.0 - pp]], [[-1.0 - pp]]],
                             [[[w_s + pp]], [[h_s + pp]]])
                cell = ((np.floor(qc).astype(np.int32) + 1) // pp)  # [2,BL,S]
                # start cells from the clipped center segment (corner means)
                qa, _ = _clip_segment_np(pa4.mean(axis=2), pb4.mean(axis=2),
                                         w_s, h_s, sx, sy, margin=pp)
                start = (np.floor(qa).astype(np.int32) + 1) // pp   # [2, B]
                d = (np.abs(cell[0].reshape(nb, nl, -1)
                            - start[0][:, None, None])
                     + np.abs(cell[1].reshape(nb, nl, -1)
                              - start[1][:, None, None]))           # [B,L,S]
                d = np.where(rel[:nb, None, :], d, -1)
                if pad:
                    d = np.concatenate(
                        [d, np.full((pad, nl, n_samples), -1, np.int32)],
                        axis=0)
                d8 = d.reshape(b8, group_rows, nl, n_samples)
                big = 1 << 30
                dmax = d8.max(axis=(1, 2))                          # [b8, S]
                dmin = np.where(np.broadcast_to(rel8, d8.shape), d8,
                                big).min(axis=(1, 2))
                # sliding chunk windows over the sample axis
                span_v = 0
                for s0 in range(0, n_samples - 1):
                    s1 = min(n_samples, s0 + window)
                    wmax = dmax[:, s0:s1].max(axis=1)
                    wmin = dmin[:, s0:s1].min(axis=1)
                    valid = wmax >= 0
                    if valid.any():
                        span_v = max(span_v, int(
                            (wmax[valid]
                             - np.minimum(wmin[valid], wmax[valid])).max()))
                spans[pp][vi] = max(spans[pp][vi], span_v + slack)
    return spans[ps[0]] if np.isscalar(p) else spans


def make_block_spec(groups, p, hw_sample, hw_full, block=(8, 8), kwin=None):
    h_s, w_s = hw_sample
    h_f, w_f = hw_full
    return BSPGSpec(
        p=p, h=int(h_s), w=int(w_s), h_full=int(h_f), w_full=int(w_f),
        pby=_patch_grid(int(h_s), p), pbx=_patch_grid(int(w_s), p),
        block=tuple(block), groups=groups,
        kwin=None if kwin is None else tuple(int(k) for k in kwin),
    )


def build_block_slots(pa_corners, pb_corners, spec: BSPGSpec,
                      return_starts=False):
    """Per (view, block): dilated center-path patch slots.

    :param pa_corners, pb_corners: [V, B, 4, 3] homogeneous projections of the
        4 block-corner rays at near / far
    :param return_starts: also return the walk start cells per group
        ((pbx0, pby0) [Vg, B] int32 each) — the windowed selector's slot
        positions are keyed on L1 cell distance from the start
    :return: list over spec.groups of slot arrays [Vg, B, Ks] (int32, -1 pads)
        (and, if requested, the matching list of start-cell pairs)
    """
    pa_corners = jax.lax.stop_gradient(pa_corners)
    pb_corners = jax.lax.stop_gradient(pb_corners)
    v, b = pa_corners.shape[:2]
    sspec = spec.as_spg()
    # center segment = mean of HOMOGENEOUS corner projections (= the block
    # center ray's projection: projection is linear in homogeneous space),
    # clipped against the rect EXPANDED by p cells so the path keeps tracking
    # the in-rect tube when the center line grazes or exits the border
    # (coverage needs the path within r+1 <= p-1 cells of every in-rect tube
    # cell; the planner verifies r + 2 <= p)
    cax, cay, cbx, cby = _clip_segment(
        pa_corners.mean(axis=2), pb_corners.mean(axis=2), sspec,
        margin=spec.p,
    )

    out = []
    starts = []
    for views, k_path in spec.groups:
        vi = jnp.asarray(views)
        out.append(_dilated_walk(
            cax[vi], cay[vi], cbx[vi], cby[vi], spec, k_path
        ))
        rawcb = lambda x: jnp.floor(x).astype(jnp.int32) + 1
        starts.append((rawcb(cax[vi]) // spec.p, rawcb(cay[vi]) // spec.p))
    if return_starts:
        return out, starts
    return out


def _dilated_walk(ax, ay, bx, by, spec: BSPGSpec, k_path):
    """Center-segment patch path + 3x3 dilation: slots [Vg, B, 9+3*(k_path-1)].

    Emission: the initial patch contributes its full 3x3 neighborhood; every
    x-crossing (to pbx') contributes the column (pbx'+sx, pby'+{-1,0,1}),
    every y-crossing the row (pbx'+{-1,0,1}, pby'+sy). On a per-axis-monotone
    path these are distinct; out-of-grid neighbors become -1 (never matched).
    """
    p = spec.p
    # UNclamped base cells: the center path may run through the margin zone
    # outside the grid; ring members are validity-filtered individually
    rawcb = lambda x: jnp.floor(x).astype(jnp.int32) + 1
    pbx0 = rawcb(ax) // p
    pbx1 = rawcb(bx) // p
    pby0 = rawcb(ay) // p
    pby1 = rawcb(by) // p

    def pid_of(px, py):
        ok = (px >= 0) & (px < spec.pbx) & (py >= 0) & (py < spec.pby)
        return jnp.where(ok, py * spec.pbx + px, -1)

    # initial 3x3 ring
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    init = jnp.stack(
        [pid_of(pbx0 + dx, pby0 + dy) for dy, dx in offs], axis=-1
    )  # [Vg, B, 9]
    kc = k_path - 1
    if kc == 0:
        return init

    lam_x, sgn_x = _axis_crossings(ax, bx, pbx0, pbx1, p, kc)
    lam_y, sgn_y = _axis_crossings(ay, by, pby0, pby1, p, kc)
    lam = jnp.concatenate([lam_x, lam_y], axis=-1)
    is_x = jnp.concatenate(
        [jnp.ones((kc,), jnp.int32), jnp.zeros((kc,), jnp.int32)]
    )
    order = jnp.argsort(lam, axis=-1)
    lam_s = jnp.take_along_axis(lam, order, axis=-1)
    flag_s = jnp.take_along_axis(jnp.broadcast_to(is_x, lam.shape), order,
                                 axis=-1)
    fin = jnp.isfinite(lam_s)
    cum_x = jnp.cumsum(flag_s * fin, axis=-1)
    cum_y = jnp.cumsum((1 - flag_s) * fin, axis=-1)
    pbx_j = pbx0[..., None] + sgn_x[..., None] * cum_x
    pby_j = pby0[..., None] + sgn_y[..., None] * cum_y
    # emitted triple per crossing: advanced row/col one ahead in the step
    # direction, spanning {-1,0,1} across it
    lead_x = pbx_j + sgn_x[..., None]
    lead_y = pby_j + sgn_y[..., None]
    tris = []
    for d in (-1, 0, 1):
        px = jnp.where(flag_s == 1, lead_x, pbx_j + d)
        py = jnp.where(flag_s == 1, pby_j + d, lead_y)
        tris.append(jnp.where(fin, pid_of(px, py), -1))
    tri = jnp.stack(tris, axis=-1)  # [Vg, B, 2kc, 3]
    tri = tri[..., :kc, :].reshape(tri.shape[:-2] + (3 * kc,))
    return jnp.concatenate([init, tri], axis=-1)  # [Vg, B, 9+3kc]


def gather_block_patches(table, slots_groups, spec: BSPGSpec):
    """table [V, Pby*Pbx, row] -> list of G [Vg, B, Ks, row]."""
    v, n_p, row = table.shape
    flat = table.reshape(v * n_p, row)
    out = []
    for (views, _), slots in zip(spec.groups, slots_groups):
        vi = np.asarray(views)
        base = jnp.asarray(vi * n_p, jnp.int32)[:, None, None]
        idx = jnp.maximum(slots, 0) + base
        out.append(flat[idx.reshape(-1)].reshape(slots.shape + (row,)))
    return out


def _select_group_xla(g, slots, ixg, iyg, spec: BSPGSpec, ks, c, dt):
    """Plain-XLA one-hot selection for one view group (the Pallas kernels'
    numerical reference, and the fallback when their grid constraints —
    (views*blocks) % GB, sample-chunk divisibility — don't hold, e.g. on the
    tiny scenes of smoke tests)."""
    p = spec.p
    b = g.shape[1]
    pid, wy, wx = _sample_weights(ixg, iyg, spec.as_spg(), dt)
    eq = (pid[..., None] == slots[:, :, None, :]).astype(dt)
    w1 = (eq[..., :, None] * wy[..., None, :]).reshape(
        eq.shape[:3] + (ks * (p + 1),))
    gk = g.reshape(g.shape[0], b, ks * (p + 1), (p + 1) * c)
    # HIGHEST: DEFAULT MXU precision rounds operands to bf16 (see
    # ops/spg.py select_samples) — exact selection needs full-f32 passes
    z = jnp.einsum("vbsk,vbkc->vbsc", w1, gk,
                   precision=jax.lax.Precision.HIGHEST)
    z = z.reshape(z.shape[:3] + (p + 1, c))
    return jnp.einsum("vbsp,vbspc->vbsc", wx, z,
                      precision=jax.lax.Precision.HIGHEST)


def _pack_pairs_out(out):
    """Ray-major group output [vg, b, n, s, c] -> ray-packed
    [vg, b, n/2, s, 2, c] (adjacent ray pairs along a trailing pair axis —
    reshaping the last two dims to 2c yields the models' ray-packed layout)."""
    vg, b, n, s, c = out.shape
    return out.reshape(vg, b, n // 2, 2, s, c).swapaxes(3, 4)


def select_block_samples(g_groups, slots_groups, gx, gy, spec: BSPGSpec, c,
                         use_pallas=False, packed_pairs=False):
    """Exact bilinear taps for every (ray-in-block, sample) from block patches.

    :param gx, gy: [V, B, n, S] normalized coords (n = rays per block)
    :param packed_pairs: emit the ray-packed layout [V, B, n/2, S, 2, c]
        (adjacent ray pairs) instead — the GNT ray_fold consumers take the
        packed operand straight from the selection, with no relayout of the
        gathered tensor.
    :return: [V, B, n, S, c] (or [V, B, n/2, S, 2, c] packed)
    """
    v, b, n, s = gx.shape
    dt = g_groups[0].dtype
    p = spec.p

    ix = (gx + 1.0) * 0.5 * (spec.w - 1)
    iy = (gy + 1.0) * 0.5 * (spec.h - 1)

    from nerfool_tpu.ops.bspg_kernel import GB

    outs = []
    for (views, k_path), slots, g in zip(spec.groups, slots_groups, g_groups):
        vi = jnp.asarray(views)
        ks = spec.k_slots(k_path)
        # per-sample ingredients on the flattened (block-ray-sample) axis
        ixg = ix[vi].reshape(len(views), b, n * s)
        iyg = iy[vi].reshape(len(views), b, n * s)
        if use_pallas and (len(views) * b) % GB == 0:
            from nerfool_tpu.ops.spg import _sample_ingredients
            from nerfool_tpu.ops.bspg_kernel import (
                select_block_pallas_ingredients,
            )

            ing = _sample_ingredients(ixg, iyg, spec.as_spg(), dt)
            if c <= 8:
                from nerfool_tpu.ops.bspg_kernel import (
                    select_block_pallas_smallc,
                )

                out = select_block_pallas_smallc(
                    g, slots, ing["pid"], ing["ly"], ing["fy"], ing["vy0"],
                    ing["vy1"], ing["lx"], ing["fx"], ing["vx0"],
                    ing["vx1"], spec, c, out_dtype=dt,
                )
            else:
                out = select_block_pallas_ingredients(
                    g, slots, ing["pid"], ing["ly"], ing["fy"], ing["vy0"],
                    ing["vy1"], ing["lx"], ing["fx"], ing["vx0"],
                    ing["vx1"], spec, c,
                )
            out = out.astype(dt)
        else:
            out = _select_group_xla(g, slots, ixg, iyg, spec, ks, c, dt)
        out = out.reshape(len(views), b, n, s, c)
        outs.append(_pack_pairs_out(out) if packed_pairs else out)

    out = jnp.concatenate(outs, axis=0)
    order = np.concatenate([np.asarray(vs) for vs, _ in spec.groups])
    inv = np.argsort(order)
    return out[jnp.asarray(inv)]


def plan_render_specs(target_cams, src_cams, depth_range, rgb_hw, feat_hw,
                      block=(8, 8), render_stride=1,
                      feat_ps=(4, 6, 8, 12, 16), rgb_ps=(8, 12, 16, 24, 32),
                      max_slots=None, n_samples=64, n_importance=64,
                      inv_uniform=False, windows=True):
    """Convenience planner: (spec_feat, spec_rgb) for whole-frame rendering,
    or None when no patch size satisfies the coverage bound (caller falls back
    to the per-tap gather).

    Picks the smallest admissible patch size per table — selection FLOPs scale
    with K*(p+1)^2*C and small p minimizes that product once coverage holds.
    With ``windows`` the specs carry plan_window_spans bounds (spec.kwin) so
    the windowed Pallas selector can size its per-chunk slot windows; the cost
    model then uses the windowed width for the dominant per-sample work.
    """
    from nerfool_tpu.ops.bspg_kernel import KB

    def pick(hw_sample, ps, channels):
        groups_by_p = {}
        for p in ps:
            try:
                groups, _ = plan_block_groups(
                    target_cams, src_cams, depth_range, hw_sample, p,
                    block=block, render_stride=render_stride,
                )
            except ValueError:
                continue
            worst = max(9 + 3 * (k - 1) for _, k in groups)
            if max_slots is not None and worst > max_slots:
                continue
            groups_by_p[p] = groups
        if not groups_by_p:
            return None
        spans_by_p = {}
        if windows:
            spans_by_p = plan_window_spans(
                target_cams, src_cams, depth_range, hw_sample,
                tuple(groups_by_p), block=block,
                render_stride=render_stride, n_samples=n_samples,
                n_importance=n_importance, inv_uniform=inv_uniform,
                channels=channels,
            )
        best = None
        best_cost = None
        for p, groups in groups_by_p.items():
            kwin = None
            if windows:
                spans = spans_by_p[p]
                kwin = tuple(int(max(spans[list(v)])) for v, _ in groups)

            # per-sample selection work scales with the contracted one-hot
            # width (windowed where available) x (p+1)^2
            def width(gi, k):
                ks_pad = -(-(9 + 3 * (k - 1)) // KB) * KB
                if kwin is None:
                    return ks_pad
                return min(ks_pad, -(-(3 * kwin[gi] + 18) // KB) * KB)
            cost = sum(len(v) * width(gi, k) * (p + 1) ** 2
                       for gi, (v, k) in enumerate(groups))
            if best_cost is None or cost < best_cost:
                best_cost = cost
                best = make_block_spec(
                    groups, p, hw_sample,
                    (int(target_cams.reshape(-1, 34)[0][0]),
                     int(target_cams.reshape(-1, 34)[0][1])), block=block,
                    kwin=kwin)
        return best

    target_cams = np.asarray(target_cams, np.float64)
    spec_f = pick(feat_hw, feat_ps, 32)
    if spec_f is None:
        return None
    spec_r = pick(rgb_hw, rgb_ps, 3)
    if spec_r is None:
        return None
    return spec_f, spec_r


def _win_two_stage():
    """A/B switch for the wide-channel windowed selection formulation
    (BSPG_WIN_TWOSTAGE=0 reverts to the fused one-hot kernel)."""
    import os

    return os.environ.get("BSPG_WIN_TWOSTAGE", "1") != "0"


def _window_sblk(ns, c):
    """Sample-chunk length for windowed selection (multiple of 128 dividing
    ns). Short chunks narrow the depth range per chunk and therefore the slot
    windows; measured per-call cost is flat in sblk for both kernels, so the
    narrowest lane-width chunk wins for the wide-channel (feat) kernel whose
    cost scales with window width. The narrow-channel kernel is
    width-insensitive — longer chunks keep its grid small."""
    sblk = 512 if c <= 8 else 128
    while ns % sblk and sblk > 128:
        sblk //= 2
    return sblk if ns % sblk == 0 else 0


def select_block_samples_win(g_groups, slots_groups, starts_groups, gx, gy,
                             spec: BSPGSpec, c, kw_override=None,
                             sblk_override=None, debug=None,
                             packed_pairs=False):
    """Windowed Pallas selection: depth-major sample chunks only compare/
    contract against the Kw-slot window of the walk their depth range can
    touch (slot position ~ 3 * L1 cell distance from the walk start + the
    9-slot init ring; see bspg_kernel.py windowed section).

    Window widths come from the plan-time span bound ``spec.kwin`` (per
    group; plan_window_spans evaluates the realizable chunk spans from the
    actual camera geometry and sample depths). Falls back to the full-width
    kernels per group when no bound is available or the window would not be
    narrower than the padded slot list.
    """
    from nerfool_tpu.ops.bspg_kernel import (
        GB,
        KB,
        select_block_pallas_ingredients,
        select_block_pallas_smallc,
        select_win_fused,
        select_win_smallc,
    )
    from nerfool_tpu.ops.spg import _sample_ingredients

    v, b, n, s = gx.shape
    dt = g_groups[0].dtype
    p = spec.p
    p1 = p + 1
    sp = p1 * p1
    ns = n * s

    ix = (gx + 1.0) * 0.5 * (spec.w - 1)
    iy = (gy + 1.0) * 0.5 * (spec.h - 1)

    outs = []
    for gi, ((views, k_path), slots, (px0, py0), g) in enumerate(zip(
            spec.groups, slots_groups, starts_groups, g_groups)):
        vi = jnp.asarray(views)
        vg = len(views)
        ks = spec.k_slots(k_path)
        n_rv = vg * b
        sblk = sblk_override or _window_sblk(ns, c)
        ks_pad = -(-ks // KB) * KB
        if kw_override is not None:
            kw = min(kw_override, ks_pad)
        elif spec.kwin is not None and sblk:
            # window must cover [lo, hi] of any realizable chunk:
            # hi - lo <= 3 * span + 18 (see the w0 placement below)
            kw = min(ks_pad, -(-(3 * spec.kwin[gi] + 18) // KB) * KB)
        else:
            kw = ks_pad
        if debug is not None:
            debug.append((kw, ks_pad, sblk))

        nsb = ns // sblk if sblk else 0
        if n_rv % GB:
            # grid constraint violated (tiny smoke scenes): XLA selection
            ixg = ix[vi].reshape(vg, b, ns)
            iyg = iy[vi].reshape(vg, b, ns)
            out = _select_group_xla(g, slots, ixg, iyg, spec, ks, c, dt)
            out = out.reshape(vg, b, n, s, c)
            outs.append(_pack_pairs_out(out) if packed_pairs else out)
            continue
        if kw >= ks_pad or not sblk or nsb % GB:
            # no window benefit: full-width kernels on ray-major ingredients
            ixg = ix[vi].reshape(vg, b, ns)
            iyg = iy[vi].reshape(vg, b, ns)
            ing = _sample_ingredients(ixg, iyg, spec.as_spg(), dt)
            fn = (select_block_pallas_smallc if c <= 8
                  else select_block_pallas_ingredients)
            out = fn(g, slots, ing["pid"], ing["ly"], ing["fy"], ing["vy0"],
                     ing["vy1"], ing["lx"], ing["fx"], ing["vx0"],
                     ing["vx1"], spec, c, out_dtype=dt).astype(dt)
            out = out.reshape(vg, b, n, s, c)
            outs.append(_pack_pairs_out(out) if packed_pairs else out)
            continue

        # depth-major ingredients: chunk = contiguous depth range per block.
        # Rows stay BLOCK-major (row j = rv * nsb + chunk): a kernel grid
        # step's GB rows are GB consecutive chunks of ONE block, so the
        # shared slot window only has to cover one block's walk over
        # GB * sblk samples — no cross-block union (raster-adjacent walks
        # are phase-shifted and would widen the window 2-3x).
        ixg = ix[vi].transpose(0, 1, 3, 2).reshape(vg, b, ns)
        iyg = iy[vi].transpose(0, 1, 3, 2).reshape(vg, b, ns)
        ing = _sample_ingredients(ixg, iyg, spec.as_spg(), dt)
        npg = nsb // GB                    # chunk groups (grid steps) per row
        n_flat = nsb * n_rv

        # per-chunk-group windows from the L1-distance invariant
        pid = ing["pid"].reshape(n_rv, ns)
        pbx = pid % spec.pbx
        pby = pid // spec.pbx
        px0f = px0.reshape(n_rv)[:, None]
        py0f = py0.reshape(n_rv)[:, None]
        pos = jnp.abs(pbx - px0f) + jnp.abs(pby - py0f)
        rel = (((ing["vy0"] + ing["vy1"]) > 0.5)
               & ((ing["vx0"] + ing["vx1"]) > 0.5)).reshape(n_rv, ns)
        pos2 = pos.reshape(n_rv, npg, GB * sblk)
        rel2 = rel.reshape(n_rv, npg, GB * sblk)
        big = jnp.int32(1 << 30)
        pmin = jnp.min(jnp.where(rel2, pos2, big), axis=-1)       # [n_rv,npg]
        pmax = jnp.max(jnp.where(rel2, pos2, -1), axis=-1)
        # the triple at crossing rank r (slots 3r+6..3r+8) covers cells at L1
        # distance r..r+2 from the walk start (its lead cell is one ahead of
        # the post-crossing cell), so a cell at distance d >= 3 occupies a
        # slot in [3d, 3d+8]; d <= 2 may also sit in the 9-slot init ring.
        # [lo, hi) below covers every realizable match, and
        # hi - lo <= 3*(pmax - pmin) + 15 <= the kw bound of 3*span + 18.
        lo = jnp.where(pmin <= 2, 0, 3 * pmin)
        hi = 3 * pmax + 9
        w0 = jnp.where(hi - lo <= kw, lo, (lo + hi - kw) // 2)
        w0 = jnp.clip(w0, 0, ks_pad - kw)
        w0b = (w0 // KB).astype(jnp.int32)                        # [n_rv,npg]
        w0b_flat = w0b.reshape(-1)                                # step order

        # windowed slot values (per chunk group, replicated per chunk row)
        slots2 = slots.reshape(n_rv, ks)
        slots2 = jnp.pad(slots2, ((0, 0), (0, ks_pad - ks)),
                         constant_values=-1)
        idx = (w0b * KB)[..., None] + jnp.arange(kw)[None, None]  # [n_rv,npg,kw]
        wslots = jnp.take_along_axis(
            jnp.broadcast_to(slots2[:, None, :], (n_rv, npg, ks_pad)),
            idx, axis=2,
        )                                                          # [n_rv,npg,kw]

        def rows(x):  # [n_rv, ns] -> [n_flat, sblk] (block-major rows)
            return x.reshape(n_flat, sblk)

        f32 = jnp.float32
        pid_r = rows(pid)
        ly_r = rows(ing["ly"].reshape(n_rv, ns))
        lx_r = rows(ing["lx"].reshape(n_rv, ns))
        fy = ing["fy"].reshape(n_rv, ns)
        fx = ing["fx"].reshape(n_rv, ns)
        wy0 = rows(((1.0 - fy) * ing["vy0"].reshape(n_rv, ns)).astype(f32))
        wy1 = rows((fy * ing["vy1"].reshape(n_rv, ns)).astype(f32))
        wx0 = rows(((1.0 - fx) * ing["vx0"].reshape(n_rv, ns)).astype(f32))
        wx1 = rows((fx * ing["vx1"].reshape(n_rv, ns)).astype(f32))

        if c <= 8:
            csp = c * sp
            gc = g.reshape(n_rv, ks, sp, c).transpose(0, 1, 3, 2)
            gc = gc.reshape(n_rv, ks, csp)
            gc = jnp.pad(gc, ((0, 0), (0, ks_pad - ks), (0, 0)))
            j = np.arange(csp)
            off = j % sp
            dy_lane = jnp.asarray(off // p1, jnp.int32)[None]
            dx_lane = jnp.asarray(off % p1, jnp.int32)[None]
            ch_onehot = jnp.asarray(
                (j // sp)[:, None] == np.arange(c)[None, :], f32)
            # one row per grid step — the step's GB chunk rows share it
            wslots_r = wslots.reshape(n_rv * npg, 1, kw)
            out = select_win_smallc(
                gc, wslots_r, w0b_flat, pid_r, ly_r, wy0, wy1, lx_r,
                wx0, wx1, dy_lane, dx_lane, ch_onehot,
                n_rv=n_rv, kw=kw, sp=sp, c=c, sblk=sblk, out_dtype=dt,
            )
        elif _win_two_stage():
            # two-stage on the NATIVE [ks, sp*c] row layout (no transpose):
            # stage-1 slot one-hot compares only kw lanes instead of the
            # fused kernel's kw*sp — the dominant per-sample VPU work drops
            # ~40% at flagship widths. The smallc kernel is layout-agnostic
            # given the lane constants: lane j holds spatial offset j // c
            # (sp-major) and channel j % c, and the collapse indicator sums
            # each channel's sp lanes.
            csp = sp * c
            gf = g.reshape(n_rv, ks, csp)
            gf = jnp.pad(gf, ((0, 0), (0, ks_pad - ks), (0, 0)))
            j = np.arange(csp)
            off = j // c
            dy_lane = jnp.asarray(off // p1, jnp.int32)[None]
            dx_lane = jnp.asarray(off % p1, jnp.int32)[None]
            ch_onehot = jnp.asarray(
                (j % c)[:, None] == np.arange(c)[None, :], f32)
            wslots_r = wslots.reshape(n_rv * npg, 1, kw)
            out = select_win_smallc(
                gf, wslots_r, w0b_flat, pid_r, ly_r, wy0, wy1, lx_r,
                wx0, wx1, dy_lane, dx_lane, ch_onehot,
                n_rv=n_rv, kw=kw, sp=sp, c=c, sblk=sblk, out_dtype=dt,
            )
        else:
            w_lanes = kw * sp
            gf = g.reshape(n_rv, ks, sp * c)
            gf = jnp.pad(gf, ((0, 0), (0, ks_pad - ks), (0, 0)))
            gf = gf.reshape(n_rv, ks_pad * sp, c)  # free: row-major no-op
            srep = jnp.repeat(wslots, sp, axis=-1)  # [n_rv, npg, kw*sp]
            # one row per grid step — the step's GB chunk rows share it
            srep_r = srep.reshape(n_rv * npg, 1, w_lanes)
            j = np.arange(w_lanes)
            dy_lane = jnp.asarray((j // p1) % p1, jnp.int32)[None]
            dx_lane = jnp.asarray(j % p1, jnp.int32)[None]
            out = select_win_fused(
                gf, srep_r, w0b_flat, pid_r, ly_r, wy0, wy1, lx_r,
                wx0, wx1, dy_lane, dx_lane,
                n_rv=n_rv, kw=kw, sp=sp, c=c, sblk=sblk, out_dtype=dt,
            )

        if packed_pairs:
            # the depth-major kernel output pays ONE exit transpose either
            # way; the packed form moves 2c-contiguous runs (vs c), so
            # emitting the ray-packed layout here is the cheaper exit
            out = out.reshape(vg, b, s, n // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        else:
            out = out.reshape(vg, b, s, n, c).transpose(0, 1, 3, 2, 4)
        outs.append(out)

    out = jnp.concatenate(outs, axis=0)
    order = np.concatenate([np.asarray(vs) for vs, _ in spec.groups])
    inv = np.argsort(order)
    return out[jnp.asarray(inv)]
