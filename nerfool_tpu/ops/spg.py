"""Segment-patch gather (SPG): epipolar sampling with per-segment patch rows.

The renderer's bottleneck on TPU is the per-tap random row gather: one row per
(ray, sample, view) bilinear tap, and row gathers are issue-rate bound (~25-34M
rows/s on v5e for 0.25-8KB rows — measured; cost is per ROW, nearly flat in row
width). But all samples of one (ray, view) pair lie on ONE epipolar segment
(the projection of a 3D line is a line, monotonically parameterized while in
front of the camera). SPG exploits this:

  1. Tile each source image into overlapping (P+1)x(P+1)-pixel patch rows at
     stride P (a patch serves every bilinear footprint whose base cell falls in
     its P x P cell block).
  2. Per (ray, view): walk the segment once, enumerating the <= K patches it
     crosses (K is a small static per-view bound computed on the host from the
     scene cameras), and gather those K fat rows — replacing S=64..192 per-tap
     rows with K~8..25 patch rows.
  3. Reconstruct every sample's EXACT bilinear tap from the gathered patches
     with one-hot matmuls (slot-equality x bilinear row weights ride the MXU;
     no second HBM gather).

Numerics are identical to grid_sample.gather_bilinear_planes (align_corners,
zeros padding, per-corner validity) — see tests/test_spg.py. Gradients flow to
the table (image/delta) through the matmuls and to the coordinates through the
fractional weights, exactly as in the per-tap path.

Replaces the hot path of the reference projector F.grid_sample calls
(/root/reference/ibrnet/projection.py:119-125) with a segment-level design that
has no reference counterpart (the reference gathers per tap on GPU).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS_Z = 1e-6


@dataclasses.dataclass(frozen=True)
class SPGSpec:
    """Static per-table description (hashable: safe inside RenderConfig).

    Coordinates: projection yields FULL-resolution pixel coords; the sampled
    grid (feature maps at 1/4 res, or the rgb image itself) rescales them by
    (n_s - 1)/(n_full - 1) per axis (align_corners semantics).
    """

    p: int                       # patch size in cells; patches are (p+1)^2 px
    h: int                       # sampled grid height (h_s)
    w: int
    h_full: int                  # full-res height (projection pixel space)
    w_full: int
    pby: int                     # patch grid dims
    pbx: int
    # view groups: tuple of (view_indices tuple, K). Views in one group share
    # a static per-segment patch budget K; grouping keeps the budget tight for
    # near views without paying the far views' worst case everywhere.
    groups: Tuple[Tuple[Tuple[int, ...], int], ...]

    @property
    def sy(self):
        return 1.0 if self.h_full <= 1 else (self.h - 1) / (self.h_full - 1)

    @property
    def sx(self):
        return 1.0 if self.w_full <= 1 else (self.w - 1) / (self.w_full - 1)


def _patch_grid(n, p):
    """#patches along an axis of n pixels: base cells cb span [0, n]."""
    return -(-(n + 1) // p)  # ceil((n+1)/p)


def plan_groups(target_cams, src_cams, depth_range, hw_sample, p,
                ray_stride=4, margin=3, bucket=4, n_groups=3):
    """Host-side planner: per-view static patch budgets K, bucketed into
    ``n_groups`` view groups.

    For every (target pixel ray, source view) the segment between the
    projections of the near/far ray points is clipped to the image rectangle
    and its patch-boundary crossing count |d(pb_x)| + |d(pb_y)| is computed
    exactly; K_v = max over rays (+``margin`` to absorb the ray subsampling
    stride and endpoint float wobble).

    :param target_cams: [T, 34] candidate target cameras (ALL cameras the
        attack/render may query — train + test + render-path poses)
    :param src_cams: [V, 34]
    :param depth_range: (near, far)
    :param hw_sample: (h_s, w_s) of the sampled grid
    :return: groups tuple for SPGSpec
    """
    target_cams = np.asarray(target_cams, np.float64).reshape(-1, 34)
    src_cams = np.asarray(src_cams, np.float64).reshape(-1, 34)
    near, far = float(depth_range[0]), float(depth_range[1])
    h_s, w_s = hw_sample
    v = src_cams.shape[0]
    k_v = np.zeros(v, np.int64)

    for tcam in target_cams:
        h, w = int(tcam[0]), int(tcam[1])
        intr = tcam[2:18].reshape(4, 4)
        c2w = tcam[18:34].reshape(4, 4)
        ys, xs = np.meshgrid(
            np.arange(0, h, ray_stride, dtype=np.float64),
            np.arange(0, w, ray_stride, dtype=np.float64), indexing="ij",
        )
        # pixel convention matches utils.cameras.get_rays (no half-pixel shift)
        pix = np.stack([xs.ravel(), ys.ravel(), np.ones(xs.size)])
        dirs = c2w[:3, :3] @ (np.linalg.inv(intr[:3, :3]) @ pix)  # [3, N]
        o = c2w[:3, 3:4]
        for vi, scam in enumerate(src_cams):
            hf, wf = scam[0], scam[1]
            sy = 1.0 if hf <= 1 else (h_s - 1) / (hf - 1)
            sx = 1.0 if wf <= 1 else (w_s - 1) / (wf - 1)
            proj = scam[2:18].reshape(4, 4) @ np.linalg.inv(
                scam[18:34].reshape(4, 4)
            )
            pa = proj[:3, :3] @ (o + dirs * near) + proj[:3, 3:4]
            pb = proj[:3, :3] @ (o + dirs * far) + proj[:3, 3:4]
            qa, qb = _clip_segment_np(pa, pb, w_s, h_s, sx, sy)
            ax, ay = qa[0], qa[1]
            bx, by = qb[0], qb[1]
            cbs = lambda x, n: np.clip(np.floor(x), -1, n - 1).astype(np.int64) + 1
            kx = np.abs(cbs(ax, w_s) // p - cbs(bx, w_s) // p)
            ky = np.abs(cbs(ay, h_s) // p - cbs(by, h_s) // p)
            k_v[vi] = max(k_v[vi], int((kx + ky).max()) + 1)

    cap = _patch_grid(h_s, p) + _patch_grid(w_s, p) - 1
    k_v = np.minimum(k_v + margin, cap)
    k_v = -(-k_v // bucket) * bucket  # round up to bucket
    # group views by K into <= n_groups buckets (by sorted K, contiguous runs)
    order = np.argsort(k_v, kind="stable")
    uniq = sorted(set(int(k) for k in k_v))
    while len(uniq) > n_groups:
        # merge the two closest K levels upward
        gaps = [uniq[i + 1] - uniq[i] for i in range(len(uniq) - 1)]
        i = int(np.argmin(gaps))
        lo = uniq.pop(i)
        k_v[k_v == lo] = uniq[i]
    groups = []
    for k in sorted(set(int(x) for x in k_v)):
        views = tuple(int(i) for i in np.where(k_v == k)[0])
        groups.append((views, int(k)))
    return tuple(groups)


def _clip_segment_np(pa, pb, w_s, h_s, sx=1.0, sy=1.0, margin=0.0):
    """Clip homogeneous segment pa->pb: z>eps portion, perspective divide,
    rescale to the sampled grid, Liang-Barsky to [-1-margin, w_s+margin] x
    [-1-margin, h_s+margin] (numpy, planner only).

    The base rect extends one cell past the last pixel on each side: taps at
    x in (n-1, n) still contribute through their in-range corner and clamp to
    base cell n, so the walk must cover that cell's patch. BSPG additionally
    expands by ``margin`` cells so a block's center path keeps tracking the
    in-rect portion of its tube when the center line grazes the border.
    """
    za, zb = pa[2], pb[2]
    dz = zb - za
    t_at = lambda z0: np.where(np.abs(dz) > 1e-12, (EPS_Z - z0) / np.where(
        np.abs(dz) > 1e-12, dz, 1.0), 0.0)
    t0 = np.where(za > EPS_Z, 0.0, np.clip(t_at(za), 0.0, 1.0))
    t1 = np.where(zb > EPS_Z, 1.0, np.clip(t_at(za), 0.0, 1.0))
    t1 = np.maximum(t1, t0)
    qa_h = pa + t0 * (pb - pa)
    qb_h = pa + t1 * (pb - pa)
    scale = np.array([[sx], [sy]])
    div = lambda ph: np.clip(
        ph[:2] / np.clip(ph[2], EPS_Z, None), -1e6, 1e6
    ) * scale
    qa, qb = div(qa_h), div(qb_h)
    d = qb - qa
    s0 = np.zeros(qa.shape[1])
    s1 = np.ones(qa.shape[1])
    m = float(margin)
    for axis, lo, hi in ((0, -1.0 - m, w_s + m), (1, -1.0 - m, h_s + m)):
        for pq, q in ((-d[axis], qa[axis] - lo), (d[axis], hi - qa[axis])):
            with np.errstate(divide="ignore", invalid="ignore"):
                r = np.where(np.abs(pq) > 1e-12, q / np.where(
                    np.abs(pq) > 1e-12, pq, 1.0), 0.0)
            s0 = np.where(pq < 0, np.maximum(s0, r), s0)
            s1 = np.where(pq > 0, np.minimum(s1, r), s1)
            s1 = np.where((np.abs(pq) <= 1e-12) & (q < 0), -1.0, s1)
    bad = s1 < s0
    s0 = np.where(bad, 0.0, s0)
    s1 = np.where(bad, 0.0, s1)
    lohi = lambda q: np.clip(q, [[-1.0 - m], [-1.0 - m]],
                             [[w_s + m], [h_s + m]])
    return lohi(qa + s0 * d), lohi(qa + s1 * d)


def pack_patch_table(images, p):
    """[V, H, W, C] -> patch table [V, Pby*Pbx, (P+1)*(P+1)*C].

    Row (pby, pbx) holds the padded pixels [pby*P .. pby*P+P] x [pbx*P ..
    pbx*P+P] (base-cell space: cb = clip(floor(x), -1, n-1)+1, pixel index in
    the 1-left-padded image = cb), channel layout [dy, dx, C]. One gathered row
    serves every bilinear footprint whose base cells fall in its PxP block.
    """
    images = jnp.asarray(images)
    v, h, w, c = images.shape
    pby, pbx = _patch_grid(h, p), _patch_grid(w, p)
    pad_y = max(0, pby * p + 1 - (h + 2))
    pad_x = max(0, pbx * p + 1 - (w + 2))
    padded = jnp.pad(images, ((0, 0), (1, 1 + pad_y), (1, 1 + pad_x), (0, 0)))

    # contiguous-slice takes (column-axis takes would lower to strided rows)
    iy = (np.arange(pby)[:, None] * p + np.arange(p + 1)[None, :]).reshape(-1)
    ix = (np.arange(pbx)[:, None] * p + np.arange(p + 1)[None, :]).reshape(-1)
    t = jnp.take(padded, jnp.asarray(iy), axis=1)     # [V, Pby*(P+1), Wp, C]
    t = jnp.moveaxis(t, 2, 1)                         # [V, Wp, Pby*(P+1), C]
    t = jnp.take(t, jnp.asarray(ix), axis=1)          # [V, Pbx*(P+1), Pby*(P+1), C]
    t = t.reshape(v, pbx, p + 1, pby, p + 1, c)
    t = t.transpose(0, 3, 1, 4, 2, 5)                 # [V, Pby, Pbx, P+1(dy), P+1(dx), C]
    return t.reshape(v, pby * pbx, (p + 1) * (p + 1) * c)


def project_endpoints(p0, p1, src_cameras):
    """Homogeneous projections of per-ray 3D segment endpoints.

    :param p0, p1: [R, 3] world points (first/last sample along each ray)
    :return: (pa, pb) each [V, R, 3] homogeneous (x*z, y*z, z)
    """
    intr = src_cameras[:, 2:18].reshape(-1, 4, 4)
    c2w = src_cameras[:, 18:34].reshape(-1, 4, 4)
    proj = jnp.matmul(intr, jnp.linalg.inv(c2w),
                      precision=jax.lax.Precision.HIGHEST)  # [V,4,4]

    def prj(pts):
        return (jnp.einsum("vij,rj->vri", proj[:, :3, :3], pts,
                           precision=jax.lax.Precision.HIGHEST)
                + proj[:, None, :3, 3])

    return prj(p0), prj(p1)


def _clip_segment(pa, pb, spec: "SPGSpec", margin=0.0):
    """In-graph twin of _clip_segment_np: [V?, R, 3] homogeneous endpoints ->
    clipped continuous SAMPLED-grid coords (ax, ay, bx, by), each [V?, R].

    Rect is [-1, n_s] per axis (one cell past the last pixel: partially-valid
    border taps clamp to base cell n_s)."""
    za, zb = pa[..., 2], pb[..., 2]
    dz = zb - za
    safe_dz = jnp.where(jnp.abs(dz) > 1e-12, dz, 1.0)
    t_flip = jnp.clip((EPS_Z - za) / safe_dz, 0.0, 1.0)
    t0 = jnp.where(za > EPS_Z, 0.0, t_flip)
    t1 = jnp.where(zb > EPS_Z, 1.0, t_flip)
    t1 = jnp.maximum(t1, t0)
    qa_h = pa + t0[..., None] * (pb - pa)
    qb_h = pa + t1[..., None] * (pb - pa)

    def div(ph):
        z = jnp.clip(ph[..., 2], EPS_Z, None)
        return (jnp.clip(ph[..., 0] / z, -1e6, 1e6) * spec.sx,
                jnp.clip(ph[..., 1] / z, -1e6, 1e6) * spec.sy)

    ax, ay = div(qa_h)
    bx, by = div(qb_h)
    m = float(margin)
    w_s, h_s = float(spec.w) + m, float(spec.h) + m
    lo = -1.0 - m
    dx, dy = bx - ax, by - ay
    s0 = jnp.zeros_like(ax)
    s1 = jnp.ones_like(ax)
    for pq, q in (
        (-dx, ax - lo), (dx, w_s - ax),
        (-dy, ay - lo), (dy, h_s - ay),
    ):
        safe = jnp.where(jnp.abs(pq) > 1e-12, pq, 1.0)
        r = q / safe
        s0 = jnp.where(pq < 0, jnp.maximum(s0, r), s0)
        s1 = jnp.where(pq > 0, jnp.minimum(s1, r), s1)
        s1 = jnp.where((jnp.abs(pq) <= 1e-12) & (q < 0), -1.0, s1)
    bad = s1 < s0
    s0 = jnp.where(bad, 0.0, s0)
    s1 = jnp.where(bad, 0.0, s1)
    cl = lambda x, n: jnp.clip(x, lo, n)
    return (cl(ax + s0 * dx, w_s), cl(ay + s0 * dy, h_s),
            cl(ax + s1 * dx, w_s), cl(ay + s1 * dy, h_s))


def _cb(x, n):
    """Continuous coord -> padded base-cell index (matches the gather's
    clip(floor, -1, n-1)+1 convention)."""
    return jnp.clip(jnp.floor(x), -1.0, n - 1.0).astype(jnp.int32) + 1


def build_slots(pa, pb, spec: SPGSpec):
    """Enumerate, per (view, ray), the <= K patches its clipped epipolar
    segment crosses, in traversal order.

    :param pa, pb: [V, R, 3] homogeneous endpoint projections (full-res)
    :return: list over spec.groups of slot arrays [Vg, R, K] (int32, -1 pads)
    """
    pa = jax.lax.stop_gradient(pa)
    pb = jax.lax.stop_gradient(pb)
    ax, ay, bx, by = _clip_segment(pa, pb, spec)

    out = []
    for views, k in spec.groups:
        vi = jnp.asarray(views)
        out.append(_walk_group(
            ax[vi], ay[vi], bx[vi], by[vi], spec, k
        ))
    return out


def _axis_crossings(a, b, pb0, pb1, p, kc):
    """Patch-boundary crossings along one axis: lambda values [..., kc] (+inf
    where invalid). Validity is integer-exact: i <= |pb1 - pb0|."""
    d = b - a
    pos = d >= 0
    sgn = jnp.where(pos, 1, -1)
    i = jnp.arange(1, kc + 1, dtype=jnp.int32)
    # boundary in continuous coords: cb transitions at x = m*p - 1
    m = jnp.where(pos[..., None], pb0[..., None] + i, pb0[..., None] - i + 1)
    bx = m.astype(a.dtype) * p - 1.0
    safe_d = jnp.where(jnp.abs(d) > 1e-12, d, 1.0)
    lam = (bx - a[..., None]) / safe_d[..., None]
    valid = i <= jnp.abs(pb1 - pb0)[..., None]
    lam = jnp.where(valid, jnp.clip(lam, 0.0, 1.0), jnp.inf)
    return lam, sgn


def _walk_group(ax, ay, bx, by, spec: SPGSpec, k):
    """Walk segments of one view group: slots [Vg, R, K] (int32; -1 padding)."""
    p = spec.p
    cbs = lambda x, n: _cb(x, n)
    pbx0 = cbs(ax, spec.w) // p
    pbx1 = cbs(bx, spec.w) // p
    pby0 = cbs(ay, spec.h) // p
    pby1 = cbs(by, spec.h) // p

    kc = k - 1
    if kc == 0:
        return (pby0 * spec.pbx + pbx0)[..., None]
    lam_x, sgn_x = _axis_crossings(ax, bx, pbx0, pbx1, p, kc)
    lam_y, sgn_y = _axis_crossings(ay, by, pby0, pby1, p, kc)

    lam = jnp.concatenate([lam_x, lam_y], axis=-1)            # [Vg,R,2kc]
    is_x = jnp.concatenate(
        [jnp.ones((kc,), jnp.int32), jnp.zeros((kc,), jnp.int32)]
    )
    order = jnp.argsort(lam, axis=-1)
    lam_s = jnp.take_along_axis(lam, order, axis=-1)
    flag = jnp.broadcast_to(is_x, lam.shape)
    flag_s = jnp.take_along_axis(flag, order, axis=-1)
    fin = jnp.isfinite(lam_s)
    cum_x = jnp.cumsum(flag_s * fin, axis=-1)
    cum_y = jnp.cumsum((1 - flag_s) * fin, axis=-1)
    pbx_j = pbx0[..., None] + sgn_x[..., None] * cum_x
    pby_j = pby0[..., None] + sgn_y[..., None] * cum_y
    pid_j = jnp.where(fin, pby_j * spec.pbx + pbx_j, -1)      # [Vg,R,2kc]
    pid0 = (pby0 * spec.pbx + pbx0)[..., None]
    return jnp.concatenate([pid0, pid_j[..., :kc]], axis=-1)  # [Vg,R,K]


def gather_patches(table, slots_groups, spec: SPGSpec):
    """Gather patch rows per view group.

    :param table: [V, Pby*Pbx, row] from pack_patch_table
    :return: list of G [Vg, R, K, row] aligned with spec.groups
    """
    v, n_p, row = table.shape
    flat = table.reshape(v * n_p, row)
    out = []
    for (views, k), slots in zip(spec.groups, slots_groups):
        vi = np.asarray(views)
        base = jnp.asarray(vi * n_p, jnp.int32)[:, None, None]
        idx = jnp.maximum(slots, 0) + base
        g = flat[idx.reshape(-1)].reshape(slots.shape + (row,))
        out.append(g)
    return out


def _sample_ingredients(ix, iy, spec: SPGSpec, dt):
    """Raw per-sample selection ingredients from UNclipped sampled-grid
    coords: patch id, in-patch offsets, bilinear fractions, per-corner
    zero-padding validity (exactly grid_sample.gather_bilinear_planes
    semantics)."""
    p = spec.p
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = (ix - x0).astype(dt)
    fy = (iy - y0).astype(dt)
    cbx = _cb(ix, spec.w)
    cby = _cb(iy, spec.h)
    pbx = cbx // p
    pby = cby // p
    pid = pby * spec.pbx + pbx
    lx = cbx - pbx * p  # [0, P-1]
    ly = cby - pby * p
    vld = lambda c0, n: ((c0 >= 0) & (c0 <= n - 1)).astype(dt)
    return dict(
        pid=pid, ly=ly, fy=fy, vy0=vld(y0, spec.h), vy1=vld(y0 + 1, spec.h),
        lx=lx, fx=fx, vx0=vld(x0, spec.w), vx1=vld(x0 + 1, spec.w),
    )


def _sample_weights(ix, iy, spec: SPGSpec, dt):
    """Per-sample selection ingredients composed into one-hot row/col weights.

    :return: (pid [Vg,R,S] int32, wy [Vg,R,S,P+1], wx [Vg,R,S,P+1])
    """
    p = spec.p
    ing = _sample_ingredients(ix, iy, spec, dt)

    def onehot2(l, f, v0, v1):
        return (jax.nn.one_hot(l, p + 1, dtype=dt) * ((1.0 - f) * v0)[..., None]
                + jax.nn.one_hot(l + 1, p + 1, dtype=dt) * (f * v1)[..., None])

    wy = onehot2(ing["ly"], ing["fy"], ing["vy0"], ing["vy1"])
    wx = onehot2(ing["lx"], ing["fx"], ing["vx0"], ing["vx1"])
    return ing["pid"], wy, wx


def select_samples(g_groups, slots_groups, gx, gy, spec: SPGSpec, c):
    """Reconstruct exact bilinear taps for every sample from gathered patches.

    :param g_groups: from gather_patches (table dtype = compute dtype)
    :param gx, gy: [V, N] normalized [-1, 1] coords (same convention as
        gather_bilinear_planes; N = R*S)
    :param c: channels of the sampled grid
    :return: [V, N, c] sampled values (table dtype)
    """
    v = gx.shape[0]
    r, k0 = slots_groups[0].shape[1], None
    s = gx.shape[1] // r
    dt = g_groups[0].dtype
    p = spec.p

    ix = (gx + 1.0) * 0.5 * (spec.w - 1)
    iy = (gy + 1.0) * 0.5 * (spec.h - 1)
    ix = ix.reshape(v, r, s)
    iy = iy.reshape(v, r, s)

    outs = []
    for (views, k), slots, g in zip(spec.groups, slots_groups, g_groups):
        vi = jnp.asarray(views)
        pid, wy, wx = _sample_weights(ix[vi], iy[vi], spec, dt)
        eq = (pid[..., None] == slots[:, :, None, :]).astype(dt)  # [Vg,R,S,K]
        w1 = (eq[..., :, None] * wy[..., None, :]).reshape(
            eq.shape[:3] + (k * (p + 1),)
        )
        gk = g.reshape(g.shape[0], r, k * (p + 1), (p + 1) * c)
        # HIGHEST: at DEFAULT precision the TPU MXU rounds both operands to
        # bf16, so the "exact" one-hot selection mangles every tap by ~1e-3
        # relative (the round-2 SPG first-loss anomaly, BENCH_NOTES.md) — the
        # fractional bilinear weights and f32 table values are not
        # bf16-representable. CPU einsum is full f32, which is why the
        # exactness tests never caught it.
        z = jnp.einsum("vrsk,vrkc->vrsc", w1, gk,
                       precision=jax.lax.Precision.HIGHEST)
        z = z.reshape(z.shape[:3] + (p + 1, c))
        outs.append(jnp.einsum("vrsp,vrspc->vrsc", wx, z,
                               precision=jax.lax.Precision.HIGHEST))

    # restack into original view order
    out = jnp.concatenate(outs, axis=0)
    order = np.concatenate([np.asarray(vs) for vs, _ in spec.groups])
    inv = np.argsort(order)
    return out[jnp.asarray(inv)].reshape(v, r * s, c)


def make_spec(groups, p, hw_sample, hw_full):
    h_s, w_s = hw_sample
    h_f, w_f = hw_full
    return SPGSpec(
        p=p, h=int(h_s), w=int(w_s), h_full=int(h_f), w_full=int(w_f),
        pby=_patch_grid(int(h_s), p), pbx=_patch_grid(int(w_s), p),
        groups=groups,
    )


def plan_attack_specs(target_cams, src_cams, depth_range, rgb_hw, feat_hw,
                      feat_ps=(4, 6, 8, 12, 16), rgb_ps=(8, 12, 16, 24, 32),
                      ray_stride=4, n_groups=3):
    """Convenience planner for the attack's per-ray gather:
    (spec_feat, spec_rgb) covering EVERY target camera the attack may sample
    rays from (view-specific: the one test view; universal: all train views).

    Picks the patch size minimizing the per-sample selection cost
    sum_groups |Vg| * K * (p+1)^2 — the one-hot contraction width times the
    row-weight width (select_samples). Unlike BSPG there is no coverage
    bound to satisfy: the per-ray walk enumerates exactly the patches the
    segment crosses.
    """
    target_cams = np.asarray(target_cams, np.float64).reshape(-1, 34)

    def pick(hw_sample, ps):
        best, best_cost = None, None
        for p in ps:
            groups = plan_groups(target_cams, src_cams, depth_range,
                                 hw_sample, p, ray_stride=ray_stride,
                                 n_groups=n_groups)
            cost = sum(len(v) * k * (p + 1) ** 2 for v, k in groups)
            if best_cost is None or cost < best_cost:
                best_cost = cost
                best = make_spec(
                    groups, p, hw_sample,
                    (int(target_cams[0][0]), int(target_cams[0][1])),
                )
        return best

    return pick(feat_hw, feat_ps), pick(rgb_hw, rgb_ps)
