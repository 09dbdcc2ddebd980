"""Bilinear image sampling at continuous pixel locations.

Matches ``torch.nn.functional.grid_sample(..., mode='bilinear',
padding_mode='zeros', align_corners=True)`` as used by the reference projector
(/root/reference/ibrnet/projection.py:119-124), implemented as XLA gathers so it
fuses into the surrounding jit region and differentiates cleanly w.r.t. the
image (the attack backpropagates through this into the source-view pixels).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def grid_sample_bilinear(image, grid):
    """Sample ``image`` at normalized locations ``grid``.

    :param image: [H, W, C] (channels-last: gathers pull whole C-lanes per point,
        the natural TPU layout)
    :param grid: [..., 2] normalized coords in [-1, 1], (x, y) order;
        align_corners=True convention: -1 -> pixel 0, +1 -> pixel (W-1 / H-1).
        Out-of-range locations contribute zeros per absent corner (zeros padding).
    :return: [..., C]
    """
    h, w, c = image.shape
    out_shape = grid.shape[:-1]
    gx = grid[..., 0].reshape(-1)
    gy = grid[..., 1].reshape(-1)

    ix = (gx + 1.0) * 0.5 * (w - 1)
    iy = (gy + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = ix - x0
    wx0 = 1.0 - wx1
    wy1 = iy - y0
    wy0 = 1.0 - wy1

    def corner(xf, yf, wgt):
        xi = xf.astype(jnp.int32)
        yi = yf.astype(jnp.int32)
        valid = (xf >= 0) & (xf <= w - 1) & (yf >= 0) & (yf <= h - 1)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        vals = image[yi, xi]  # [P, C]
        return vals * (wgt * valid.astype(image.dtype))[:, None]

    out = (
        corner(x0, y0, wx0 * wy0)
        + corner(x1, y0, wx1 * wy0)
        + corner(x0, y1, wx0 * wy1)
        + corner(x1, y1, wx1 * wy1)
    )
    return out.reshape(out_shape + (c,))


def grid_sample_bilinear_batched(images, grid):
    """Batched-over-views bilinear sampling as ONE flat row-gather.

    Semantically identical to vmapping :func:`grid_sample_bilinear` over the
    leading axis, but the (view, y, x) triple is folded into a single flat row
    index into [V*H*W, C] — XLA lowers 1-D row gathers onto the TPU at memory
    bandwidth, while batched 2-D advanced indexing lowers to a far slower
    multi-dimensional gather (~25x in practice on v5e).

    :param images: [V, H, W, C]
    :param grid: [V, ..., 2] normalized coords, align_corners=True, zeros padding
    :return: [V, ..., C]
    """
    images = jnp.asarray(images)
    v, h, w, c = images.shape
    out_shape = grid.shape[:-1]
    flat = images.reshape(v * h * w, c)

    gx = grid[..., 0].reshape(v, -1)
    gy = grid[..., 1].reshape(v, -1)
    ix = (gx + 1.0) * 0.5 * (w - 1)
    iy = (gy + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = ix - x0
    wx0 = 1.0 - wx1
    wy1 = iy - y0
    wy0 = 1.0 - wy1
    base = (jnp.arange(v, dtype=jnp.int32) * (h * w))[:, None]

    def corner(xf, yf, wgt):
        valid = (xf >= 0) & (xf <= w - 1) & (yf >= 0) & (yf <= h - 1)
        xi = jnp.clip(xf.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(yf.astype(jnp.int32), 0, h - 1)
        rows = flat[(base + yi * w + xi).reshape(-1)]  # [V*P, C]
        return rows * (wgt * valid.astype(images.dtype)).reshape(-1, 1)

    out = (
        corner(x0, y0, wx0 * wy0)
        + corner(x1, y0, wx1 * wy0)
        + corner(x0, y1, wx0 * wy1)
        + corner(x1, y1, wx1 * wy1)
    )
    return out.reshape((v,) + out_shape[1:] + (c,))


def pack_corner_table(images):
    """Pack each pixel's 2x2 bilinear footprint into one row.

    :param images: [V, H, W, C]
    :return: flat table [V*(H+1)*(W+1), 4C]; row (v, yb, xb) holds the
        zero-padded pixels (yb-1..yb, xb-1..xb) so ONE row gather yields all
        four corner values of a bilinear tap. Gather cost on TPU is per-row,
        not per-byte, so this quarters the sampler's HBM random reads (and its
        backward's scatters).
    """
    images = jnp.asarray(images)
    padded = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = jnp.concatenate(
        [padded[:, :-1, :-1], padded[:, :-1, 1:],
         padded[:, 1:, :-1], padded[:, 1:, 1:]], axis=-1
    )  # [V, H+1, W+1, 4C]
    v, hp, wp, c4 = packed.shape
    return packed.reshape(v * hp * wp, c4)


def gather_bilinear_planes(images, gx, gy, packed=None, shape=None):
    """Bilinear sampling from component-plane coordinates via ONE row gather.

    Same semantics as :func:`grid_sample_bilinear_batched` (align_corners=True,
    zeros padding) but takes normalized x/y as separate [V, P] planes and reads
    a corner-packed table (see :func:`pack_corner_table`; built on the fly when
    not supplied). ``images`` may be None when both ``packed`` and its source
    ``shape`` [V, H, W, C] are given. Returns [V, P, C].
    """
    if images is None:
        assert packed is not None and shape is not None
        v, h, w, c = shape
    else:
        images = jnp.asarray(images)
        v, h, w, c = images.shape
        if packed is None:
            packed = pack_corner_table(images)
    hp, wp = h + 1, w + 1

    ix = (gx + 1.0) * 0.5 * (w - 1)
    iy = (gy + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx1 = ix - x0
    wx0 = 1.0 - wx1
    wy1 = iy - y0
    wy0 = 1.0 - wy1

    # base index into the padded table: clip so all 4 footprint pixels exist
    # (out-of-range corners read padded zeros and are weight-masked anyway)
    xb = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1  # [0, w]
    yb = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
    base = (jnp.arange(v, dtype=jnp.int32) * (hp * wp))[:, None]
    rows = packed[(base + yb * wp + xb).reshape(-1)]  # [V*P, 4C]

    dt = packed.dtype  # packed table carries the compute dtype

    def wc(wgt, xf, yf):
        valid = (xf >= 0) & (xf <= w - 1) & (yf >= 0) & (yf <= h - 1)
        return (wgt * valid.astype(dt)).reshape(-1, 1)

    out = (
        rows[:, :c] * wc(wx0 * wy0, x0, y0)
        + rows[:, c:2 * c] * wc(wx1 * wy0, x0 + 1, y0)
        + rows[:, 2 * c:3 * c] * wc(wx0 * wy1, x0, y0 + 1)
        + rows[:, 3 * c:] * wc(wx1 * wy1, x0 + 1, y0 + 1)
    )
    return out.reshape(v, -1, c)


def patch_size_for(rgb_hw, feat_hw):
    """Side length P of the full-res RGB patch one feat-resolution row must
    carry so every bilinear tap whose FEAT base cell is that row finds its two
    RGB corner pixels inside the patch (see :func:`pack_superrow_table`).

    With align_corners scaling r = (W-1)/(Wf-1), a tap's rgb floor can sit up
    to ceil(r)+1 pixels right of the patch base, so P = ceil(r) + 2.
    """
    h, w = rgb_hw
    hf, wf = feat_hw
    ry = 1.0 if hf <= 1 else (h - 1) / (hf - 1)
    rx = 1.0 if wf <= 1 else (w - 1) / (wf - 1)
    return int(np.ceil(max(rx, ry))) + 2


def _patch_base(idx_feat, full_len, feat_len, p):
    """Integer-exact base pixel of the patch for feat cell index ``idx_feat``.

    Must be bit-identical between pack time and gather time, so it is pure
    int32 arithmetic: floor(idx * (full-1) / (feat-1)) clamped to keep the
    whole patch in range.
    """
    denom = max(feat_len - 1, 1)
    base = (idx_feat * (full_len - 1)) // denom
    return jnp.clip(base, 0, max(full_len - p, 0))


def pack_superrow_table(rgb, feat_corner_table, feat_shape, p=None):
    """Append each feat-resolution row's PxP full-res RGB patch to the
    corner-packed feature table: ONE gather then serves both the feature and
    the RGB taps of a sample point.

    Motivation (measured on v5e): a row gather costs ~the same regardless of
    row width up to ~512 channels (issue-rate bound, ~47M rows/s, not
    bandwidth), so two gathers per tap (feat row + rgb row) waste half the
    sampler's time. The patch block makes the rgb tap a pure in-register
    selection from the row.

    :param rgb: [V, H, W, 3] full-res source images (table dtype follows this)
    :param feat_corner_table: [V*(Hf+1)*(Wf+1), 4C] from pack_corner_table
    :param feat_shape: (V, Hf, Wf, C)
    :return: (table [V*(Hf+1)*(Wf+1), 4C + P*P*3], p)
    """
    rgb = jnp.asarray(rgb)
    v, h, w, _ = rgb.shape
    _, hf, wf, _ = feat_shape
    if p is None:
        p = patch_size_for((h, w), (hf, wf))
    hb, wb = hf + 1, wf + 1

    # patch base per feat-table row index (yb/xb = clip(floor(feat coord),-1,
    # n-1)+1 convention of pack_corner_table; max(.-1,0) maps the left padding
    # row to base 0 — its taps are out of view and weight-masked anyway)
    yb = jnp.maximum(jnp.arange(hb, dtype=jnp.int32) - 1, 0)
    xb = jnp.maximum(jnp.arange(wb, dtype=jnp.int32) - 1, 0)
    by = _patch_base(yb, h, hf, p)  # [Hb]
    bx = _patch_base(xb, w, wf, p)  # [Wb]

    rows_y = (by[:, None] + jnp.arange(p, dtype=jnp.int32)[None, :]).reshape(-1)
    cols_x = (bx[:, None] + jnp.arange(p, dtype=jnp.int32)[None, :]).reshape(-1)
    # both takes gather along an axis whose slices are CONTIGUOUS rows (a
    # column-axis take lowers to millions of tiny strided gather rows, which
    # is issue-rate bound and dominated the attack's per-iteration repack)
    t = jnp.take(rgb, rows_y, axis=1)        # [V, Hb*P, W, 3]
    t = jnp.moveaxis(t, 2, 1)                # [V, W, Hb*P, 3]
    t = jnp.take(t, cols_x, axis=1)          # [V, Wb*P, Hb*P, 3]
    t = jnp.moveaxis(t, 1, 2)                # [V, Hb*P, Wb*P, 3]
    t = t.reshape(v, hb, p, wb, p, 3).transpose(0, 1, 3, 2, 4, 5)
    patch = t.reshape(v * hb * wb, p * p * 3)
    return jnp.concatenate([feat_corner_table, patch], axis=-1), p


def gather_superrows(gx, gy, table, feat_shape, rgb_shape, p):
    """Fused bilinear sampling of features AND rgb from superrow tables.

    Semantics identical to two gather_bilinear_planes calls (align_corners,
    zeros padding) on the feature maps and the full-res rgb — but with a
    single row gather per tap. The rgb value is recovered from the row's PxP
    patch with per-tap one-hot row/col weights (differentiable w.r.t. the
    coordinates, so camera-pose attack gradients flow exactly as before).

    :param gx, gy: [V, N] normalized coords in [-1, 1]
    :param table: [V*(Hf+1)*(Wf+1), 4C + P*P*3]
    :return: (feat [V, N, C], rgb [V, N, 3])
    """
    v, hf, wf, c = feat_shape
    _, h, w, _ = rgb_shape
    hb, wb = hf + 1, wf + 1
    dt = table.dtype

    # ---- feat-grid coordinates -> row index + corner lerp (as before)
    ixf = (gx + 1.0) * 0.5 * (wf - 1)
    iyf = (gy + 1.0) * 0.5 * (hf - 1)
    x0f = jnp.floor(ixf)
    y0f = jnp.floor(iyf)
    wx1f = ixf - x0f
    wx0f = 1.0 - wx1f
    wy1f = iyf - y0f
    wy0f = 1.0 - wy1f
    xb = jnp.clip(x0f, -1, wf - 1).astype(jnp.int32) + 1
    yb = jnp.clip(y0f, -1, hf - 1).astype(jnp.int32) + 1
    base = (jnp.arange(v, dtype=jnp.int32) * (hb * wb))[:, None]
    rows = table[(base + yb * wb + xb).reshape(-1)]  # [V*N, 4C + P*P*3]

    def wcf(wgt, xf, yf):
        valid = (xf >= 0) & (xf <= wf - 1) & (yf >= 0) & (yf <= hf - 1)
        return (wgt * valid.astype(dt)).reshape(-1, 1)

    feat = (
        rows[:, :c] * wcf(wx0f * wy0f, x0f, y0f)
        + rows[:, c:2 * c] * wcf(wx1f * wy0f, x0f + 1, y0f)
        + rows[:, 2 * c:3 * c] * wcf(wx0f * wy1f, x0f, y0f + 1)
        + rows[:, 3 * c:4 * c] * wcf(wx1f * wy1f, x0f + 1, y0f + 1)
    )

    # ---- rgb from the patch block: one-hot row/col selection x bilinear wgts
    ix = (gx + 1.0) * 0.5 * (w - 1)
    iy = (gy + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = (ix - x0).astype(dt)
    fy = (iy - y0).astype(dt)
    bx = _patch_base(jnp.maximum(xb - 1, 0), w, wf, p)  # [V, N] int32
    by = _patch_base(jnp.maximum(yb - 1, 0), h, hf, p)
    dxc = x0.astype(jnp.int32) - bx  # in [-1, P-1] for in-view taps
    dyc = y0.astype(jnp.int32) - by

    def sel(dc, f, lo, hi, n):
        # one_hot is zero for out-of-range indices, which also implements the
        # per-corner zeros-padding validity
        v0 = ((lo >= 0) & (lo <= n - 1)).astype(dt)
        v1 = ((hi >= 0) & (hi <= n - 1)).astype(dt)
        return (jax.nn.one_hot(dc, p, dtype=dt) * ((1.0 - f) * v0)[..., None]
                + jax.nn.one_hot(dc + 1, p, dtype=dt) * (f * v1)[..., None])

    wy_sel = sel(dyc, fy, y0, y0 + 1, h).reshape(-1, p)  # [V*N, P]
    wx_sel = sel(dxc, fx, x0, x0 + 1, w).reshape(-1, p)
    patch = rows[:, 4 * c:].reshape(-1, p, p, 3)
    # HIGHEST: DEFAULT MXU precision rounds operands to bf16 (see
    # ops/spg.py select_samples)
    rgb = jnp.einsum("np,nq,npqc->nc", wy_sel, wx_sel, patch,
                     precision=jax.lax.Precision.HIGHEST)
    n = gx.shape[-1]
    return feat.reshape(v, n, c), rgb.reshape(v, n, 3)
