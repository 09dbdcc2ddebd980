"""Bilinear image sampling at continuous pixel locations.

Matches ``torch.nn.functional.grid_sample(..., mode='bilinear',
padding_mode='zeros', align_corners=True)`` as used by the reference projector
(/root/reference/ibrnet/projection.py:119-124), implemented as XLA gathers so it
fuses into the surrounding jit region and differentiates cleanly w.r.t. the
image (the attack backpropagates through this into the source-view pixels).
"""
from __future__ import annotations

import jax.numpy as jnp


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
