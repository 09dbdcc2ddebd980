"""Visualization utilities: colormapped depth/error maps with colorbars.

Equivalent of the reference's colorize helpers
(/root/reference/utils.py:71-181), matplotlib-based, numpy in/out.
"""
from __future__ import annotations

import numpy as np

TINY = 1e-6


def to8b(x):
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def get_vertical_colorbar(h, vmin, vmax, cmap_name="jet", label=None, cbar_precision=2):
    import matplotlib as mpl
    import matplotlib.cm as cm
    import cv2
    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure

    fig = Figure(figsize=(2, 8), dpi=100)
    fig.subplots_adjust(right=1.5)
    canvas = FigureCanvasAgg(fig)
    ax = fig.add_subplot(111)
    cmap = mpl.colormaps[cmap_name]
    norm = mpl.colors.Normalize(vmin=vmin, vmax=vmax)
    tick_loc = np.linspace(vmin, vmax, 6)
    cb = mpl.colorbar.ColorbarBase(
        ax, cmap=cmap, norm=norm, ticks=tick_loc, orientation="vertical"
    )
    labels = [str(np.round(x, cbar_precision)) for x in tick_loc]
    if cbar_precision == 0:
        labels = [x[:-2] for x in labels]
    cb.set_ticklabels(labels)
    cb.ax.tick_params(labelsize=18, rotation=0)
    if label is not None:
        cb.set_label(label)
    fig.tight_layout()
    canvas.draw()
    s, (width, height) = canvas.print_to_buffer()
    im = np.frombuffer(s, np.uint8).reshape((height, width, 4))
    im = im[:, :, :3].astype(np.float32) / 255.0
    if h != im.shape[0]:
        w = int(im.shape[1] / im.shape[0] * h)
        im = cv2.resize(im, (w, h), interpolation=cv2.INTER_AREA)
    return im


def colorize_np(x, cmap_name="jet", mask=None, range=None, append_cbar=False,
                cbar_in_image=False, cbar_precision=2):
    """Grayscale [H, W] -> colorized [H, W, 3] float in [0,1]."""
    import matplotlib as mpl

    x = np.asarray(x, dtype=np.float64).copy()
    if range is not None:
        vmin, vmax = range
    elif mask is not None:
        nz = x[mask][np.nonzero(x[mask])]
        vmin = np.min(nz) if nz.size else 0.0
        vmax = np.max(x[mask]) if x[mask].size else 1.0
        x[np.logical_not(mask)] = vmin
    else:
        vmin, vmax = np.percentile(x, (1, 100))
        vmax += TINY
    x = np.clip(x, vmin, vmax)
    x = (x - vmin) / (vmax - vmin + TINY)
    cmap = mpl.colormaps[cmap_name]
    out = cmap(x)[:, :, :3]
    if mask is not None:
        m = np.float32(mask[:, :, None])
        out = out * m + np.ones_like(out) * (1.0 - m)
    if append_cbar:
        cbar = get_vertical_colorbar(x.shape[0], vmin, vmax, cmap_name,
                                     cbar_precision=cbar_precision)
        if cbar_in_image:
            out[:, -cbar.shape[1]:, :] = cbar
        else:
            out = np.concatenate(
                (out, np.zeros_like(out[:, :5, :]), cbar), axis=1
            )
    return out
