"""PSNR and SSIM matching the reference's two measurement protocols.

The IBRNet results path measures with TensorFlow ops "to match the NeRF paper
setup" (/root/reference/eval/ibrnet/eval_adv.py:573-581): ``psnr`` and ``ssim``
here replicate tf.image.psnr / tf.image.ssim (11x11 Gaussian, sigma=1.5,
k1=0.01, k2=0.03, VALID padding). The GNT path uses a windowed torch SSIM with
SAME padding (/root/reference/eval/gnt/utils.py:198-284): ``ssim_windowed``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TINY = 1e-6


def mse2psnr(mse):
    return -10.0 * jnp.log(mse + TINY) / jnp.log(10.0)


def img2psnr(pred, gt, mask=None):
    if mask is None:
        mse = jnp.mean((pred - gt) ** 2)
    else:
        mse = jnp.sum((pred - gt) ** 2 * mask[..., None]) / (
            jnp.sum(mask) * pred.shape[-1] + TINY
        )
    return mse2psnr(mse)


def psnr(pred, gt, max_val=1.0):
    """tf.image.psnr: 10 log10(max^2 / mse) over the full image."""
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / mse)


def _gaussian_kernel(size=11, sigma=1.5, dtype=jnp.float32):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), dtype=dtype)


def _filter2d(img, kernel, padding):
    """Depthwise 2D correlation. img [H,W,C], kernel [k,k]."""
    k = kernel.shape[0]
    x = img.transpose(2, 0, 1)[:, None]  # [C,1,H,W]
    w = kernel[None, None]  # [1,1,k,k]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[:, 0].transpose(1, 2, 0)


def _ssim_core(pred, gt, max_val, kernel, padding, return_map=False):
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x = _filter2d(pred, kernel, padding)
    mu_y = _filter2d(gt, kernel, padding)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _filter2d(pred * pred, kernel, padding) - mu_xx
    sigma_y = _filter2d(gt * gt, kernel, padding) - mu_yy
    sigma_xy = _filter2d(pred * gt, kernel, padding) - mu_xy
    lum = (2 * mu_xy + c1) / (mu_xx + mu_yy + c1)
    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    smap = lum * cs
    return smap if return_map else jnp.mean(smap)


def ssim(pred, gt, max_val=1.0):
    """tf.image.ssim protocol: 11x11 Gaussian(1.5), VALID padding.

    :param pred, gt: [H, W, C]
    """
    kernel = _gaussian_kernel(11, 1.5, pred.dtype)
    return _ssim_core(pred, gt, max_val, kernel, "VALID")


def ssim_windowed(pred, gt, window_size=11, sigma=1.5):
    """GNT-path SSIM: Gaussian window, SAME padding, mean over map
    (matches /root/reference/eval/gnt/utils.py:264-284 with size_average)."""
    kernel = _gaussian_kernel(window_size, sigma, pred.dtype)
    return _ssim_core(pred, gt, 1.0, kernel, "SAME")
