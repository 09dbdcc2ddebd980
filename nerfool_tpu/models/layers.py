"""Shared NN layers with exact PyTorch-op numerics, NHWC layout.

These reproduce the torch building blocks the reference nets rely on
(reflect-padded convs, affine InstanceNorm without running stats,
align_corners=True bilinear upsampling) so that ported `.pth` checkpoints are
numerically faithful, while keeping everything channels-last for the TPU.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvReflect(nn.Module):
    """2D conv with reflect padding, matching nn.Conv2d(padding_mode='reflect').

    ``dtype`` is the computation dtype (params stay float32; flax casts both
    operands for the conv) — bf16 here runs the MXU at double rate.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int | None = None  # defaults to (k-1)//2
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):  # x: [N, H, W, C]
        pad = self.padding if self.padding is not None else (self.kernel_size - 1) // 2
        if pad > 0:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True, track_running_stats=False), eps matches torch.

    Per-instance statistics are always accumulated in float32 — at bf16 a mean
    over H*W ~ 2e5 pixels loses the signal — and the normalized result is cast
    back to the input dtype.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # [N, H, W, C]
        # promote (never demote): bf16 -> f32 statistics, f32/f64 unchanged
        stat_dt = jnp.promote_types(x.dtype, jnp.float32)
        x32 = x.astype(stat_dt)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        y = (x32 - mean) / jnp.sqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (y * scale + bias).astype(x.dtype)


def upsample_bilinear_aligned(x, scale: int):
    """Bilinear upsample with align_corners=True (matches F.interpolate).

    :param x: [N, H, W, C]
    :return: [N, H*scale, W*scale, C]
    """
    n, h, w, c = x.shape
    oh, ow = h * scale, w * scale

    def axis_coords(out_len, in_len):
        # coordinate math at >= f32 (bf16 pixel fractions drift at image
        # sizes; f64 inputs keep f64); only the final lerp weight is cast to
        # the compute dtype
        coord_dt = jnp.promote_types(x.dtype, jnp.float32)
        if out_len == 1 or in_len == 1:
            return (
                jnp.zeros((out_len,), jnp.int32),
                jnp.zeros((out_len,), jnp.int32),
                jnp.zeros((out_len,), x.dtype),
            )
        f = jnp.arange(out_len, dtype=coord_dt) * ((in_len - 1) / (out_len - 1))
        i0 = jnp.floor(f).astype(jnp.int32)
        i0 = jnp.clip(i0, 0, in_len - 2)
        t = f - i0.astype(coord_dt)
        return i0, i0 + 1, t.astype(x.dtype)

    y0, y1, ty = axis_coords(oh, h)
    x0, x1, tx = axis_coords(ow, w)

    top = x[:, y0]  # [N, OH, W, C]
    bot = x[:, y1]
    rows = top * (1 - ty)[None, :, None, None] + bot * ty[None, :, None, None]
    left = rows[:, :, x0]
    right = rows[:, :, x1]
    return left * (1 - tx)[None, None, :, None] + right * tx[None, None, :, None]


class MLP(nn.Module):
    """Stack of Dense layers with an activation between (and optionally after).

    Mirrors the reference's nn.Sequential(Linear, act, Linear, act, ...) blocks;
    layer names are ``fc{i}`` so torch Sequential indices map mechanically.
    """

    features: Sequence[int]
    act: str = "elu"  # 'elu' | 'relu'
    final_act: str | None = None  # None | 'elu' | 'relu' | 'sigmoid'
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        import jax.nn as jnn

        acts = {"elu": jnn.elu, "relu": jnn.relu, "sigmoid": jnn.sigmoid, None: lambda v: v}
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=self.use_bias, name=f"fc{i}")(x)
            if i < len(self.features) - 1:
                x = acts[self.act](x)
        return acts[self.final_act](x)


class TorchLayerNorm(nn.Module):
    """LayerNorm with torch's eps placement (matches nn.LayerNorm(eps=...))."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return y * scale + bias
