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


class DenseParams(nn.Module):
    """Declares an nn.Dense-shaped param subtree without applying it — fused /
    block-diagonal call sites combine projections while keeping the param tree
    (and the .pth importer) identical to a plain Dense."""

    din: int
    dout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (self.din, self.dout))
        bias = (self.param("bias", nn.initializers.zeros, (self.dout,))
                if self.use_bias else None)
        return kern, bias


def blockdiag2(w):
    """[din, dout] -> [2*din, 2*dout] block-diagonal duplicate of w."""
    din, dout = w.shape
    z = jnp.zeros((2 * din, 2 * dout), w.dtype)
    return z.at[:din, :dout].set(w).at[din:, dout:].set(w)


def fold2(x):
    """Fold adjacent sample pairs into the channel axis: [..., S, C] -> [..., S/2, 2C].

    On TPU a 64-or-less-channel minor dim pads to 128 lanes; folding fills the
    lanes and halves the rows of every pointwise op and matmul. Exact for any
    computation that is pointwise over (sample, channel) or reduces over
    leading axes only.
    """
    return x.reshape(x.shape[:-2] + (x.shape[-2] // 2, 2 * x.shape[-1]))


def unfold2(x, channels: int):
    """Inverse of :func:`fold2`: [..., S/2, 2C] -> [..., S, C]."""
    return x.reshape(x.shape[:-2] + (2 * x.shape[-2], channels))


def pack_rays2(x):
    """Pack adjacent RAY pairs into the channel axis:
    [..., R, S, C] -> [..., R/2, S, 2C].

    One layout transpose of the operand (the (2, S) swap), paid ONCE at
    aggregation entry — unlike :func:`fold2` over samples, rays stay
    independent through the whole GNT aggregation (the ray transformer
    attends along S within a ray), so there is no per-block unfold.
    """
    sh = x.shape
    x = x.reshape(sh[:-3] + (sh[-3] // 2, 2) + sh[-2:])
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(sh[:-3] + (sh[-3] // 2, sh[-2], 2 * sh[-1]))


def unpack_rays2(x, channels: int):
    """Inverse of :func:`pack_rays2`: [..., R/2, S, 2C] -> [..., R, S, C]."""
    sh = x.shape
    x = x.reshape(sh[:-1] + (2, channels))
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(sh[:-3] + (2 * sh[-3],) + sh[-2:-1] + (channels,))


def blockdiag_segments(w, segs):
    """Packed weight for a Dense over a ray-packed CONCAT input.

    The packed input concatenates per-tensor packed segments
    ``[aA|aB | bA|bB | ...]`` (segment k of length segs[k] per ray); the
    equivalent packed weight scatters w's row-segments so ray A's channels
    feed output columns [:dout] and ray B's feed [dout:]:

    :param w: [sum(segs), dout]
    :param segs: per-tensor channel counts in concat order
    :return: [2*sum(segs), 2*dout]
    """
    din, dout = w.shape
    out = jnp.zeros((2 * din, 2 * dout), w.dtype)
    off = 0
    for s in segs:
        seg = w[off:off + s]
        out = out.at[2 * off:2 * off + s, :dout].set(seg)
        out = out.at[2 * off + s:2 * off + 2 * s, dout:].set(seg)
        off += s
    return out


def fold_cat(args):
    """Channel-concat of sample-folded tensors, preserving the fold layout.

    Each arg is folded [..., S/2, 2*Ci] (per-sample channel blocks
    [s0-block, s1-block]); a plain concat would interleave blocks of
    different tensors. Reshape each to [..., S/2, 2, Ci], concat on the
    true channel axis, and flatten back.
    """
    parts = [a.reshape(a.shape[:-1] + (2, a.shape[-1] // 2)) for a in args]
    y = jnp.concatenate(parts, axis=-1)
    return y.reshape(y.shape[:-2] + (2 * y.shape[-1],))


class MLP(nn.Module):
    """Stack of Dense layers with an activation between (and optionally after).

    Mirrors the reference's nn.Sequential(Linear, act, Linear, act, ...) blocks;
    layer names are ``fc{i}`` so torch Sequential indices map mechanically.

    ``fold=2`` applies the stack to sample-folded inputs ([..., 2*din]) with
    block-diagonal weights — numerically identical per segment, half the rows.
    """

    features: Sequence[int]
    act: str = "elu"  # 'elu' | 'relu'
    final_act: str | None = None  # None | 'elu' | 'relu' | 'sigmoid'
    use_bias: bool = True
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        import jax.nn as jnn

        acts = {"elu": jnn.elu, "relu": jnn.relu, "sigmoid": jnn.sigmoid, None: lambda v: v}
        if self.fold == 2:
            din = x.shape[-1] // 2
            dt = x.dtype
            for i, f in enumerate(self.features):
                w, b = DenseParams(din, f, use_bias=self.use_bias,
                                   name=f"fc{i}")()
                x = x @ blockdiag2(w).astype(dt)
                if b is not None:
                    x = x + jnp.concatenate([b, b]).astype(dt)
                if i < len(self.features) - 1:
                    x = acts[self.act](x)
                din = f
            return acts[self.final_act](x)
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
