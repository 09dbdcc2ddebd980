"""ResUNet feature extractor (Flax, NHWC).

Functional twin of the reference's ResNet34-encoder U-Net
(/root/reference/ibrnet/feature_network.py:154-268): 7x7/s2 reflect-padded stem,
three BasicBlock stages (3/4/6 blocks, stride-2 each, affine InstanceNorm), and
a two-stage bilinear(align_corners)+conv decoder with skip concats, ending in a
1x1 conv producing coarse+fine channel groups at 1/4 input resolution.

Conv feature maps stay NHWC end to end; under jit XLA lays the convs onto the
MXU. Wrap the apply in ``jax.checkpoint`` for the attack loop (the reference
needed activation checkpointing on GPU for the same reason,
/root/reference/gnt/model.py:89-105).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from nerfool_tpu.models.layers import (
    ConvReflect,
    InstanceNorm,
    upsample_bilinear_aligned,
)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = ConvReflect(self.planes, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        out = InstanceNorm(name="bn1")(out)
        out = nn.relu(out)
        out = ConvReflect(self.planes, 3, 1, dtype=self.dtype, name="conv2")(out)
        out = InstanceNorm(name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                padding="VALID", use_bias=False, dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = InstanceNorm(name="downsample_norm")(identity)
        return nn.relu(out + identity)


class UpConv(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = upsample_bilinear_aligned(x, 2)
        x = ConvReflect(self.features, 3, 1, use_bias=True, dtype=self.dtype,
                        name="conv")(x)
        x = InstanceNorm(name="bn")(x)
        return nn.elu(x)


class IConv(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = ConvReflect(self.features, 3, 1, use_bias=True, dtype=self.dtype,
                        name="conv")(x)
        x = InstanceNorm(name="bn")(x)
        return nn.elu(x)


def _skip_concat(up, enc):
    """Zero-pad ``enc`` spatially to ``up``'s size and concat [up, enc] on C.

    Matches the reference's skipconnect (feature_network.py:231-243) which pads
    the smaller map symmetrically before concatenation.
    """
    dy = up.shape[1] - enc.shape[1]
    dx = up.shape[2] - enc.shape[2]
    enc = jnp.pad(
        enc,
        ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)),
    )
    return jnp.concatenate([up, enc], axis=-1)


class ResUNet(nn.Module):
    coarse_out_ch: int = 32
    fine_out_ch: int = 32
    coarse_only: bool = False
    single_net: bool = False  # GNT variant: fine == coarse (gnt/feature_network.py:313-318)
    # computation dtype for the conv stack (params stay f32; InstanceNorm
    # statistics stay f32; outputs are cast back to f32 so downstream gather
    # tables — and the attack's backward scatter — keep full precision).
    # bf16 doubles MXU rate on the attack's per-iteration full-res fwd+bwd.
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        """:param x: [V, H, W, 3] source images
        :return: (coarse [V, H/4, W/4, Cc], fine [V, H/4, W/4, Cf] or None)
        """
        if self.single_net:
            # GNT variant: ONE head of coarse_out_ch channels shared by both
            # levels (gnt/feature_network.py:196-204)
            out_ch = self.coarse_out_ch
        else:
            fine_ch = 0 if self.coarse_only else self.fine_out_ch
            out_ch = self.coarse_out_ch + fine_ch

        dt = self.compute_dtype
        if dt is not None:
            x = x.astype(dt)
        x = ConvReflect(64, 7, 2, padding=3, dtype=dt, name="conv1")(x)
        x = InstanceNorm(name="bn1")(x)
        x = nn.relu(x)

        def stage(x, planes, blocks, name):
            x = BasicBlock(planes, stride=2, downsample=True, dtype=dt,
                           name=f"{name}_0")(x)
            for i in range(1, blocks):
                x = BasicBlock(planes, dtype=dt, name=f"{name}_{i}")(x)
            return x

        x1 = stage(x, 64, 3, "layer1")
        x2 = stage(x1, 128, 4, "layer2")
        x3 = stage(x2, 256, 6, "layer3")

        u = UpConv(128, dtype=dt, name="upconv3")(x3)
        u = _skip_concat(u, x2)
        u = IConv(128, dtype=dt, name="iconv3")(u)

        u = UpConv(64, dtype=dt, name="upconv2")(u)
        u = _skip_concat(u, x1)
        u = IConv(out_ch, dtype=dt, name="iconv2")(u)

        out = nn.Conv(out_ch, (1, 1), use_bias=True, dtype=dt, name="out_conv")(u)
        if dt is not None:
            out = out.astype(jnp.float32)

        if self.coarse_only:
            return out, None
        if self.single_net:
            return out, out
        return out[..., : self.coarse_out_ch], out[..., -self.fine_out_ch :]
