"""GNT ray-transformer aggregator (Flax).

Functional twin of the reference transformer network
(/root/reference/gnt/transformer_network.py:205-309): a stack of alternating
view transformers (subtraction attention over source views conditioned on
ray-direction differences) and ray transformers (multi-head qk self-attention
along the sample axis), with NeRF-style positional/view encodings injected every
other block and the final ray-attention map optionally returned as per-sample
weights ("learned density").

Dropout is omitted: the attack/eval path always runs the reference networks in
eval() mode, where dropout is the identity.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfool_tpu.models.layers import TorchLayerNorm


def nerf_embed(x, num_freqs: int = 10, max_freq_log2: int = 9):
    """NeRF sin/cos embedding, include_input, log-sampled (Embedder:6-37).

    Computed entirely in ``x.dtype`` (the frequency bands are cast to it):
    the reference multiplies by 0-dim frequency tensors, which promote
    WEAKLY in torch, so its embeddings carry the input dtype end to end.

    :param x: [..., D]
    :return: [..., D * (1 + 2*num_freqs)]  (freq-major, sin before cos)
    """
    outs = [x]
    freqs = (2.0 ** jnp.linspace(0.0, float(max_freq_log2), num_freqs)
             ).astype(x.dtype)
    for f in freqs:
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


class FeedForward(nn.Module):
    hid_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hid_dim, name="fc1")(x))
        return nn.Dense(self.out_dim, name="fc2")(x)


class _Kernel(nn.Module):
    """Declares an nn.Dense-shaped param subtree without applying it — the
    fused-matmul call sites below combine several projections into one MXU
    pass while keeping the param tree (and the .pth importer) identical."""

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


class ViewAttention(nn.Module):
    """Subtraction-based attention over the source-view axis (Attention2D:55-89).

    MXU note: k_fc and v_fc chain without a nonlinearity, so
    ``v = (k@Wk)@Wv = k@(Wk@Wv)`` — one [D -> 2D] matmul over the big
    [V,R,S,D] operand produces both kp and v (full 128-lane output tile,
    one HBM pass over k instead of two). Mathematically exact; f32/bf16
    reassociation error only.
    """

    dim: int

    @nn.compact
    def __call__(self, q, k, pos, mask=None):
        # views-first: q [R, S, D]; k [V, R, S, D]; pos [V, R, S, 4]; mask [V, R, S, 1]
        qp = nn.Dense(self.dim, use_bias=False, name="q_fc")(q)
        wk, _ = _Kernel(k.shape[-1], self.dim, use_bias=False, name="k_fc")()
        wv, _ = _Kernel(self.dim, self.dim, use_bias=False, name="v_fc")()
        wkv = jnp.concatenate([wk, wk @ wv], axis=-1).astype(k.dtype)
        kv = k @ wkv
        kp, v = kv[..., : self.dim], kv[..., self.dim :]
        pos = nn.Dense(self.dim // 8, name="pos_fc0")(pos)
        pos = nn.Dense(self.dim, name="pos_fc1")(nn.relu(pos))
        attn = kp - qp[None] + pos
        attn = nn.Dense(self.dim // 8, name="attn_fc0")(attn)
        attn = nn.Dense(self.dim, name="attn_fc1")(nn.relu(attn))
        if mask is not None:
            attn = jnp.where(mask == 0, -1e9, attn)
        attn = jax.nn.softmax(attn, axis=0)  # over views
        x = jnp.sum((v + pos) * attn, axis=0)  # [R, S, D]
        return nn.Dense(self.dim, name="out_fc")(x)


class ViewTransformer(nn.Module):
    """Pre-LN view-transformer block (Transformer2D:93-113)."""

    dim: int

    @nn.compact
    def __call__(self, q, k, pos, mask=None):
        residue = q
        x = TorchLayerNorm(name="attn_norm")(q)
        x = ViewAttention(self.dim, name="attn")(x, k, pos, mask)
        x = x + residue
        residue = x
        y = TorchLayerNorm(name="ff_norm")(x)
        y = FeedForward(self.dim * 4, self.dim, name="ff")(y)
        return y + residue


class RayAttention(nn.Module):
    """Multi-head qk self-attention along the sample axis (Attention:121-171)."""

    dim: int
    n_heads: int = 4

    @nn.compact
    def __call__(self, x, ret_attn=False):
        # q/k/v share the input: one [D -> 3D] matmul (a 192-lane output
        # tile beats three 64-lane-padded passes on the MXU)
        r, s, _ = x.shape
        hd = self.dim // self.n_heads
        wq, _ = _Kernel(x.shape[-1], self.dim, use_bias=False, name="q_fc")()
        wk, _ = _Kernel(x.shape[-1], self.dim, use_bias=False, name="k_fc")()
        wv, _ = _Kernel(x.shape[-1], self.dim, use_bias=False, name="v_fc")()
        qkv = x @ jnp.concatenate([wq, wk, wv], axis=-1).astype(x.dtype)
        q, k, v = (qkv[..., : self.dim], qkv[..., self.dim : 2 * self.dim],
                   qkv[..., 2 * self.dim :])
        q = q.reshape(r, s, self.n_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(r, s, self.n_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(r, s, self.n_heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("rhqd,rhkd->rhqk", q, k) / jnp.sqrt(float(hd))
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("rhqk,rhkd->rhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(r, s, self.dim)
        out = nn.Dense(self.dim, name="out_fc")(out)
        if ret_attn:
            return out, attn
        return out


class RayTransformer(nn.Module):
    """Pre-LN ray-transformer block (Transformer:175-202)."""

    dim: int
    n_heads: int = 4

    @nn.compact
    def __call__(self, x, ret_attn=False):
        residue = x
        y = TorchLayerNorm(name="attn_norm")(x)
        y = RayAttention(self.dim, self.n_heads, name="attn")(y, ret_attn=ret_attn)
        if ret_attn:
            y, attn = y
        x = y + residue
        residue = x
        y = TorchLayerNorm(name="ff_norm")(x)
        y = FeedForward(self.dim * 4, self.dim, name="ff")(y)
        x = y + residue
        if ret_attn:
            # mean over heads, first query token's attention row
            return x, jnp.mean(attn, axis=1)[:, 0]
        return x


class GNTAggregator(nn.Module):
    in_feat_ch: int = 32
    netwidth: int = 64
    trans_depth: int = 8
    posenc_freqs: int = 10
    ret_alpha: bool = True

    @nn.compact
    def __call__(self, rgb_feat, ray_diff, mask, pts, ray_d):
        """
        :param rgb_feat: [V, R, S, 3 + in_feat_ch] (views-first, gather-native)
        :param ray_diff: [V, R, S, 4]
        :param mask: [V, R, S, 1]
        :param pts: [R, S, 3] sample points (world)
        :param ray_d: [R, 3] ray directions
        :return: [R, 3] rgb, or [R, 3 + S] (rgb ++ per-sample weights) if ret_alpha
        """
        viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
        # the reference HARD-CASTS pts/viewdirs to float32 before the
        # positional encodings even under double precision
        # (transformer_network.py:273-278 ``.float()``); the f32-precision
        # embeddings are then promoted back at the q-concat injection below.
        # Replicated for trajectory-level f64 parity; a no-op in f32 runs.
        emb_dt = jnp.float32 if jnp.dtype(pts.dtype) == jnp.float64 else pts.dtype
        viewdirs = nerf_embed(viewdirs.astype(emb_dt), self.posenc_freqs)  # [R, 63]
        input_pts = nerf_embed(pts.astype(emb_dt), self.posenc_freqs)  # [R, S, 63]
        input_pts = input_pts.astype(pts.dtype)
        viewdirs = viewdirs.astype(pts.dtype)
        input_views = jnp.broadcast_to(viewdirs[:, None, :], input_pts.shape[:2] + (viewdirs.shape[-1],))

        x = nn.Dense(self.netwidth, name="rgbfeat_fc0")(rgb_feat)
        x = nn.Dense(self.netwidth, name="rgbfeat_fc1")(nn.relu(x))
        q = jnp.max(x, axis=0)  # [R, S, D] max-pool over views

        attn_out = None
        for i in range(self.trans_depth):
            q = ViewTransformer(self.netwidth, name=f"view_trans_{i}")(q, x, ray_diff, mask)
            if i % 2 == 0:
                q = jnp.concatenate([q, input_pts, input_views], axis=-1)
                q = nn.Dense(self.netwidth, name=f"q_fc_{i}_0")(q)
                q = nn.Dense(self.netwidth, name=f"q_fc_{i}_1")(nn.relu(q))
            q = RayTransformer(self.netwidth, name=f"ray_trans_{i}")(q, ret_attn=self.ret_alpha)
            if self.ret_alpha:
                q, attn_out = q

        # the reference's FINAL norm is a default-eps nn.LayerNorm (1e-5),
        # unlike the in-block norms' explicit eps=1e-6
        # (transformer_network.py:250 vs :97-98,180-181)
        h = TorchLayerNorm(eps=1e-5, name="norm")(q)
        rgb = nn.Dense(3, name="rgb_fc")(jnp.mean(h, axis=1))
        if self.ret_alpha:
            return jnp.concatenate([rgb, attn_out], axis=1)
        return rgb
