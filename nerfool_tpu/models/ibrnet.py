"""IBRNet aggregator (Flax).

Per-sample-point multi-view aggregation matching the reference MLP network
(/root/reference/ibrnet/mlp_network.py:152-274): ray-direction MLP added to the
gathered features, anti-alias pooling weights, weighted mean/variance pooling,
visibility MLPs, a sinusoid-positional-encoded 4-head self-attention along the
ray (sample axis), and a per-view softmax color blend. All einsum/matmul shapes
are [rays*samples, views, feat]-like so XLA batches them onto the MXU.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerfool_tpu.models.layers import MLP, TorchLayerNorm, fold2, fold_cat, unfold2


def sinusoid_pos_encoding(n_samples: int, d_hid: int, dtype=jnp.float32):
    """Sinusoid table over the sample axis (mlp_network.py:210-220)."""
    position = np.arange(n_samples)[:, None]
    hid = np.arange(d_hid)[None, :]
    angle = position / np.power(10000.0, 2 * (hid // 2) / d_hid)
    table = np.zeros((n_samples, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    # the reference hard-casts the numpy table to float32 regardless of the
    # model dtype (mlp_network.py:219 ``.float()``) — round through f32 so
    # the f64 parity path sees the same values
    return jnp.asarray(table.astype(np.float32), dtype=dtype)


def fused_mean_variance(x, weight, axis=0):
    """Weighted mean and (biased, around-weighted-mean) variance over views.

    :param x: [V, R, S, F]; weight: [V, R, S, 1] summing to ~1 over V (axis 0)
    :return: (mean [1, R, S, F], var [1, R, S, F])
    """
    mean = jnp.sum(x * weight, axis=axis, keepdims=True)
    var = jnp.sum(weight * (x - mean) ** 2, axis=axis, keepdims=True)
    return mean, var


class MultiHeadAttention(nn.Module):
    """Post-LN multi-head self-attention, torch-MHA-free (mlp_network.py:69-119)."""

    n_head: int
    d_model: int
    d_k: int
    d_v: int

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        b, lq = q.shape[0], q.shape[1]
        residual = q
        qh = nn.Dense(self.n_head * self.d_k, use_bias=False, name="w_qs")(q)
        kh = nn.Dense(self.n_head * self.d_k, use_bias=False, name="w_ks")(k)
        vh = nn.Dense(self.n_head * self.d_v, use_bias=False, name="w_vs")(v)
        qh = qh.reshape(b, lq, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        kh = kh.reshape(b, -1, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        vh = vh.reshape(b, -1, self.n_head, self.d_v).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", qh / (self.d_k ** 0.5), kh)
        if mask is not None:
            # mask [B, Lq, 1] -> [B, 1, Lq, 1]: zero rows mask out entire queries
            attn = jnp.where(mask[:, None] == 0, -1e9, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, -1)
        out = nn.Dense(self.d_model, use_bias=False, name="fc")(out)
        out = out + residual
        return TorchLayerNorm(name="layer_norm")(out), attn


class IBRNetAggregator(nn.Module):
    in_feat_ch: int = 32
    anti_alias_pooling: bool = True
    # 2 = fold adjacent sample pairs into the channel axis for the view-side
    # tensors: block-diagonal weights halve matmul rows and fill the
    # lane-padded sub-128-channel tiles. Exact (every view-side op here is
    # pointwise over (s, c) or reduces over V); requires S even, silently off
    # otherwise. The pooled geometry path (posenc + ray attention) unfolds.
    sample_fold: int = 1

    @nn.compact
    def __call__(self, rgb_feat, ray_diff, mask):
        """
        :param rgb_feat: [V, R, S, 3 + in_feat_ch] gathered colors + features
            (views-FIRST: all pooling/softmax reductions run over the major
            axis, matching the projector's gather-native layout — no transposes)
        :param ray_diff: [V, R, S, 4] direction difference (3) + dot (1)
        :param mask: [V, R, S, 1] float validity
        :return: raw [R, S, 4] (rgb, sigma)
        """
        if self.sample_fold == 2 and rgb_feat.shape[2] % 2 == 0:
            return self._folded(rgb_feat, ray_diff, mask)
        num_views = rgb_feat.shape[0]
        direction_feat = MLP([16, self.in_feat_ch + 3], act="elu", final_act="elu",
                             name="ray_dir_fc")(ray_diff)
        rgb_in = rgb_feat[..., :3]
        rgb_feat = rgb_feat + direction_feat

        if self.anti_alias_pooling:
            s = self.param("s", nn.initializers.constant(0.2), ())
            dot_prod = ray_diff[..., 3:4]
            exp_dot = jnp.exp(jnp.abs(s) * (dot_prod - 1))
            weight = (exp_dot - jnp.min(exp_dot, axis=0, keepdims=True)) * mask
            weight = weight / (jnp.sum(weight, axis=0, keepdims=True) + 1e-8)
        else:
            weight = mask / (jnp.sum(mask, axis=0, keepdims=True) + 1e-8)

        mean, var = fused_mean_variance(rgb_feat, weight)
        globalfeat = jnp.concatenate([mean, var], axis=-1)  # [1,R,S,2F]
        x = jnp.concatenate(
            [jnp.broadcast_to(globalfeat, (num_views,) + globalfeat.shape[1:]),
             rgb_feat], axis=-1)
        x = MLP([64, 32], act="elu", final_act="elu", name="base_fc")(x)

        x_vis = MLP([32, 33], act="elu", final_act="elu", name="vis_fc")(x * weight)
        x_res, vis = x_vis[..., :-1], x_vis[..., -1:]
        vis = jax.nn.sigmoid(vis) * mask
        x = x + x_res
        vis = MLP([32, 1], act="elu", final_act="sigmoid", name="vis_fc2")(x * vis) * mask
        weight = vis / (jnp.sum(vis, axis=0, keepdims=True) + 1e-8)

        mean, var = fused_mean_variance(x, weight)
        globalfeat = jnp.concatenate(
            [mean.squeeze(0), var.squeeze(0), jnp.mean(weight, axis=0)], axis=-1
        )  # [R, S, 32*2+1]
        globalfeat = MLP([64, 16], act="elu", final_act="elu", name="geometry_fc")(globalfeat)
        num_valid_obs = jnp.sum(mask, axis=0)  # [R, S, 1]
        globalfeat = globalfeat + sinusoid_pos_encoding(
            globalfeat.shape[1], 16, dtype=globalfeat.dtype
        )[None]
        attn_mask = (num_valid_obs > 1).astype(globalfeat.dtype)
        globalfeat, _ = MultiHeadAttention(4, 16, 4, 4, name="ray_attention")(
            globalfeat, globalfeat, globalfeat, mask=attn_mask
        )
        sigma = MLP([16, 1], act="elu", final_act="relu", name="out_geometry_fc")(globalfeat)
        sigma_out = jnp.where(num_valid_obs < 1, 0.0, sigma)  # [R, S, 1]

        x = jnp.concatenate([x, vis, ray_diff], axis=-1)
        x = MLP([16, 8, 1], act="elu", name="rgb_fc")(x)
        x = jnp.where(mask == 0, -1e9, x)
        blending_weights = jax.nn.softmax(x, axis=0)
        rgb_out = jnp.sum(rgb_in * blending_weights, axis=0)  # [R, S, 3]
        return jnp.concatenate([rgb_out, sigma_out], axis=-1)

    def _folded(self, rgb_feat, ray_diff, mask):
        """sample_fold=2 path: all view-side [V,R,S,*] tensors run with
        adjacent sample pairs packed into the channel axis ([V,R,S/2,2C],
        block-diagonal weights). Every view-side op is pointwise over
        (sample, channel) or reduces over V, so this is numerically the same
        computation with half the rows and filled 128-lane tiles. Only the
        pooled geometry path (posenc + ray attention over the sample axis)
        unfolds."""
        num_views, n_rays, n_samples, n_ch = rgb_feat.shape
        rf = fold2(rgb_feat)      # [V,R,S/2,2C]
        rd = fold2(ray_diff)      # [V,R,S/2,8]
        mk = fold2(mask)          # [V,R,S/2,2]
        direction_feat = MLP([16, self.in_feat_ch + 3], act="elu", final_act="elu",
                             name="ray_dir_fc", fold=2)(rd)
        x = rf + direction_feat

        if self.anti_alias_pooling:
            s = self.param("s", nn.initializers.constant(0.2), ())
            dot_prod = rd.reshape(rd.shape[:-1] + (2, 4))[..., 3]  # [V,R,S/2,2]
            exp_dot = jnp.exp(jnp.abs(s) * (dot_prod - 1))
            weight = (exp_dot - jnp.min(exp_dot, axis=0, keepdims=True)) * mk
            weight = weight / (jnp.sum(weight, axis=0, keepdims=True) + 1e-8)
        else:
            weight = mk / (jnp.sum(mk, axis=0, keepdims=True) + 1e-8)
        # weight is folded with c=1 ([V,R,S/2,2]); jnp.repeat on the channel
        # axis is the folded equivalent of the [V,R,S,1] broadcast
        w_c = jnp.repeat(weight, n_ch, axis=-1)
        mean = jnp.sum(x * w_c, axis=0, keepdims=True)
        var = jnp.sum(w_c * (x - mean) ** 2, axis=0, keepdims=True)
        globalfeat = fold_cat([mean, var])  # [1,R,S/2,4C]
        x = fold_cat(
            [jnp.broadcast_to(globalfeat, (num_views,) + globalfeat.shape[1:]), x])
        x = MLP([64, 32], act="elu", final_act="elu", name="base_fc", fold=2)(x)

        x_vis = MLP([32, 33], act="elu", final_act="elu", name="vis_fc",
                    fold=2)(x * jnp.repeat(weight, 32, axis=-1))
        xv = x_vis.reshape(x_vis.shape[:-1] + (2, 33))
        x_res = xv[..., :32].reshape(x.shape)
        vis = jax.nn.sigmoid(xv[..., 32]) * mk  # [V,R,S/2,2]
        x = x + x_res
        vis = MLP([32, 1], act="elu", final_act="sigmoid", name="vis_fc2",
                  fold=2)(x * jnp.repeat(vis, 32, axis=-1)) * mk
        weight = vis / (jnp.sum(vis, axis=0, keepdims=True) + 1e-8)

        w32 = jnp.repeat(weight, 32, axis=-1)
        mean = jnp.sum(x * w32, axis=0, keepdims=True)
        var = jnp.sum(w32 * (x - mean) ** 2, axis=0, keepdims=True)
        globalfeat = jnp.concatenate(
            [unfold2(mean.squeeze(0), 32), unfold2(var.squeeze(0), 32),
             unfold2(jnp.mean(weight, axis=0), 1)], axis=-1)  # [R,S,65]
        globalfeat = MLP([64, 16], act="elu", final_act="elu", name="geometry_fc")(globalfeat)
        num_valid_obs = unfold2(jnp.sum(mk, axis=0), 1)  # [R,S,1]
        globalfeat = globalfeat + sinusoid_pos_encoding(
            globalfeat.shape[1], 16, dtype=globalfeat.dtype
        )[None]
        attn_mask = (num_valid_obs > 1).astype(globalfeat.dtype)
        globalfeat, _ = MultiHeadAttention(4, 16, 4, 4, name="ray_attention")(
            globalfeat, globalfeat, globalfeat, mask=attn_mask
        )
        sigma = MLP([16, 1], act="elu", final_act="relu", name="out_geometry_fc")(globalfeat)
        sigma_out = jnp.where(num_valid_obs < 1, 0.0, sigma)  # [R, S, 1]

        x = fold_cat([x, vis, rd])
        x = MLP([16, 8, 1], act="elu", name="rgb_fc", fold=2)(x)  # [V,R,S/2,2]
        x = jnp.where(mk == 0, -1e9, x)
        blending_weights = jax.nn.softmax(x, axis=0)  # folded c=1
        rgb_in = rf.reshape(rf.shape[:-1] + (2, n_ch))[..., :3]  # [V,R,S/2,2,3]
        rgb_out = jnp.sum(rgb_in * blending_weights[..., None], axis=0)
        rgb_out = rgb_out.reshape(n_rays, n_samples, 3)
        return jnp.concatenate([rgb_out, sigma_out], axis=-1)
