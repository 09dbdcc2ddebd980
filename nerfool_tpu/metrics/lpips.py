"""LPIPS (net-lin, VGG16) in Flax.

Replicates the reference's perceptual metric protocol — the vendored TF-graph
``net-lin_vgg`` for IBRNet results (/root/reference/eval/ibrnet/lpips_tensorflow/
lpips_tf.py:32-93) and the pip ``lpips`` package for GNT results
(/root/reference/eval/gnt/utils.py:286-297). Both compute the same function:

  1. scale inputs from [0,1] (or [-1,1]) with the LPIPS shift/scale constants,
  2. run VGG16 conv features, tapping relu1_2/relu2_2/relu3_3/relu4_3/relu5_3,
  3. channel-unit-normalize each tap, squared difference,
  4. 1x1 "lin" convs, spatial mean, sum over taps.

Weights are external (zero-egress environments can't fetch VGG); load them from
an .npz via ``load_lpips_weights`` or convert a pip-lpips checkpoint with
``convert_lpips_torch_state``. Random-weight initialization keeps the metric
testable end to end.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: (out_channels, n_convs) per block; maxpool between blocks
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class _VGGFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):  # x: [N,H,W,3] in [-1,1]
        taps = []
        for b, (ch, n_convs) in enumerate(_VGG_BLOCKS):
            for c in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv{b}_{c}")(x)
                x = nn.relu(x)
            taps.append(x)
            if b < len(_VGG_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Callable as lpips.apply({'params': p}, pred, gt) with [N,H,W,3].

    ``normalize=True`` maps [0,1] inputs to [-1,1] first — the IBRNet-results
    convention (the vendored TF graph does this internally,
    /root/reference/eval/ibrnet/lpips_tensorflow/lpips_tf.py:58-59).
    ``normalize=False`` feeds inputs raw — the GNT-results convention (pip
    lpips' default; /root/reference/eval/gnt/utils.py:286-297 passes [0,1]
    images without the normalize flag).
    """

    normalize: bool = True

    @nn.compact
    def __call__(self, pred, gt):
        def prep(im):
            if self.normalize:
                im = 2.0 * im - 1.0  # [0,1] -> [-1,1]
            return (im - _SHIFT) / _SCALE

        vgg = _VGGFeatures(name="vgg")
        f_pred = vgg(prep(pred))
        f_gt = vgg(prep(gt))

        total = 0.0
        for i, (fp, fg) in enumerate(zip(f_pred, f_gt)):
            fp = fp / jnp.sqrt(jnp.sum(fp ** 2, axis=-1, keepdims=True) + 1e-10)
            fg = fg / jnp.sqrt(jnp.sum(fg ** 2, axis=-1, keepdims=True) + 1e-10)
            diff = (fp - fg) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")(diff)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total  # [N]


def convert_lpips_torch_state(vgg_features_sd, lins_sd):
    """Convert torch weights into the LPIPS flax param tree.

    :param vgg_features_sd: torchvision vgg16 ``features`` state_dict
        (keys '0.weight', '2.weight', ... torchvision layer indices)
    :param lins_sd: pip-lpips lin state_dict (keys 'lin{i}.model.1.weight')
    """
    idx_map = []  # torchvision features indices of conv layers
    i = 0
    for b, (ch, n_convs) in enumerate(_VGG_BLOCKS):
        for c in range(n_convs):
            idx_map.append((b, c, i))
            i += 2  # conv + relu
        i += 1  # maxpool

    def t2f(w):
        return np.asarray(w).transpose(2, 3, 1, 0)

    params = {"vgg": {}}
    for b, c, ti in idx_map:
        params["vgg"][f"conv{b}_{c}"] = {
            "kernel": t2f(vgg_features_sd[f"{ti}.weight"]),
            "bias": np.asarray(vgg_features_sd[f"{ti}.bias"]),
        }
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        params[f"lin{i}"] = {"kernel": t2f(lins_sd[key])}
    return params


def load_lpips_weights(path):
    """Load LPIPS params from an .npz of flattened 'a/b/c' keys (see
    ``save_lpips_weights``) or a .pth with {'vgg_features', 'lins'} dicts."""
    if str(path).endswith(".npz"):
        flat = np.load(path)
        params: dict = {}
        for k in flat.files:
            parts = k.split("/")
            d = params
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = flat[k]
        return params
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return convert_lpips_torch_state(ckpt["vgg_features"], ckpt["lins"])


def save_lpips_weights(params, path):
    flat = {}

    def walk(d, prefix):
        for k, v in d.items():
            kk = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, kk)
            else:
                flat[kk] = np.asarray(v)

    walk(params, "")
    np.savez(path, **flat)
