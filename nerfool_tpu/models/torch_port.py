"""Import reference PyTorch checkpoints (.pth) into Flax parameter pytrees.

The reference checkpoints store ``{'optimizer', 'scheduler', 'net_coarse',
'feature_net'[, 'net_fine']}`` with each entry a torch ``state_dict``
(/root/reference/ibrnet/model.py:125-135). The converters below map the torch
key layout onto the Flax module trees in ``nerfool_tpu.models`` with the
required layout transposes (conv OIHW -> HWIO, linear [out,in] -> [in,out]).
Torch is only needed to *read* a .pth; all converted params are plain numpy.
"""
from __future__ import annotations

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv(sd, key):
    return _np(sd[key]).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _dense(sd, key):
    return _np(sd[key]).T  # [out,in] -> [in,out]


def _norm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _mlp(sd, prefix, torch_indices):
    """Map nn.Sequential(Linear@i0, act, Linear@i1, ...) to MLP fc{j} entries."""
    out = {}
    for j, ti in enumerate(torch_indices):
        out[f"fc{j}"] = {
            "kernel": _dense(sd, f"{prefix}.{ti}.weight"),
            "bias": _np(sd[f"{prefix}.{ti}.bias"]),
        }
    return out


def resunet_params_from_torch(sd):
    """feature_net state_dict -> ResUNet flax params."""
    p = {
        "conv1": {"conv": {"kernel": _conv(sd, "conv1.weight")}},
        "bn1": _norm(sd, "bn1"),
        "out_conv": {
            "kernel": _conv(sd, "out_conv.weight"),
            "bias": _np(sd["out_conv.bias"]),
        },
    }
    for layer, blocks in (("layer1", 3), ("layer2", 4), ("layer3", 6)):
        for i in range(blocks):
            blk = {
                "conv1": {"conv": {"kernel": _conv(sd, f"{layer}.{i}.conv1.weight")}},
                "bn1": _norm(sd, f"{layer}.{i}.bn1"),
                "conv2": {"conv": {"kernel": _conv(sd, f"{layer}.{i}.conv2.weight")}},
                "bn2": _norm(sd, f"{layer}.{i}.bn2"),
            }
            if f"{layer}.{i}.downsample.0.weight" in sd:
                blk["downsample_conv"] = {
                    "kernel": _conv(sd, f"{layer}.{i}.downsample.0.weight")
                }
                blk["downsample_norm"] = _norm(sd, f"{layer}.{i}.downsample.1")
            p[f"{layer}_{i}"] = blk
    for up in ("upconv3", "upconv2"):
        p[up] = {
            "conv": {
                "conv": {
                    "kernel": _conv(sd, f"{up}.conv.conv.weight"),
                    "bias": _np(sd[f"{up}.conv.conv.bias"]),
                }
            },
            "bn": _norm(sd, f"{up}.conv.bn"),
        }
    for ic in ("iconv3", "iconv2"):
        p[ic] = {
            "conv": {
                "conv": {
                    "kernel": _conv(sd, f"{ic}.conv.weight"),
                    "bias": _np(sd[f"{ic}.conv.bias"]),
                }
            },
            "bn": _norm(sd, f"{ic}.bn"),
        }
    return p


def ibrnet_params_from_torch(sd):
    """net_coarse / net_fine (IBRNet) state_dict -> IBRNetAggregator flax params."""
    p = {
        "ray_dir_fc": _mlp(sd, "ray_dir_fc", (0, 2)),
        "base_fc": _mlp(sd, "base_fc", (0, 2)),
        "vis_fc": _mlp(sd, "vis_fc", (0, 2)),
        "vis_fc2": _mlp(sd, "vis_fc2", (0, 2)),
        "geometry_fc": _mlp(sd, "geometry_fc", (0, 2)),
        "out_geometry_fc": _mlp(sd, "out_geometry_fc", (0, 2)),
        "rgb_fc": _mlp(sd, "rgb_fc", (0, 2, 4)),
        "ray_attention": {
            "w_qs": {"kernel": _dense(sd, "ray_attention.w_qs.weight")},
            "w_ks": {"kernel": _dense(sd, "ray_attention.w_ks.weight")},
            "w_vs": {"kernel": _dense(sd, "ray_attention.w_vs.weight")},
            "fc": {"kernel": _dense(sd, "ray_attention.fc.weight")},
            "layer_norm": _norm(sd, "ray_attention.layer_norm"),
        },
    }
    if "s" in sd:
        p["s"] = _np(sd["s"])
    return p


def _gnt_mha(sd, prefix):
    return {
        "q_fc": {"kernel": _dense(sd, f"{prefix}.q_fc.weight")},
        "k_fc": {"kernel": _dense(sd, f"{prefix}.k_fc.weight")},
        "v_fc": {"kernel": _dense(sd, f"{prefix}.v_fc.weight")},
        "out_fc": {
            "kernel": _dense(sd, f"{prefix}.out_fc.weight"),
            "bias": _np(sd[f"{prefix}.out_fc.bias"]),
        },
    }


def _gnt_ff(sd, prefix):
    return {
        "fc1": {"kernel": _dense(sd, f"{prefix}.fc1.weight"), "bias": _np(sd[f"{prefix}.fc1.bias"])},
        "fc2": {"kernel": _dense(sd, f"{prefix}.fc2.weight"), "bias": _np(sd[f"{prefix}.fc2.bias"])},
    }


def gnt_params_from_torch(sd, trans_depth=8):
    """net_coarse / net_fine (GNT) state_dict -> GNTAggregator flax params."""
    p = {
        "rgbfeat_fc0": {
            "kernel": _dense(sd, "rgbfeat_fc.0.weight"),
            "bias": _np(sd["rgbfeat_fc.0.bias"]),
        },
        "rgbfeat_fc1": {
            "kernel": _dense(sd, "rgbfeat_fc.2.weight"),
            "bias": _np(sd["rgbfeat_fc.2.bias"]),
        },
        "norm": _norm(sd, "norm"),
        "rgb_fc": {
            "kernel": _dense(sd, "rgb_fc.weight"),
            "bias": _np(sd["rgb_fc.bias"]),
        },
    }
    for i in range(trans_depth):
        vt = f"view_crosstrans.{i}"
        attn = {
            **_gnt_mha(sd, f"{vt}.attn"),
            "pos_fc0": {
                "kernel": _dense(sd, f"{vt}.attn.pos_fc.0.weight"),
                "bias": _np(sd[f"{vt}.attn.pos_fc.0.bias"]),
            },
            "pos_fc1": {
                "kernel": _dense(sd, f"{vt}.attn.pos_fc.2.weight"),
                "bias": _np(sd[f"{vt}.attn.pos_fc.2.bias"]),
            },
            "attn_fc0": {
                "kernel": _dense(sd, f"{vt}.attn.attn_fc.0.weight"),
                "bias": _np(sd[f"{vt}.attn.attn_fc.0.bias"]),
            },
            "attn_fc1": {
                "kernel": _dense(sd, f"{vt}.attn.attn_fc.2.weight"),
                "bias": _np(sd[f"{vt}.attn.attn_fc.2.bias"]),
            },
        }
        p[f"view_trans_{i}"] = {
            "attn_norm": _norm(sd, f"{vt}.attn_norm"),
            "ff_norm": _norm(sd, f"{vt}.ff_norm"),
            "attn": attn,
            "ff": _gnt_ff(sd, f"{vt}.ff"),
        }
        rt = f"view_selftrans.{i}"
        p[f"ray_trans_{i}"] = {
            "attn_norm": _norm(sd, f"{rt}.attn_norm"),
            "ff_norm": _norm(sd, f"{rt}.ff_norm"),
            "attn": _gnt_mha(sd, f"{rt}.attn"),
            "ff": _gnt_ff(sd, f"{rt}.ff"),
        }
        if i % 2 == 0:
            p[f"q_fc_{i}_0"] = {
                "kernel": _dense(sd, f"q_fcs.{i}.0.weight"),
                "bias": _np(sd[f"q_fcs.{i}.0.bias"]),
            }
            p[f"q_fc_{i}_1"] = {
                "kernel": _dense(sd, f"q_fcs.{i}.2.weight"),
                "bias": _np(sd[f"q_fcs.{i}.2.bias"]),
            }
    return p


def load_reference_checkpoint(path, backbone="ibrnet", trans_depth=8):
    """Load a reference .pth and return {'feature_net', 'net_coarse', 'net_fine'}
    flax param trees (net_fine may be absent)."""
    import os

    import torch

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint {path!r} not found — download the reference "
            f"model_*.pth (see README) or pass --ckpt_path '' for random init"
        )
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    agg_port = (
        ibrnet_params_from_torch
        if backbone == "ibrnet"
        else lambda sd: gnt_params_from_torch(sd, trans_depth)
    )
    out = {
        "feature_net": resunet_params_from_torch(ckpt["feature_net"]),
        "net_coarse": agg_port(ckpt["net_coarse"]),
    }
    if "net_fine" in ckpt:
        out["net_fine"] = agg_port(ckpt["net_fine"])
    return out
