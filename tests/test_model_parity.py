"""End-to-end numerical parity of the Flax networks against the reference
PyTorch implementations, used purely as a test oracle (imported from
/root/reference, never copied). Random torch weights are exported through the
checkpoint importer and the two forwards are compared. Skipped when the
reference checkout is unavailable."""
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)

if os.path.isdir(REFERENCE):
    sys.path.insert(0, REFERENCE)


@pytest.fixture(scope="module")
def torch_mod():
    import torch

    torch.manual_seed(0)
    return torch


def test_resunet_parity(torch_mod, rng):
    torch = torch_mod
    from ibrnet.feature_network import ResUNet as TorchResUNet

    from nerfool_tpu.models.resunet import ResUNet
    from nerfool_tpu.models.torch_port import resunet_params_from_torch

    tm = TorchResUNet(coarse_out_ch=32, fine_out_ch=32).eval()
    params = resunet_params_from_torch(tm.state_dict())

    x = rng.rand(2, 44, 52, 3).astype(np.float32)
    with torch.no_grad():
        ref_c, ref_f = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    ours_c, ours_f = ResUNet().apply({"params": params}, x)

    np.testing.assert_allclose(
        np.asarray(ours_c), ref_c.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours_f), ref_f.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=2e-4
    )


def test_ibrnet_aggregator_parity(torch_mod, rng):
    torch = torch_mod
    from ibrnet.mlp_network import IBRNet as TorchIBRNet

    from nerfool_tpu.models.ibrnet import IBRNetAggregator
    from nerfool_tpu.models.torch_port import ibrnet_params_from_torch

    r, s, v = 7, 24, 5
    args = SimpleNamespace(anti_alias_pooling=1)
    tm = TorchIBRNet(args, in_feat_ch=32, n_samples=s).eval()
    params = ibrnet_params_from_torch(tm.state_dict())

    rgb_feat = rng.rand(r, s, v, 35).astype(np.float32)
    d = rng.randn(r, s, v, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dot = rng.uniform(0.7, 1.0, (r, s, v, 1)).astype(np.float32)
    ray_diff = np.concatenate([d, dot], axis=-1)
    mask = (rng.rand(r, s, v, 1) > 0.2).astype(np.float32)

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(rgb_feat), torch.from_numpy(ray_diff), torch.from_numpy(mask)
        ).numpy()
    # ours takes views-first [V,R,S,C]
    t = lambda a: np.ascontiguousarray(np.transpose(a, (2, 0, 1, 3)))
    ours = np.asarray(
        IBRNetAggregator(in_feat_ch=32).apply(
            {"params": params}, t(rgb_feat), t(ray_diff), t(mask)
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_gnt_aggregator_parity(torch_mod, rng):
    torch = torch_mod
    from gnt.transformer_network import GNT as TorchGNT

    from nerfool_tpu.models.gnt import GNTAggregator
    from nerfool_tpu.models.torch_port import gnt_params_from_torch

    r, s, v, depth = 5, 16, 4, 4
    args = SimpleNamespace(netwidth=64, trans_depth=depth)
    tm = TorchGNT(args, in_feat_ch=32, posenc_dim=63, viewenc_dim=63, ret_alpha=True).eval()
    params = gnt_params_from_torch(tm.state_dict(), trans_depth=depth)

    rgb_feat = rng.rand(r, s, v, 35).astype(np.float32)
    d = rng.randn(r, s, v, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dot = rng.uniform(0.7, 1.0, (r, s, v, 1)).astype(np.float32)
    ray_diff = np.concatenate([d, dot], axis=-1)
    mask = (rng.rand(r, s, v, 1) > 0.2).astype(np.float32)
    pts = rng.randn(r, s, 3).astype(np.float32)
    ray_d = rng.randn(r, 3).astype(np.float32)

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(rgb_feat),
            torch.from_numpy(ray_diff),
            torch.from_numpy(mask),
            torch.from_numpy(pts),
            torch.from_numpy(ray_d),
        ).numpy()
    t = lambda a: np.ascontiguousarray(np.transpose(a, (2, 0, 1, 3)))
    ours = np.asarray(
        GNTAggregator(in_feat_ch=32, netwidth=64, trans_depth=depth, ret_alpha=True).apply(
            {"params": params}, t(rgb_feat), t(ray_diff), t(mask), pts, ray_d
        )
    )
    assert ours.shape == ref.shape == (r, 3 + s)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
