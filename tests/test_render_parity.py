"""End-to-end render_rays parity against the reference implementations (used as
oracles from /root/reference), for both backbones, with fine-pass importance
sampling in both depth domains."""
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

from helpers import orbit_cameras, synthetic_scene  # noqa: E402

from nerfool_tpu.utils.cameras import get_rays  # noqa: E402
from nerfool_tpu.render.render_rays import RenderConfig, render_rays  # noqa: E402


def _make_ray_batch(rng, h=32, w=40, n_rays=37):
    import jax.numpy as jnp

    target_cam, src_rgbs, src_cams, feats, depth_range = synthetic_scene(rng, h=h, w=w)
    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(h, w, jnp.asarray(intr), jnp.asarray(c2w))
    sel = rng.choice(h * w, size=n_rays, replace=False)
    batch = {
        "ray_o": np.asarray(rays_o)[sel],
        "ray_d": np.asarray(rays_d)[sel],
        "depth_range": depth_range,
        "camera": target_cam[None],
    }
    return batch, src_rgbs, src_cams, feats


@pytest.mark.parametrize("inv_uniform", [False, True])
def test_ibrnet_render_rays_parity(rng, inv_uniform):
    import torch
    from ibrnet.mlp_network import IBRNet as TorchIBRNet
    from ibrnet.projection import Projector as TorchProjector
    from ibrnet.render_ray import render_rays as torch_render_rays

    from nerfool_tpu.models.ibrnet import IBRNetAggregator
    from nerfool_tpu.models.torch_port import ibrnet_params_from_torch

    torch.manual_seed(3)
    n_samples, n_importance = 16, 8
    batch, src_rgbs, src_cams, feats = _make_ray_batch(rng)

    args = SimpleNamespace(anti_alias_pooling=1)
    tm_c = TorchIBRNet(args, in_feat_ch=32, n_samples=n_samples).eval()
    tm_f = TorchIBRNet(args, in_feat_ch=32, n_samples=n_samples + n_importance).eval()

    t_batch = {
        "ray_o": torch.from_numpy(batch["ray_o"]),
        "ray_d": torch.from_numpy(batch["ray_d"]),
        "depth_range": torch.from_numpy(batch["depth_range"]),
        "camera": torch.from_numpy(batch["camera"]),
        "src_rgbs": torch.from_numpy(src_rgbs)[None],
        "src_cameras": torch.from_numpy(src_cams)[None],
    }
    t_feats = [
        torch.from_numpy(np.transpose(f, (0, 3, 1, 2))) for f in feats
    ]
    t_model = SimpleNamespace(net_coarse=tm_c, net_fine=tm_f)
    with torch.no_grad():
        ref = torch_render_rays(
            t_batch, t_model, t_feats, TorchProjector("cpu"),
            N_samples=n_samples, inv_uniform=inv_uniform,
            N_importance=n_importance, det=True,
        )

    params = {
        "net_coarse": ibrnet_params_from_torch(tm_c.state_dict()),
        "net_fine": ibrnet_params_from_torch(tm_f.state_dict()),
    }
    model = {
        "net_coarse": IBRNetAggregator(in_feat_ch=32),
        "net_fine": IBRNetAggregator(in_feat_ch=32),
    }
    cfg = RenderConfig(
        n_samples=n_samples, n_importance=n_importance,
        inv_uniform=inv_uniform, det=True, backbone="ibrnet",
    )
    ours = render_rays(
        params, model, batch, feats, cfg, src_rgbs=src_rgbs, src_cameras=src_cams
    )

    for level in ("outputs_coarse", "outputs_fine"):
        for k in ("rgb", "depth", "weights", "alpha"):
            np.testing.assert_allclose(
                np.asarray(ours[level][k]), ref[level][k].numpy(),
                rtol=2e-3, atol=2e-4, err_msg=f"{level}/{k}",
            )
        np.testing.assert_array_equal(
            np.asarray(ours[level]["mask"]), ref[level]["mask"].numpy()
        )


def test_gnt_render_rays_parity(rng):
    import torch
    from gnt.transformer_network import GNT as TorchGNT
    from gnt.projection import Projector as TorchProjector
    from gnt.render_ray import render_rays as torch_render_rays

    from nerfool_tpu.models.gnt import GNTAggregator
    from nerfool_tpu.models.torch_port import gnt_params_from_torch

    torch.manual_seed(4)
    n_samples, depth = 16, 4
    batch, src_rgbs, src_cams, feats = _make_ray_batch(rng)

    args = SimpleNamespace(netwidth=64, trans_depth=depth)
    tm = TorchGNT(args, in_feat_ch=32, posenc_dim=63, viewenc_dim=63, ret_alpha=True).eval()

    t_batch = {
        "ray_o": torch.from_numpy(batch["ray_o"]),
        "ray_d": torch.from_numpy(batch["ray_d"]),
        "depth_range": torch.from_numpy(batch["depth_range"]),
        "camera": torch.from_numpy(batch["camera"]),
        "src_rgbs": torch.from_numpy(src_rgbs)[None],
        "src_cameras": torch.from_numpy(src_cams)[None],
    }
    t_feats = [torch.from_numpy(np.transpose(f, (0, 3, 1, 2))) for f in feats]
    t_model = SimpleNamespace(net_coarse=tm, net_fine=None)
    with torch.no_grad():
        ref = torch_render_rays(
            t_batch, t_model, t_feats, TorchProjector("cpu"),
            N_samples=n_samples, inv_uniform=False, N_importance=0,
            det=True, ret_alpha=True, single_net=True,
        )

    params = {"net_coarse": gnt_params_from_torch(tm.state_dict(), trans_depth=depth)}
    model = {"net_coarse": GNTAggregator(in_feat_ch=32, netwidth=64, trans_depth=depth,
                                         ret_alpha=True)}
    cfg = RenderConfig(
        n_samples=n_samples, n_importance=0, det=True, backbone="gnt",
        single_net=True, ret_alpha=True, stop_camera_grad=False,
    )
    ours = render_rays(
        params, model, batch, feats, cfg, src_rgbs=src_rgbs, src_cameras=src_cams
    )
    np.testing.assert_allclose(
        np.asarray(ours["outputs_coarse"]["rgb"]), ref["outputs_coarse"]["rgb"].numpy(),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["outputs_coarse"]["depth"]), ref["outputs_coarse"]["depth"].numpy(),
        rtol=2e-3, atol=2e-4,
    )
