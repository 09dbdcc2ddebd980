"""Oracle parity for HYBRID clean/adv rendering — the paper's density-vs-color
vulnerability analysis — against the reference render_rays_hybrid for both
backbones (/root/reference/ibrnet/render_ray.py:261-390,
/root/reference/gnt/render_ray.py:282-387), float64, all three flag
combinations (use_clean_color, use_clean_density) in {(1,0),(0,1),(1,1)}.

The two references differ materially and both behaviors are under test:
ibrnet mixes raw color/sigma at BOTH levels; gnt mixes only the coarse
outputs (rgb under use_clean_color, the attention-weight vector under
use_clean_density), keeps the adv depth either way, and renders the fine
pass from adv features unmixed.
"""
import os
import subprocess
import sys

import pytest

REFERENCE = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)]

IBRNET_SCRIPT = r"""
import sys
sys.path.insert(0, '/root/reference')
sys.path.insert(0, 'tests')
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np, torch, jax.numpy as jnp
from types import SimpleNamespace
from helpers import synthetic_scene
from nerfool_tpu.utils.cameras import get_rays

torch.manual_seed(11)
torch.set_default_dtype(torch.float64)
rng = np.random.RandomState(31)
H, W, NS, NI, NRAYS = 24, 32, 12, 6, 29
target_cam, src_rgbs, src_cams, feats, depth_range = synthetic_scene(rng, h=H, w=W)
feats_clean = tuple(
    (np.asarray(f) + 0.3 * rng.randn(*f.shape)).astype(np.float64) for f in feats)
feats = tuple(np.asarray(f).astype(np.float64) for f in feats)
src_rgbs = src_rgbs.astype(np.float64); src_cams = src_cams.astype(np.float64)
target_cam = target_cam.astype(np.float64)
depth_range = depth_range.astype(np.float64)

intr = target_cam[2:18].reshape(4, 4); c2w = target_cam[18:34].reshape(4, 4)
rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
sel = rng.choice(H * W, NRAYS, replace=False)
batch = {'ray_o': np.asarray(rays_o)[sel], 'ray_d': np.asarray(rays_d)[sel],
         'depth_range': depth_range, 'camera': target_cam[None]}

from ibrnet.mlp_network import IBRNet as TorchIBRNet
from ibrnet.projection import Projector as TorchProjector
from ibrnet.render_ray import render_rays_hybrid as torch_hybrid

nargs = SimpleNamespace(anti_alias_pooling=1)
tm_c = TorchIBRNet(nargs, in_feat_ch=32, n_samples=NS).double().eval()
tm_f = TorchIBRNet(nargs, in_feat_ch=32, n_samples=NS + NI).double().eval()
t_model = SimpleNamespace(net_coarse=tm_c, net_fine=tm_f)
t_batch = {
    'ray_o': torch.from_numpy(batch['ray_o']),
    'ray_d': torch.from_numpy(batch['ray_d']),
    'depth_range': torch.from_numpy(batch['depth_range']),
    'camera': torch.from_numpy(batch['camera']),
    'src_rgbs': torch.from_numpy(src_rgbs)[None],
    'src_cameras': torch.from_numpy(src_cams)[None],
}
t_feats = [torch.from_numpy(np.transpose(f, (0, 3, 1, 2))) for f in feats]
t_feats_clean = [torch.from_numpy(np.transpose(f, (0, 3, 1, 2)))
                 for f in feats_clean]

from nerfool_tpu.models.ibrnet import IBRNetAggregator
from nerfool_tpu.models.torch_port import ibrnet_params_from_torch
from nerfool_tpu.render.render_rays import RenderConfig, render_rays

params = {'net_coarse': ibrnet_params_from_torch(tm_c.state_dict()),
          'net_fine': ibrnet_params_from_torch(tm_f.state_dict())}
model = {'net_coarse': IBRNetAggregator(in_feat_ch=32),
         'net_fine': IBRNetAggregator(in_feat_ch=32)}

for ucc, ucd in ((True, False), (False, True), (True, True)):
    with torch.no_grad():
        ref = torch_hybrid(
            t_batch, t_model, t_feats, TorchProjector('cpu'), N_samples=NS,
            inv_uniform=True, N_importance=NI, det=True,
            args=SimpleNamespace(use_clean_color=ucc, use_clean_density=ucd),
            featmaps_clean=t_feats_clean,
        )
    cfg = RenderConfig(n_samples=NS, n_importance=NI, inv_uniform=True,
                       det=True, backbone='ibrnet', compute_dtype='float64',
                       use_clean_color=ucc, use_clean_density=ucd)
    ours = render_rays(params, model, batch, feats, cfg, src_rgbs=src_rgbs,
                       src_cameras=src_cams, featmaps_clean=feats_clean)
    for level in ('outputs_coarse', 'outputs_fine'):
        for k in ('rgb', 'depth', 'weights'):
            a = np.asarray(ours[level][k]); b = ref[level][k].numpy()
            err = np.max(np.abs(a - b))
            print(f'ucc={ucc} ucd={ucd} {level}/{k}: {err:.3e}')
            assert err < 1e-8, (ucc, ucd, level, k, err)
# sanity: hybrid output actually differs from the pure-adv render
cfg0 = RenderConfig(n_samples=NS, n_importance=NI, inv_uniform=True,
                    det=True, backbone='ibrnet', compute_dtype='float64')
base = render_rays(params, model, batch, feats, cfg0, src_rgbs=src_rgbs,
                   src_cameras=src_cams)
assert np.max(np.abs(np.asarray(base['outputs_coarse']['rgb'])
                     - np.asarray(ours['outputs_coarse']['rgb']))) > 1e-6
print('OK')
"""

GNT_SCRIPT = r"""
import sys
sys.path.insert(0, '/root/reference')
sys.path.insert(0, 'tests')
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np, torch, jax.numpy as jnp
from types import SimpleNamespace
from helpers import synthetic_scene
from nerfool_tpu.utils.cameras import get_rays

torch.manual_seed(12)
torch.set_default_dtype(torch.float64)
rng = np.random.RandomState(41)
H, W, NS, NI, NRAYS, DEPTH = 24, 32, 12, 6, 23, 2
target_cam, src_rgbs, src_cams, feats, depth_range = synthetic_scene(rng, h=H, w=W)
feats_clean = tuple(
    (np.asarray(f) + 0.3 * rng.randn(*f.shape)).astype(np.float64) for f in feats)
feats = tuple(np.asarray(f).astype(np.float64) for f in feats)
src_rgbs = src_rgbs.astype(np.float64); src_cams = src_cams.astype(np.float64)
target_cam = target_cam.astype(np.float64)
depth_range = depth_range.astype(np.float64)

intr = target_cam[2:18].reshape(4, 4); c2w = target_cam[18:34].reshape(4, 4)
rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
sel = rng.choice(H * W, NRAYS, replace=False)
batch = {'ray_o': np.asarray(rays_o)[sel], 'ray_d': np.asarray(rays_d)[sel],
         'depth_range': depth_range, 'camera': target_cam[None]}

from gnt.transformer_network import GNT as TorchGNT
from gnt.projection import Projector as TorchProjector
from gnt.render_ray import render_rays_hybrid as torch_hybrid

tm = TorchGNT(SimpleNamespace(netwidth=64, trans_depth=DEPTH), in_feat_ch=32,
              posenc_dim=63, viewenc_dim=63, ret_alpha=True).double().eval()
t_model = SimpleNamespace(net_coarse=tm, net_fine=None)
t_batch = {
    'ray_o': torch.from_numpy(batch['ray_o']),
    'ray_d': torch.from_numpy(batch['ray_d']),
    'depth_range': torch.from_numpy(batch['depth_range']),
    'camera': torch.from_numpy(batch['camera']),
    'src_rgbs': torch.from_numpy(src_rgbs)[None],
    'src_cameras': torch.from_numpy(src_cams)[None],
}
t_feats = [torch.from_numpy(np.transpose(f, (0, 3, 1, 2))) for f in feats]
t_feats_clean = [torch.from_numpy(np.transpose(f, (0, 3, 1, 2)))
                 for f in feats_clean]

from nerfool_tpu.models.gnt import GNTAggregator
from nerfool_tpu.models.torch_port import gnt_params_from_torch
from nerfool_tpu.render.render_rays import RenderConfig, render_rays

params = {'net_coarse': gnt_params_from_torch(tm.state_dict(), trans_depth=DEPTH)}
model = {'net_coarse': GNTAggregator(in_feat_ch=32, netwidth=64,
                                     trans_depth=DEPTH, ret_alpha=True)}

# N_importance>0 additionally covers the reference's unmixed-fine quirk: the
# fine pass renders adv features only, but importance-samples from the MIXED
# coarse weights (gnt/render_ray.py:367-387)
for n_imp in (0, NI):
    for ucc, ucd in ((True, False), (False, True), (True, True)):
        with torch.no_grad():
            ref = torch_hybrid(
                t_batch, t_model, t_feats, TorchProjector('cpu'), N_samples=NS,
                inv_uniform=False, N_importance=n_imp, det=True, ret_alpha=True,
                single_net=True,
                args=SimpleNamespace(use_clean_color=ucc, use_clean_density=ucd),
                featmaps_clean=t_feats_clean,
            )
        cfg = RenderConfig(n_samples=NS, n_importance=n_imp, det=True,
                           backbone='gnt', single_net=True, ret_alpha=True,
                           stop_camera_grad=False, compute_dtype='float64',
                           use_clean_color=ucc, use_clean_density=ucd)
        ours = render_rays(params, model, batch, feats, cfg, src_rgbs=src_rgbs,
                           src_cameras=src_cams, featmaps_clean=feats_clean)
        levels = ['outputs_coarse'] + (['outputs_fine'] if n_imp else [])
        for level in levels:
            for k in ('rgb', 'weights', 'depth'):
                a = np.asarray(ours[level][k]); b = ref[level][k].numpy()
                err = np.max(np.abs(a - b))
                print(f'ni={n_imp} ucc={ucc} ucd={ucd} {level}/{k}: {err:.3e}')
                # GNT's forward hard-casts pts/viewdirs to f32 before the
                # positional encodings (transformer_network.py:274,276;
                # replicated — PARITY.md), so f64 agreement floors at the
                # f32-sin ULP (~1e-8 per aggregator call), not machine eps
                assert err < 1e-6, (n_imp, ucc, ucd, level, k, err)
print('OK')
"""


def _run(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1200,
    )
    assert res.returncode == 0, res.stdout[-4000:] + res.stderr[-4000:]
    assert "OK" in res.stdout


def test_ibrnet_hybrid_render_parity():
    _run(IBRNET_SCRIPT)


def test_gnt_hybrid_render_parity():
    _run(GNT_SCRIPT)
