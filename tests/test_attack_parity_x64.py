"""Definitive attack-gradient parity: in float64 the full
featurenet -> renderer -> criterion gradient w.r.t. delta matches torch
autograd to ~1e-8 relative, proving the pipelines are the same function.
Runs in a subprocess because x64 must be enabled before any tracing."""
import os
import subprocess
import sys

import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)

SCRIPT = r"""
import sys
sys.path.insert(0, '/root/reference')
sys.path.insert(0, 'tests')
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np, torch, jax.numpy as jnp
from types import SimpleNamespace
from helpers import synthetic_scene
from ibrnet.feature_network import ResUNet as TorchResUNet
from ibrnet.mlp_network import IBRNet as TorchIBRNet
from ibrnet.projection import Projector as TorchProjector
from ibrnet.render_ray import render_rays as torch_render_rays
from nerfool_tpu.models.bundle import ModelBundle
from nerfool_tpu.models.ibrnet import IBRNetAggregator
from nerfool_tpu.models.resunet import ResUNet
from nerfool_tpu.models.torch_port import ibrnet_params_from_torch, resunet_params_from_torch
from nerfool_tpu.render.render_rays import RenderConfig, render_rays
from nerfool_tpu.attack.losses import rgb_criterion
from nerfool_tpu.utils.cameras import get_rays

torch.manual_seed(9)
torch.set_default_dtype(torch.float64)
rng = np.random.RandomState(1234)
H, W = 24, 32
target_cam, src_rgbs, src_cams, _, depth_range = synthetic_scene(rng, n_src=3, h=H, w=W)
target_cam = target_cam.astype(np.float64); src_rgbs = src_rgbs.astype(np.float64)
src_cams = src_cams.astype(np.float64); depth_range = depth_range.astype(np.float64)

tm_feat = TorchResUNet().double().eval()
args = SimpleNamespace(anti_alias_pooling=1)
tm_net = TorchIBRNet(args, in_feat_ch=32, n_samples=12).double().eval()
params = {'feature_net': resunet_params_from_torch(tm_feat.state_dict()),
          'net_coarse': ibrnet_params_from_torch(tm_net.state_dict())}
bundle = ModelBundle('ibrnet', ResUNet(), IBRNetAggregator(in_feat_ch=32), None, params,
                     remat_features=False)
cfg = RenderConfig(n_samples=12, det=True, backbone='ibrnet')
eps = 8.0/255
delta0 = ((rng.rand(*src_rgbs.shape)*2-1)*eps).astype(np.float64)
sel = rng.choice(H*W, 20, replace=False)
gt = rng.rand(20,3).astype(np.float64)
intr = target_cam[2:18].reshape(4,4); c2w = target_cam[18:34].reshape(4,4)
ro, rd = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
ro, rd = np.asarray(ro)[sel], np.asarray(rd)[sel]

t_delta = torch.from_numpy(delta0).requires_grad_(True)
t_src = torch.from_numpy(src_rgbs)
featmaps = tm_feat((t_src+t_delta).permute(0,3,1,2))
t_batch = {'ray_o': torch.from_numpy(ro), 'ray_d': torch.from_numpy(rd),
           'depth_range': torch.from_numpy(depth_range),
           'camera': torch.from_numpy(target_cam[None]),
           'src_rgbs': t_src[None], 'src_cameras': torch.from_numpy(src_cams)[None]}
ret = torch_render_rays(t_batch, SimpleNamespace(net_coarse=tm_net, net_fine=None),
                        list(featmaps), TorchProjector('cpu'), N_samples=12, det=True)
out = ret['outputs_coarse']; m = out['mask'].double()
loss_t = ((out['rgb']-torch.from_numpy(gt))**2*m.unsqueeze(-1)).sum()/(m.sum()*3+1e-6)
loss_t.backward()
ref_grad = t_delta.grad.numpy()

batch = {'ray_o': jnp.asarray(ro), 'ray_d': jnp.asarray(rd),
         'depth_range': jnp.asarray(depth_range), 'camera': jnp.asarray(target_cam[None])}
def loss_fn(d):
    feats = bundle.extract_features(jnp.asarray(src_rgbs)+d)
    r = render_rays(bundle.render_params, bundle.modules, batch, feats, cfg,
                    src_rgbs=jnp.asarray(src_rgbs), src_cameras=jnp.asarray(src_cams))
    return rgb_criterion(r['outputs_coarse'], jnp.asarray(gt))
lj, gj = jax.value_and_grad(loss_fn)(jnp.asarray(delta0))
g = np.asarray(gj).ravel(); r_ = ref_grad.ravel()
rel_l2 = np.linalg.norm(g-r_)/np.linalg.norm(r_)
assert abs(float(lj) - float(loss_t)) < 1e-7, (float(lj), float(loss_t))
assert rel_l2 < 1e-6, rel_l2
print('OK rel_l2=%.3e' % rel_l2)
"""


def test_x64_gradient_parity():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "OK" in res.stdout
