"""Numerical oracle parity for the ds_rgb depth-consistency branch and the
dedicated depth_smooth patch batch vs the reference's optimize_adv_perturb
(/root/reference/eval/ibrnet/eval_adv.py:350-436 and :440-466), float64,
pinned ray selections and a pinned warp-source choice (two source views).
"""
import os
import subprocess
import sys

import pytest

REFERENCE = "/root/reference"
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)]

SCRIPT = r"""
import sys
sys.path.insert(0, '/root/reference')
sys.path.insert(0, '/root/reference/eval/ibrnet')
sys.path.insert(0, 'tests')
import ref_stubs; ref_stubs.install()
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np, torch, jax.numpy as jnp
from types import SimpleNamespace
from helpers import synthetic_scene

torch.manual_seed(9)
torch.set_default_dtype(torch.float64)
rng = np.random.RandomState(77)
H, W, NS, NRAND, PS = 24, 32, 12, 32, 4
EPS = 8.0 / 255
target_cam, src_rgbs, src_cams, _, depth_range = synthetic_scene(rng, n_src=2, h=H, w=W)
target_cam = target_cam.astype(np.float64); src_rgbs = src_rgbs.astype(np.float64)
src_cams = src_cams.astype(np.float64); depth_range = depth_range.astype(np.float64)
target_rgb = rng.rand(H, W, 3).astype(np.float64)
# native (half-res) gt depths for the ds_rgb branch
near, far = float(depth_range[0,0]), float(depth_range[0,1])
src_depths = (near + (far-near)*rng.rand(2, H//2, W//2)).astype(np.float64)
delta0 = ((rng.rand(1, 2, H, W, 3)*2-1)*EPS).astype(np.float64)
delta0 = np.clip(delta0, -src_rgbs[None], 1.0-src_rgbs[None])

sel_main = rng.choice(H*W, NRAND, replace=False)
sel_cons = rng.choice((H//2)*(W//2), NRAND, replace=False)
# patch batch: anchors + within-patch offsets, row offset fastest (both sides
# reshape the flat list to [n, p, p] identically)
n_p = NRAND // (PS*PS)
ax = rng.randint(0, H-PS+1, n_p); ay = rng.randint(0, W-PS+1, n_p)
dr = np.tile(np.arange(PS), PS); dc = np.repeat(np.arange(PS), PS)
sel_patch = ((ay[:,None]+dc[None]) + W*(ax[:,None]+dr[None])).reshape(-1)

from ibrnet.feature_network import ResUNet as TorchResUNet
from ibrnet.mlp_network import IBRNet as TorchIBRNet
from ibrnet.projection import Projector as TorchProjector
from ibrnet.criterion import Criterion
import ibrnet.sample_ray as sample_ray_mod
import eval_adv as ref_eval

torch.Tensor.cuda = lambda self, *a, **k: self
_RS = sample_ray_mod.RaySamplerSingleImage
ref_eval.RaySamplerSingleImage = lambda data, dev, **kw: _RS(data, 'cpu', **kw)

def _grsi64(self, H, W, intrinsics, c2w):
    u, v = np.meshgrid(np.arange(W)[::self.render_stride],
                       np.arange(H)[::self.render_stride])
    pixels = np.stack((u.reshape(-1), v.reshape(-1), np.ones(u.size)),
                      axis=0).astype(np.float64)
    bp = torch.from_numpy(pixels).unsqueeze(0).repeat(self.batch_size, 1, 1)
    rays_d = (c2w[:, :3, :3].bmm(torch.inverse(intrinsics[:, :3, :3]))
              .bmm(bp)).transpose(1, 2).reshape(-1, 3)
    rays_o = c2w[:, :3, 3].unsqueeze(1).repeat(1, rays_d.shape[0], 1).reshape(-1, 3)
    return rays_o, rays_d
_RS.get_rays_single_image = _grsi64

_sels = iter([sel_main.copy(), sel_cons.copy()])
_RS.sample_random_pixel = lambda self, N_rand, sample_mode, center_ratio: next(_sels)
_orig_rs = _RS.random_sample
def _patched_patch_sample(self, N_rand, patch_size):
    global _sels
    _hold = _sels
    _sels = iter([sel_patch.copy()])
    out = _orig_rs(self, N_rand, 'uniform', 0.8)
    _sels = _hold
    return out
_RS.random_patch_sample = _patched_patch_sample
ref_eval.criterion = Criterion()
ref_eval.rng = np.random.RandomState(5)
SRC_ID = int(np.random.RandomState(5).choice(2))
# the reference resizes intrinsics in place on a shared tensor; deep-copy data
tm_feat = TorchResUNet().double().eval()
tm_net = TorchIBRNet(SimpleNamespace(anti_alias_pooling=1), in_feat_ch=32,
                     n_samples=NS).double().eval()
args = SimpleNamespace(
    gt_depth_path='x',  # forces load_gt_depth=True in optimize_adv_perturb
    use_patch_sampling=False, N_rand=NRAND, sample_mode='uniform',
    center_ratio=0.8, use_pseudo_gt=False, N_samples=NS, N_importance=0,
    inv_uniform=False, white_bkgd=False, det=True,
    density_loss=False, depth_var_loss=False, depth_diff_loss=False,
    depth_smooth_loss=0.7, depth_consistency_loss=1.3, ds_rgb=True,
    camera_consistency_loss=False, use_pcgrad=False, perturb_camera=False,
    num_source_views=2, patch_size=PS,
)
model = SimpleNamespace(feature_net=tm_feat, net_coarse=tm_net, net_fine=None)
projector = TorchProjector('cpu')
# NOTE: the reference's ds_rgb branch halves intrinsics_ref IN PLACE through
# a tensor view (eval_adv.py:398), permanently corrupting src_cameras across
# iterations — a reference bug we deliberately do NOT replicate (PARITY.md).
# Deep copies isolate the single oracle call from the jax side's arrays.
t_src = torch.from_numpy(src_rgbs.copy())[None]
src_ray_batch = {
    'src_rgbs': t_src, 'src_cameras': torch.from_numpy(src_cams.copy())[None],
    'depth_range': torch.from_numpy(np.array(depth_range)),
    'camera': torch.from_numpy(np.array(target_cam[None])),
    'rgb': torch.from_numpy(target_rgb.reshape(1, -1, 3)),
    'src_depths': torch.from_numpy(np.array(src_depths))[None],
}
data = {
    'camera': torch.from_numpy(np.array(target_cam[None])),
    'rgb_path': ['synthetic.png'],
    'rgb': torch.from_numpy(target_rgb[None]),
    'src_rgbs': t_src, 'src_cameras': torch.from_numpy(src_cams.copy())[None],
    'depth_range': torch.from_numpy(np.array(depth_range)),
    'depth': torch.from_numpy(np.array(src_depths[0]))[None],  # target-view gt depth
    'src_depths': torch.from_numpy(np.array(src_depths))[None],
}
def run_ref(a, sel_seq):
    global _sels
    _sels = iter([s.copy() for s in sel_seq])
    d = {
        'camera': torch.from_numpy(np.array(target_cam[None])),
        'rgb_path': ['synthetic.png'],
        'rgb': torch.from_numpy(np.array(target_rgb[None])),
        'src_rgbs': torch.from_numpy(np.array(src_rgbs))[None],
        'src_cameras': torch.from_numpy(np.array(src_cams))[None],
        'depth_range': torch.from_numpy(np.array(depth_range)),
        'depth': torch.from_numpy(np.array(src_depths[0]))[None],
        'src_depths': torch.from_numpy(np.array(src_depths))[None],
    }
    srb = {
        'src_rgbs': d['src_rgbs'], 'src_cameras': d['src_cameras'],
        'depth_range': d['depth_range'], 'camera': d['camera'],
        'rgb': torch.from_numpy(np.array(target_rgb.reshape(1, -1, 3))),
        'src_depths': d['src_depths'],
    }
    dt = torch.from_numpy(delta0.copy()).requires_grad_(True)
    _, loss_dict = ref_eval.optimize_adv_perturb(a, dt, model, projector,
                                                 srb, d, return_loss=True)
    return {k: float(v) for k, v in loss_dict.items()}

import copy
# call 1: ds_rgb depth-consistency (+rgb). depth_smooth stays OFF here: the
# reference's cons sampler halves data['camera'] IN PLACE (sample_ray.py:81
# through the parse_camera view), so any branch after it in the same call —
# depth_smooth included — renders with corrupted target intrinsics. That is a
# reference bug we do not replicate (see PARITY.md).
args1 = copy.deepcopy(args)
args1.depth_smooth_loss = 0.0
ref1 = run_ref(args1, [sel_main, sel_cons])
print('reference terms (ds):', ref1)
# call 2: dedicated depth_smooth patch batch (+rgb), ds off
args2 = copy.deepcopy(args)
args2.depth_consistency_loss = 0.0
args2.ds_rgb = False
ref2 = run_ref(args2, [sel_main])  # patch batch pops its own pinned list
ref_terms = dict(ref1)
ref_terms['depth_smooth'] = ref2['depth_smooth']
assert abs(ref2['rgb'] - ref1['rgb']) < 1e-12
print('reference terms:', ref_terms)

# ---------------- jax side ----------------
from nerfool_tpu.models.bundle import ModelBundle
from nerfool_tpu.models.ibrnet import IBRNetAggregator
from nerfool_tpu.models.resunet import ResUNet
from nerfool_tpu.models.torch_port import (
    ibrnet_params_from_torch, resunet_params_from_torch,
)
from nerfool_tpu.render.render_rays import RenderConfig
from nerfool_tpu.attack import attack as atk

params = {'feature_net': resunet_params_from_torch(tm_feat.state_dict()),
          'net_coarse': ibrnet_params_from_torch(tm_net.state_dict())}
bundle = ModelBundle('ibrnet', ResUNet(), IBRNetAggregator(in_feat_ch=32),
                     None, params, remat_features=False)
rcfg = RenderConfig(n_samples=NS, det=True, backbone='ibrnet',
                    compute_dtype='float64')
acfg = atk.AttackConfig(h=H, w=W, epsilon=8.0, use_adam=True, adam_lr=1e-3,
                        n_rand=NRAND, patch_size=PS,
                        depth_smooth_loss=0.7, depth_consistency_loss=1.3,
                        ds_rgb=True)
_orig_randint = jax.random.randint
jax.random.randint = lambda key, shape, lo, hi, *a, **k: jnp.asarray(SRC_ID)
target = {'camera': jnp.asarray(target_cam),
          'rgb': jnp.asarray(target_rgb.reshape(-1, 3)),
          'depth': jnp.asarray(src_depths[0].reshape(-1)),
          'depth_range': jnp.asarray(depth_range)}
src = {'rgbs': jnp.asarray(src_rgbs), 'cameras': jnp.asarray(src_cams),
       'featmaps_clean': None, 'depths': jnp.asarray(src_depths)}

# single jax call computes ALL terms (no mutation hazard on this side)
_jsels = iter([jnp.asarray(sel_main), jnp.asarray(sel_cons),
               jnp.asarray(sel_patch)])
atk.select_ray_indices = lambda key, cfg: next(_jsels)
step = atk.make_attack_step(bundle, rcfg, acfg)
state = atk.init_attack_state(jax.random.PRNGKey(0), acfg, src['rgbs'])
state['delta'] = jnp.asarray(delta0[0])
state, aux = step(state, target, src, jax.random.PRNGKey(5))
print('jax terms:', {k: float(v) for k, v in aux.items()})
for rk, jk in (('rgb', 'rgb'), ('depth_cons', 'depth_cons'),
               ('depth_smooth', 'depth_smooth')):
    rv = ref_terms[rk]; jv = float(aux[jk])
    rel = abs(rv - jv) / (abs(rv) + 1e-12)
    print(f'{rk}: ref={rv:.10f} jax={jv:.10f} rel={rel:.2e}')
    assert rel < 1e-6, (rk, rv, jv)
print('OK')
"""


def test_ds_rgb_and_depth_smooth_loss_parity():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1200,
    )
    assert res.returncode == 0, res.stdout[-4000:] + res.stderr[-4000:]
    assert "OK" in res.stdout
