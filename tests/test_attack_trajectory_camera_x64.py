"""Camera-pose attack TRAJECTORY parity vs the reference oracle.

The camera attack is NeRFool's pose-perturbation mode: rot/trans parameters
on the source cameras are Adam-optimized jointly with delta under the
bidirectional camera-consistency loss (eval/ibrnet/eval_adv.py:469-510 +
main loop :796-843). This runs N full iterations of the reference loop vs
the jax attack step with perturb_camera=True, in float64 with pinned ray
selections, a single source view (pins the oracle's rng.choice), identical
delta/rot/trans inits and synthetic GT depths, then compares the loss trace
and the final delta AND pose parameters.

Subprocess because x64 must be enabled before any tracing.
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

torch.manual_seed(13)
torch.set_default_dtype(torch.float64)
rng = np.random.RandomState(555)
H, W, NSRC, NS, NI, NRAND, ITERS = 24, 32, 1, 10, 8, 32, 12
EPS = 8.0 / 255
ROT_EPS_DEG, TRANS_EPS = 1.0, 0.02
target_cam, src_rgbs, src_cams, _, depth_range = synthetic_scene(rng, n_src=NSRC, h=H, w=W)
target_cam = target_cam.astype(np.float64); src_rgbs = src_rgbs.astype(np.float64)
src_cams = src_cams.astype(np.float64); depth_range = depth_range.astype(np.float64)
target_rgb = rng.rand(H, W, 3).astype(np.float64)
# the reference expects GT depths at HALF the rgb resolution and
# nearest-upsamples them 2x in the sampler (sample_ray.py:66-69; the
# guard compares W to the rgb CHANNEL count, so it always fires); the
# jax engine pre-upsamples, so the oracle gets half-res and the jax
# side gets the 2x nearest-upsampled twins
yy, xx = np.meshgrid(np.arange(H // 2), np.arange(W // 2), indexing='ij')
tar_depth_half = (3.0 + np.sin(xx / 4.0) + 0.5 * np.cos(yy / 3.0)).astype(np.float64)
src_depths_half = np.stack([
    3.0 + np.cos(xx / 3.5 + i) + 0.4 * np.sin(yy / 2.5) for i in range(NSRC)
]).astype(np.float64)
up2 = lambda d: np.repeat(np.repeat(d, 2, axis=-2), 2, axis=-1)
tar_depth = up2(tar_depth_half)
src_depths = up2(src_depths_half)
delta0 = ((rng.rand(1, NSRC, H, W, 3) * 2 - 1) * EPS).astype(np.float64)
delta0 = np.clip(delta0, -src_rgbs[None], 1.0 - src_rgbs[None])
rot_eps_rad = ROT_EPS_DEG / 180.0 * np.pi
rot0 = ((rng.rand(NSRC, 3) * 2 - 1) * rot_eps_rad).astype(np.float64)
trans0 = ((rng.rand(NSRC, 3) * 2 - 1) * TRANS_EPS).astype(np.float64)
sels = [rng.choice(H * W, NRAND, replace=False) for _ in range(ITERS)]

# ---------------- reference side ----------------
from ibrnet.feature_network import ResUNet as TorchResUNet
from ibrnet.mlp_network import IBRNet as TorchIBRNet
from ibrnet.projection import Projector as TorchProjector
from ibrnet.criterion import Criterion
import ibrnet.sample_ray as sample_ray_mod
import eval_adv as ref_eval
from eval_adv import transform_src_cameras as ref_transform

tm_feat = TorchResUNet().double().eval()
targs = SimpleNamespace(anti_alias_pooling=1)
tm_coarse = TorchIBRNet(targs, in_feat_ch=32, n_samples=NS).double().eval()
tm_fine = TorchIBRNet(targs, in_feat_ch=32, n_samples=NS + NI).double().eval()

torch.Tensor.cuda = lambda self, *a, **k: self
_RS = sample_ray_mod.RaySamplerSingleImage
ref_eval.RaySamplerSingleImage = lambda data, dev, **kw: _RS(data, 'cpu', **kw)
_sel_it = None

def _grsi64(self, H, W, intrinsics, c2w):
    u, v = np.meshgrid(np.arange(W)[::self.render_stride],
                       np.arange(H)[::self.render_stride])
    pixels = np.stack((u.reshape(-1), v.reshape(-1),
                       np.ones(u.size)), axis=0).astype(np.float64)
    bp = torch.from_numpy(pixels).unsqueeze(0).repeat(self.batch_size, 1, 1)
    rays_d = (c2w[:, :3, :3].bmm(torch.inverse(intrinsics[:, :3, :3]))
              .bmm(bp)).transpose(1, 2).reshape(-1, 3)
    rays_o = c2w[:, :3, 3].unsqueeze(1).repeat(1, rays_d.shape[0], 1).reshape(-1, 3)
    return rays_o, rays_d

_RS.get_rays_single_image = _grsi64
_RS.sample_random_pixel = lambda self, N_rand, sample_mode, center_ratio: next(_sel_it)
ref_eval.criterion = Criterion()

args = SimpleNamespace(
    gt_depth_path='synthetic', use_patch_sampling=False, N_rand=NRAND,
    sample_mode='uniform', center_ratio=0.8, use_pseudo_gt=False,
    N_samples=NS, N_importance=NI, inv_uniform=True, white_bkgd=False,
    det=True, adv_iters=ITERS, adv_lr=1, epsilon=8, use_adam=True,
    adam_lr=1e-3, lr_step_size=6, lr_gamma=0.5,
    density_loss=False, depth_var_loss=False, depth_diff_loss=False,
    depth_smooth_loss=False, depth_consistency_loss=False,
    camera_consistency_loss=0.1, cam_src2tar=1.0, cam_tar2src=1.0,
    cam_depth=0.5, perturb_camera=True, perturb_camera_no_detach=False,
    perturb_camera_no_opt=False, rot_epsilon=ROT_EPS_DEG,
    trans_epsilon=TRANS_EPS, use_pcgrad=False, use_unseen_views=False,
    num_source_views=NSRC, ds_rgb=False,
    depth_var_loss_weight=0.0, depth_diff_loss_weight=0.0,
    depth_smooth_loss_weight=0.0, depth_consistency_loss_weight=0.0,
    camera_consistency_loss_weight=0.0, density_loss_weight=0.0,
)
model = SimpleNamespace(feature_net=tm_feat, net_coarse=tm_coarse,
                        net_fine=tm_fine)
projector = TorchProjector('cpu')

t_src_rgbs = torch.from_numpy(src_rgbs)[None]
src_cameras_orig = torch.from_numpy(src_cams)[None].clone()
src_ray_batch = {
    'src_rgbs': t_src_rgbs,
    'src_cameras': src_cameras_orig.clone(),
    'src_depths': torch.from_numpy(src_depths)[None],
    'depth_range': torch.from_numpy(depth_range),
    'camera': torch.from_numpy(target_cam[None]),
    'rgb': torch.from_numpy(target_rgb.reshape(1, -1, 3)),
}
data = {
    'camera': torch.from_numpy(target_cam[None]),
    'rgb_path': ['synthetic.png'],
    'rgb': torch.from_numpy(target_rgb[None]),
    'depth': torch.from_numpy(tar_depth_half[None]),
    'src_depths': torch.from_numpy(src_depths_half)[None],
    'src_rgbs': t_src_rgbs,
    'src_cameras': src_cameras_orig.clone(),
    'depth_range': torch.from_numpy(depth_range),
}
lo = torch.zeros(1, dtype=torch.float64)
hi = torch.ones(1, dtype=torch.float64)

_sel_it = iter([s.copy() for s in sels])
delta_t = torch.from_numpy(delta0.copy()).requires_grad_(True)
rot_t = torch.from_numpy(rot0.copy()).requires_grad_(True)
trans_t = torch.from_numpy(trans0.copy()).requires_grad_(True)
opt = torch.optim.Adam([delta_t, rot_t, trans_t], lr=args.adam_lr)
sched = torch.optim.lr_scheduler.StepLR(opt, step_size=args.lr_step_size,
                                        gamma=args.lr_gamma)
ref_losses = []
for it in range(ITERS):
    rot_trans = ref_transform(src_cameras_orig, rot_t, trans_t, NSRC)
    rot_trans = rot_trans.reshape(-1, 12)
    src_ray_batch['src_cameras'] = torch.cat(
        [src_cameras_orig[:, :, :-16], rot_trans.unsqueeze(0),
         src_cameras_orig[:, :, -4:]], dim=2)
    loss, _ = ref_eval.optimize_adv_perturb(args, delta_t, model, projector,
                                            src_ray_batch, data,
                                            return_loss=True)
    opt.zero_grad()
    loss.backward()
    delta_t.grad.data *= -1
    rot_t.grad.data *= -1
    trans_t.grad.data *= -1
    opt.step()
    sched.step()
    delta_t.data = ref_eval.clamp(delta_t.data, torch.tensor(-EPS),
                                  torch.tensor(EPS))
    delta_t.data = ref_eval.clamp(delta_t.data, lo - t_src_rgbs,
                                  hi - t_src_rgbs)
    rot_t.data = ref_eval.clamp(rot_t.data, torch.tensor(-rot_eps_rad),
                                torch.tensor(rot_eps_rad))
    trans_t.data = ref_eval.clamp(trans_t.data, torch.tensor(-TRANS_EPS),
                                  torch.tensor(TRANS_EPS))
    ref_losses.append(float(loss))
ref_losses = np.array(ref_losses)
ref_delta = delta_t.detach().numpy()[0]
ref_rot = rot_t.detach().numpy()
ref_trans = trans_t.detach().numpy()

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
          'net_coarse': ibrnet_params_from_torch(tm_coarse.state_dict()),
          'net_fine': ibrnet_params_from_torch(tm_fine.state_dict())}
bundle = ModelBundle('ibrnet', ResUNet(), IBRNetAggregator(in_feat_ch=32),
                     IBRNetAggregator(in_feat_ch=32), params,
                     remat_features=False)
rcfg = RenderConfig(n_samples=NS, n_importance=NI, det=True,
                    backbone='ibrnet', inv_uniform=True,
                    compute_dtype='float64')
acfg = atk.AttackConfig(h=H, w=W, epsilon=8.0, use_adam=True, adam_lr=1e-3,
                        lr_step_size=args.lr_step_size, lr_gamma=args.lr_gamma,
                        n_rand=NRAND, adv_iters=ITERS,
                        camera_consistency_loss=0.1, cam_src2tar=1.0,
                        cam_tar2src=1.0, cam_depth=0.5, perturb_camera=True,
                        rot_epsilon=ROT_EPS_DEG, trans_epsilon=TRANS_EPS)

_jsel_it = iter([jnp.asarray(s) for s in sels])
atk.select_ray_indices = lambda key, cfg: next(_jsel_it)
step = atk.make_attack_step(bundle, rcfg, acfg)  # NOT jitted: pinned selection

target = {'camera': jnp.asarray(target_cam),
          'rgb': jnp.asarray(target_rgb.reshape(-1, 3)),
          'depth': jnp.asarray(tar_depth.reshape(-1)),
          'depth_full': jnp.asarray(tar_depth.reshape(-1)),
          'depth_range': jnp.asarray(depth_range)}
src = {'rgbs': jnp.asarray(src_rgbs), 'cameras': jnp.asarray(src_cams),
       'depths': jnp.asarray(src_depths), 'featmaps_clean': None}
state = atk.init_attack_state(jax.random.PRNGKey(0), acfg, src['rgbs'])
state['delta'] = jnp.asarray(delta0[0])
state['rot'] = jnp.asarray(rot0)
state['trans'] = jnp.asarray(trans0)
jax_losses = []
for it in range(ITERS):
    state, aux = step(state, target, src, jax.random.PRNGKey(100 + it))
    jax_losses.append(float(aux['loss']))
jax_losses = np.array(jax_losses)

dl = np.abs(ref_losses - jax_losses) / (np.abs(ref_losses) + 1e-12)
print('loss rel diffs jax-vs-ref :', np.array2string(dl, precision=2))

def cosine(a, b):
    a = np.asarray(a).ravel(); b = np.asarray(b).ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))

cos_d = cosine(state['delta'], ref_delta)
cos_r = cosine(state['rot'], ref_rot)
cos_t = cosine(state['trans'], ref_trans)
print(f'final cosines: delta={cos_d:.6f} rot={cos_r:.6f} trans={cos_t:.6f}')
print('rot(ref) :', np.array2string(ref_rot, precision=5))
print('rot(jax) :', np.array2string(np.asarray(state['rot']), precision=5))
assert dl[0] < 1e-7, dl[0]
assert dl[1] < 1e-6, dl[1]
assert cos_d > 0.95, cos_d
assert cos_r > 0.95, cos_r
assert cos_t > 0.95, cos_t
assert np.abs(np.asarray(state['delta'])).max() <= EPS + 1e-12
assert np.abs(np.asarray(state['rot'])).max() <= rot_eps_rad + 1e-12
print('OK')
"""


def test_camera_attack_trajectory_parity():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=2400,
    )
    assert res.returncode == 0, res.stdout[-4000:] + res.stderr[-4000:]
    assert "OK" in res.stdout
