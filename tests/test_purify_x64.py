"""Purification-defense TRAJECTORY parity vs the reference oracle.

Runs N Adam purification iterations of the reference's GNT loop —
optimize_purif (/root/reference/eval/gnt/eval_adv.py:547-649) plus the
main-loop update/clamp (:1071-1102) — against N iterations of the jax
purify step, in float64 with pinned ray selections, a single source view
(so the reference's rng.choice view pick is trivially deterministic), an
identical purif init, and a frozen attack delta. Self-purification mode
(the rgb objective).

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
sys.path.insert(0, '/root/reference/eval/gnt')
sys.path.insert(0, 'tests')
import ref_stubs; ref_stubs.install()
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np, torch, jax.numpy as jnp
from types import SimpleNamespace
from helpers import synthetic_scene

torch.manual_seed(11)
torch.set_default_dtype(torch.float64)
rng = np.random.RandomState(77)
H, W, NSRC, NS, NRAND, ITERS, DEPTH = 24, 32, 1, 12, 32, 10, 2
EPS = 8.0 / 255
target_cam, src_rgbs, src_cams, _, depth_range = synthetic_scene(rng, n_src=NSRC, h=H, w=W)
target_cam = target_cam.astype(np.float64); src_rgbs = src_rgbs.astype(np.float64)
src_cams = src_cams.astype(np.float64); depth_range = depth_range.astype(np.float64)
target_rgb = rng.rand(H, W, 3).astype(np.float64)
# smooth positive gt depths inside the depth range (needed by load_gt_depth)
yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
tar_depth = (3.0 + np.sin(xx / 7.0) + 0.5 * np.cos(yy / 5.0)).astype(np.float64)
src_depths = np.stack([
    3.0 + np.cos(xx / 6.0 + i) + 0.4 * np.sin(yy / 4.0) for i in range(NSRC)
]).astype(np.float64)
delta_frozen = ((rng.rand(1, NSRC, H, W, 3) * 2 - 1) * EPS).astype(np.float64)
delta_frozen = np.clip(delta_frozen, -src_rgbs[None], 1.0 - src_rgbs[None])
purif0 = ((rng.rand(1, NSRC, H, W, 3) * 2 - 1) * EPS).astype(np.float64)
purif0 = np.clip(purif0, -(src_rgbs[None] + delta_frozen),
                 1.0 - (src_rgbs[None] + delta_frozen))
sels = [rng.choice(H * W, NRAND, replace=False) for _ in range(ITERS)]

# ---------------- reference side ----------------
from gnt.feature_network import ResUNet as TorchResUNet
from gnt.transformer_network import GNT as TorchGNT
from gnt.projection import Projector as TorchProjector
from gnt.criterion import Criterion
import gnt.sample_ray as sample_ray_mod
import eval_adv as ref_eval

tm_feat = TorchResUNet(coarse_out_ch=32, fine_out_ch=32,
                       single_net=True).double().eval()
gargs = SimpleNamespace(trans_depth=DEPTH, netwidth=64)
tm_net = TorchGNT(gargs, in_feat_ch=32, posenc_dim=63, viewenc_dim=63,
                  ret_alpha=True).double().eval()

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
    N_samples=NS, N_importance=0, inv_uniform=True, white_bkgd=False,
    det=True, ret_alpha=True, adam_lr=1e-3, lr_step_size=5, lr_gamma=0.5,
    purif_epsilon=8, purif_iters=ITERS, purif_lr=1,
    use_self_purification=True, purif_consistency_loss=0.0,
    num_source_views=NSRC,
)
model = SimpleNamespace(feature_net=tm_feat, net_coarse=tm_net, net_fine=None)
projector = TorchProjector('cpu')

t_src_rgbs = torch.from_numpy(src_rgbs)[None]
src_ray_batch = {
    'src_rgbs': t_src_rgbs,
    'src_cameras': torch.from_numpy(src_cams)[None],
    'src_depths': torch.from_numpy(src_depths)[None],
    'depth_range': torch.from_numpy(depth_range),
    'camera': torch.from_numpy(target_cam[None]),
    'rgb': torch.from_numpy(target_rgb.reshape(1, -1, 3)),
}
data = {
    'camera': torch.from_numpy(target_cam[None]),
    'rgb_path': ['synthetic.png'],
    'rgb': torch.from_numpy(target_rgb[None]),
    'depth': torch.from_numpy(tar_depth[None]),
    'src_depths': torch.from_numpy(src_depths)[None],
    'src_rgbs': t_src_rgbs,
    'src_cameras': torch.from_numpy(src_cams)[None],
    'depth_range': torch.from_numpy(depth_range),
}
lo = torch.zeros(1, dtype=torch.float64)
hi = torch.ones(1, dtype=torch.float64)
t_delta = torch.from_numpy(delta_frozen.copy())

_sel_it = iter([s.copy() for s in sels])
purif_t = torch.from_numpy(purif0.copy()).requires_grad_(True)
opt = torch.optim.Adam([purif_t], lr=args.adam_lr)
sched = torch.optim.lr_scheduler.StepLR(opt, step_size=args.lr_step_size,
                                        gamma=args.lr_gamma)
ref_losses = []
for it in range(ITERS):
    loss, _ = ref_eval.optimize_purif(args, purif_t, t_delta, model,
                                      projector, src_ray_batch, data,
                                      self_purification=True)
    opt.zero_grad()
    loss.backward()
    opt.step()
    sched.step()
    purif_t.data = ref_eval.clamp(purif_t.data, torch.tensor(-EPS),
                                  torch.tensor(EPS))
    purif_t.data = ref_eval.clamp(purif_t.data, lo - (t_src_rgbs + t_delta),
                                  hi - (t_src_rgbs + t_delta))
    ref_losses.append(float(loss))
ref_losses = np.array(ref_losses)
ref_purif = purif_t.detach().numpy()[0]

# ---------------- jax side ----------------
from nerfool_tpu.models.bundle import ModelBundle
from nerfool_tpu.models.gnt import GNTAggregator
from nerfool_tpu.models.resunet import ResUNet
from nerfool_tpu.models.torch_port import (
    gnt_params_from_torch, resunet_params_from_torch,
)
from nerfool_tpu.render.render_rays import RenderConfig
from nerfool_tpu.attack import purify as P

params = {'feature_net': resunet_params_from_torch(tm_feat.state_dict()),
          'net_coarse': gnt_params_from_torch(tm_net.state_dict(),
                                              trans_depth=DEPTH)}
bundle = ModelBundle(
    'gnt', ResUNet(single_net=True),
    GNTAggregator(in_feat_ch=32, netwidth=64, trans_depth=DEPTH,
                  ret_alpha=True),
    None, params, remat_features=False,
)
rcfg = RenderConfig(n_samples=NS, det=True, backbone='gnt', single_net=True,
                    ret_alpha=True, inv_uniform=True, compute_dtype='float64')
pcfg = P.PurifyConfig(h=H, w=W, purif_epsilon=8.0, purif_iters=ITERS,
                      adam_lr=1e-3, lr_step_size=args.lr_step_size,
                      lr_gamma=args.lr_gamma, n_rand=NRAND,
                      use_self_purification=True, purif_consistency_loss=0.0)

_jsel_it = iter([jnp.asarray(s) for s in sels])
P.select_ray_indices = lambda key, cfg: next(_jsel_it)
init_state, step = P.make_purify_step(bundle, rcfg, pcfg)

target = {'camera': jnp.asarray(target_cam),
          'rgb': jnp.asarray(target_rgb.reshape(-1, 3)),
          'depth_range': jnp.asarray(depth_range)}
src = {'rgbs': jnp.asarray(src_rgbs), 'cameras': jnp.asarray(src_cams),
       'depths': jnp.asarray(src_depths)}
delta_j = jnp.asarray(delta_frozen[0])
state = init_state(jax.random.PRNGKey(0), src['rgbs'], delta_j)
state['purif'] = jnp.asarray(purif0[0])
state['opt_state'] = None
import optax
schedule = optax.exponential_decay(pcfg.adam_lr, pcfg.lr_step_size,
                                   pcfg.lr_gamma, staircase=True)
state['opt_state'] = optax.adam(schedule).init(state['purif'])
jax_losses = []
for it in range(ITERS):
    state, aux = step(state, target, src, delta_j, jax.random.PRNGKey(200 + it))
    jax_losses.append(float(aux['loss']))
jax_losses = np.array(jax_losses)
jax_purif = np.asarray(state['purif'])

dl = np.abs(ref_losses - jax_losses) / (np.abs(ref_losses) + 1e-12)
print('purif loss rel diffs:', np.array2string(dl, precision=2))

def cosine(a, b):
    a = a.ravel(); b = b.ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))

cos = cosine(jax_purif, ref_purif)
print(f'final purif cos: {cos:.6f}')
assert dl[0] < 1e-7, dl[0]
assert dl[1] < 1e-6, dl[1]
assert cos > 0.95, cos
assert np.abs(jax_purif).max() <= EPS + 1e-12
print('OK')
"""


def test_purification_trajectory_parity():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=2400,
    )
    assert res.returncode == 0, res.stdout[-4000:] + res.stderr[-4000:]
    assert "OK" in res.stdout
