"""Oracle trajectory parity for ADVERSARIAL TRAINING's inner PGD loop
(/root/reference/train.py:120-158) vs trainer.adv_perturb_sources, float64,
pinned ray selection and delta init, det=True. The reference loop per
iteration: featmaps from (src+delta), render the target ray batch, masked-MSE
criterion on coarse(+fine), sign-PGD ascent at adv_lr/255, then eps-ball and
image-box clamps — no geo_noise and no depth_var in the inner loss (those are
outer-step-only, train.py:162-190).
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
sys.path.insert(0, 'tests')
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np, torch, jax.numpy as jnp
from types import SimpleNamespace
from helpers import synthetic_scene

torch.Tensor.cuda = lambda self, *a, **k: self
torch.manual_seed(21)
torch.set_default_dtype(torch.float64)
rng = np.random.RandomState(55)
H, W, NS, NRAND, ITERS = 24, 32, 10, 40, 5
EPS = 8.0 / 255
ALPHA = 2.0 / 255
target_cam, src_rgbs, src_cams, _, depth_range = synthetic_scene(rng, n_src=2, h=H, w=W)
target_cam = target_cam.astype(np.float64); src_rgbs = src_rgbs.astype(np.float64)
src_cams = src_cams.astype(np.float64); depth_range = depth_range.astype(np.float64)
target_rgb = rng.rand(H, W, 3).astype(np.float64)
delta0 = ((rng.rand(2, H, W, 3) * 2 - 1) * EPS)
delta0 = np.clip(delta0, -src_rgbs, 1.0 - src_rgbs)
sel = rng.choice(H * W, NRAND, replace=False)

# ---------------- reference side ----------------
from ibrnet.feature_network import ResUNet as TorchResUNet
from ibrnet.mlp_network import IBRNet as TorchIBRNet
from ibrnet.projection import Projector as TorchProjector
from ibrnet.render_ray import render_rays as torch_render_rays
from ibrnet.criterion import Criterion
import ibrnet.sample_ray as sample_ray_mod

_RS = sample_ray_mod.RaySamplerSingleImage
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
_RS.sample_random_pixel = lambda self, N_rand, sample_mode, center_ratio: sel.copy()

tm_feat = TorchResUNet().double().eval()
tm_net = TorchIBRNet(SimpleNamespace(anti_alias_pooling=1), in_feat_ch=32,
                     n_samples=NS).double().eval()
model = SimpleNamespace(feature_net=tm_feat, net_coarse=tm_net, net_fine=None)
projector = TorchProjector('cpu')
criterion = Criterion()
data = {
    'camera': torch.from_numpy(np.array(target_cam[None])),
    'rgb_path': ['synthetic.png'],
    'rgb': torch.from_numpy(np.array(target_rgb[None])),
    'src_rgbs': torch.from_numpy(np.array(src_rgbs))[None],
    'src_cameras': torch.from_numpy(np.array(src_cams))[None],
    'depth_range': torch.from_numpy(np.array(depth_range)),
}
ray_sampler = _RS(data, 'cpu')
ray_batch = ray_sampler.random_sample(NRAND, sample_mode='uniform', center_ratio=0.8)

# transcription of the inner PGD loop, train.py:120-158
args = SimpleNamespace(N_samples=NS, N_importance=0, inv_uniform=False,
                       white_bkgd=False, det=True)
delta = torch.from_numpy(delta0.copy())[None]
delta.requires_grad = True
losses_ref = []
for _ in range(ITERS):
    featmaps = tm_feat((ray_batch['src_rgbs'] + delta).squeeze(0).permute(0, 3, 1, 2))
    ret = torch_render_rays(ray_batch=ray_batch, model=model, projector=projector,
                            featmaps=featmaps, N_samples=NS, inv_uniform=False,
                            N_importance=0, det=True, white_bkgd=False, args=args)
    loss, _ = criterion(ret['outputs_coarse'], ray_batch, {})
    losses_ref.append(float(loss))
    loss.backward()
    grad = delta.grad.detach()
    delta.data = delta.data + ALPHA * torch.sign(grad)
    delta.grad.zero_()
    delta.data = torch.clamp(delta.data, -EPS, EPS)
    delta.data = torch.max(torch.min(delta.data, 1.0 - ray_batch['src_rgbs']),
                           -ray_batch['src_rgbs'])
d_ref = delta.detach().numpy()[0]
print('ref losses:', losses_ref)

# ---------------- jax side ----------------
from nerfool_tpu.models.bundle import ModelBundle
from nerfool_tpu.models.ibrnet import IBRNetAggregator
from nerfool_tpu.models.resunet import ResUNet
from nerfool_tpu.models.torch_port import (
    ibrnet_params_from_torch, resunet_params_from_torch,
)
from nerfool_tpu.render.render_rays import RenderConfig
from nerfool_tpu.train.trainer import TrainConfig, make_train_step

params = {'feature_net': resunet_params_from_torch(tm_feat.state_dict()),
          'net_coarse': ibrnet_params_from_torch(tm_net.state_dict())}
bundle = ModelBundle('ibrnet', ResUNet(), IBRNetAggregator(in_feat_ch=32),
                     None, params, remat_features=False)
rcfg = RenderConfig(n_samples=NS, det=True, backbone='ibrnet',
                    compute_dtype='float64')
tcfg = TrainConfig(h=H, w=W, n_rand=NRAND, use_adv_train=True,
                   adv_iters=ITERS, epsilon=8.0, adv_lr=2.0)
step, _ = make_train_step(bundle, rcfg, tcfg)

batch = {'camera': jnp.asarray(target_cam),
         'rgb': jnp.asarray(target_rgb.reshape(-1, 3)),
         'depth_range': jnp.asarray(depth_range),
         'src_rgbs': jnp.asarray(src_rgbs),
         'src_cameras': jnp.asarray(src_cams)}

# pin the delta init to the reference's
jax.random.uniform = lambda *a, **k: jnp.asarray(delta0)
# step-1 loss parity
l1 = float(step.render_loss(params, batch['src_rgbs'] + jnp.asarray(delta0),
                            batch, jnp.asarray(sel), jax.random.PRNGKey(0),
                            inner=True)[0])
rel = abs(l1 - losses_ref[0]) / abs(losses_ref[0])
print(f'step-1 loss: ref={losses_ref[0]:.12f} jax={l1:.12f} rel={rel:.2e}')
assert rel < 1e-7, (l1, losses_ref[0])

d_jax = np.asarray(step.adv_perturb_sources(params, batch, jnp.asarray(sel),
                                            jax.random.PRNGKey(0)))
cos = float(np.sum(d_ref * d_jax)
            / (np.linalg.norm(d_ref) * np.linalg.norm(d_jax)))
mismatch = float(np.mean(np.abs(d_ref - d_jax) > 1e-9))
print(f'final delta: cosine={cos:.8f} mismatch_frac={mismatch:.5f}')
assert cos > 0.9999, cos
assert mismatch < 0.01, mismatch
print('OK')
"""


def test_adv_train_inner_loop_parity():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1200,
    )
    assert res.returncode == 0, res.stdout[-4000:] + res.stderr[-4000:]
    assert "OK" in res.stdout
