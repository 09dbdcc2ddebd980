"""Purification defenses (GNT stack).

Matches /root/reference/eval/gnt/eval_adv.py:547-649,1080-1104: a *defensive*
perturbation ``purif`` is Adam-minimized (plain descent — no gradient negation)
on top of the frozen attack delta, with either a self-purification objective
(re-render one perturbed source view as the target and pull it toward its own
perturbed pixels) or a multi-view-consistency objective (pull the render toward
a GT-depth warp of a perturbed source view); finally ``delta += purif``. The
random-noise defense simply adds Gaussian noise to delta.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from nerfool_tpu.attack import losses as L
from nerfool_tpu.attack.attack import AttackConfig, select_ray_indices
from nerfool_tpu.attack.perturb import clamp
from nerfool_tpu.attack.warp import forward_warp
from nerfool_tpu.render.render_rays import RenderConfig, render_rays
from nerfool_tpu.utils.cameras import get_rays


@dataclasses.dataclass(frozen=True)
class PurifyConfig:
    h: int
    w: int
    purif_epsilon: float = 8.0  # /255
    purif_iters: int = 100
    adam_lr: float = 1e-3
    lr_step_size: int = 100
    lr_gamma: float = 0.5
    n_rand: int = 512
    sample_mode: str = "uniform"
    center_ratio: float = 0.8
    use_patch_sampling: bool = False
    patch_size: int = 8
    use_self_purification: bool = True
    purif_consistency_loss: float = 0.0

    @property
    def eps(self):
        return self.purif_epsilon / 255.0


def make_purify_step(bundle, render_cfg: RenderConfig, cfg: PurifyConfig):
    """step(state, target, src, delta, key) -> (state, aux)

    ``src['rgbs']`` are the clean sources; ``delta`` is the frozen attack
    perturbation. target carries the current train view (camera/rgb/depth_full);
    under self-purification the rendered target is swapped for a random
    perturbed source view in-graph.
    """
    modules = bundle.modules
    params = bundle.render_params
    schedule = optax.exponential_decay(
        cfg.adam_lr, cfg.lr_step_size, cfg.lr_gamma, staircase=True
    )
    opt = optax.adam(schedule)
    sel_cfg = AttackConfig(
        h=cfg.h, w=cfg.w, n_rand=cfg.n_rand, sample_mode=cfg.sample_mode,
        center_ratio=cfg.center_ratio, use_patch_sampling=cfg.use_patch_sampling,
        patch_size=cfg.patch_size,
    )

    def init_state(key, src_rgbs, delta):
        purif = jax.random.uniform(
            key, src_rgbs.shape, src_rgbs.dtype, minval=-cfg.eps, maxval=cfg.eps
        )
        purif = clamp(purif, -(src_rgbs + delta), 1.0 - (src_rgbs + delta))
        return {"purif": purif, "opt_state": opt.init(purif)}

    def loss_fn(purif, target, src, delta, sel, k_view, key):
        src_rgbs = src["rgbs"]
        perturbed = src_rgbs + delta
        src_id = jax.random.randint(k_view, (), 0, src_rgbs.shape[0])

        if cfg.use_self_purification:
            cam = src["cameras"][src_id]
            gt_full = perturbed[src_id].reshape(-1, 3)
        else:
            cam = target["camera"]
            gt_full = target["rgb"]

        feats = bundle.extract_features(perturbed + purif)
        intr = cam[2:18].reshape(4, 4)
        c2w = cam[18:34].reshape(4, 4)
        rays_o, rays_d = get_rays(cfg.h, cfg.w, intr, c2w)
        batch = {
            "ray_o": rays_o[sel], "ray_d": rays_d[sel],
            "depth_range": target["depth_range"], "camera": cam[None],
        }
        ret = render_rays(
            params, modules, batch, feats, render_cfg,
            src_rgbs=src_rgbs, src_cameras=src["cameras"], key=key,
        )
        terms = {}
        if cfg.use_self_purification:
            r = L.rgb_criterion(ret["outputs_coarse"], gt_full[sel])
            if ret["outputs_fine"] is not None:
                r = r + L.rgb_criterion(ret["outputs_fine"], gt_full[sel])
            terms["rgb"] = r
        if cfg.purif_consistency_loss > 0:
            k_src = jax.random.fold_in(k_view, 1)
            sid = jax.random.randint(k_src, (), 0, src_rgbs.shape[0])
            s_cam = src["cameras"][sid]
            _, _, rgb_src2tar, _ = forward_warp(
                sel, perturbed[sid], src["depths"][sid],
                s_cam[2:18].reshape(4, 4)[:3, :3], s_cam[18:34].reshape(4, 4),
                intr[:3, :3], c2w, src2tar=True,
            )
            cc = L.smooth_l1(ret["outputs_coarse"]["rgb"], rgb_src2tar, rgb_src2tar > 0)
            if ret["outputs_fine"] is not None:
                cc = cc + L.smooth_l1(ret["outputs_fine"]["rgb"], rgb_src2tar,
                                      rgb_src2tar > 0)
            terms["camera_cons"] = cfg.purif_consistency_loss * cc
        return sum(terms.values()), terms

    def step(state, target, src, delta, key):
        k_sel, k_view, k_render = jax.random.split(key, 3)
        sel = select_ray_indices(k_sel, sel_cfg)
        (loss, terms), grad = jax.value_and_grad(loss_fn, has_aux=True)(
            state["purif"], target, src, delta, sel, k_view, k_render
        )
        updates, opt_state = opt.update(grad, state["opt_state"], state["purif"])
        purif = optax.apply_updates(state["purif"], updates)
        purif = clamp(purif, -cfg.eps, cfg.eps)
        base = src["rgbs"] + delta
        purif = clamp(purif, -base, 1.0 - base)
        return {"purif": purif, "opt_state": opt_state}, {"loss": loss, **terms}

    return init_state, step


def apply_random_noise_defense(key, delta, noise_std_255: float):
    """--def_random_noise: add Gaussian noise (std/255) to the perturbation."""
    return delta + jax.random.normal(key, delta.shape, delta.dtype) * (
        noise_std_255 / 255.0
    )
