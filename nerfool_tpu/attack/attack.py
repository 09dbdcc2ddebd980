"""The attack step: one jitted gradient-ascent update on the perturbation.

TPU-first restructuring of the reference attack loop
(/root/reference/eval/ibrnet/eval_adv.py:258-519,650-740,796-843): the whole
iteration — ray subset selection, feature re-extraction from the perturbed
sources, rendering, the multi-loss objective, backprop to delta (and camera
parameters), the Adam/sign-PGD update and the eps-ball/box projection — is one
pure function. View-specific attacks run it under lax.scan; the universal
attack drives it from a thin host loop that streams target views.

Gradient ascent is expressed exactly as the reference does it: negate the
gradient and feed a standard (descending) optimizer.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from nerfool_tpu.attack import losses as L
from nerfool_tpu.attack.pcgrad import pcgrad_combine
from nerfool_tpu.attack.perturb import clamp, init_delta, project_delta
from nerfool_tpu.render.render_rays import RenderConfig, render_rays
from nerfool_tpu.utils.cameras import get_rays_at, transform_src_cameras


@dataclasses.dataclass(frozen=True)
class AttackConfig:
    """Static attack configuration. Field names track the reference CLI flags
    (/root/reference/config.py:116-221); epsilon / adv_lr are in /255 units."""

    h: int
    w: int
    epsilon: float = 8.0
    adv_lr: float = 2.0
    adv_iters: int = 100
    use_adam: bool = False
    adam_lr: float = 1e-3
    lr_step_size: int = 100
    lr_gamma: float = 0.5
    n_rand: int = 512
    sample_mode: str = "uniform"  # 'uniform' | 'center'
    center_ratio: float = 0.8
    use_patch_sampling: bool = False
    patch_size: int = 8
    use_pseudo_gt: bool = False
    # loss weights (0 = disabled), matching the reference flags
    density_loss: float = 0.0
    depth_var_loss: float = 0.0
    depth_diff_loss: float = 0.0
    depth_smooth_loss: float = 0.0
    depth_consistency_loss: float = 0.0  # Sin-NeRF-style src->tar depth warp
    ds_rgb: bool = False  # depth-consistency at reduced (native depth) resolution
    # consistency-render scale under ds_rgb. The reference's
    # RaySamplerSingleImage takes a general resize_factor (sample_ray.py:78-83,
    # rescaling H/W, intrinsics and rgb); its evaluators instantiate it with
    # 0.5 (eval_adv.py:354,397) — the default here.
    resize_factor: float = 0.5
    camera_consistency_loss: float = 0.0  # bidirectional rgb/depth warps
    cam_src2tar: float = 0.0
    cam_tar2src: float = 0.0
    cam_depth: float = 0.0
    perturb_camera_no_detach: bool = False
    # gradient surgery
    use_pcgrad: bool = False
    major_loss: str = ""
    # camera-pose attack
    perturb_camera: bool = False
    perturb_camera_no_opt: bool = False
    zero_camera_init: bool = False
    rot_epsilon: float = 10.0  # degrees
    trans_epsilon: float = 0.1

    @property
    def eps(self):
        return self.epsilon / 255.0

    @property
    def alpha(self):
        return self.adv_lr / 255.0

    @property
    def rot_eps_rad(self):
        import math

        return self.rot_epsilon / 180.0 * math.pi

    def enabled_losses(self):
        names = ["rgb"]
        if self.density_loss > 0:
            names.append("density")
        if self.depth_var_loss > 0:
            names.append("depth_var")
        if self.depth_diff_loss > 0:
            names.append("depth_diff")
        if self.depth_consistency_loss > 0:
            names.append("depth_cons")
        if self.depth_smooth_loss > 0:
            names.append("depth_smooth")
        if self.camera_consistency_loss > 0:
            names.append("camera_cons")
        return names


def nearest_resize_indices(n_out, n_in, rf):
    """Row map of torch's F.interpolate(scale_factor=rf, mode='nearest') —
    the resize the reference applies to rgb under a general resize_factor
    (sample_ray.py:83, eval_adv.py:399). scale_factor-based nearest reads
    input index floor(i / rf) (NOT the floor(i * n_in/n_out) a size-based
    call would use — they differ at e.g. rf=0.75)."""
    return jnp.minimum((jnp.arange(n_out) / rf).astype(jnp.int32), n_in - 1)


def select_ray_indices(key, cfg: AttackConfig):
    """Random ray-subset selection, in-graph.

    uniform: n_rand distinct pixels; center: distinct pixels within the central
    center_ratio box; patch: n_patches random patch_size^2 blocks (reference
    sample_ray.py:132-152,190-236). Distinctness uses a key-derived random-order
    top-k, equivalent in distribution to the reference's numpy choice
    (replace=False).
    """
    h, w = cfg.h, cfg.w
    if cfg.use_patch_sampling:
        p = cfg.patch_size
        n_patches = cfg.n_rand // (p ** 2)
        kx, ky = jax.random.split(key)
        x0 = jax.random.randint(kx, (n_patches, 1), 0, h - p + 1)  # row anchor
        y0 = jax.random.randint(ky, (n_patches, 1), 0, w - p + 1)  # col anchor
        # within-patch enumeration: row offset varies fastest (matches the
        # reference's np.meshgrid(..., indexing='xy') flattening, so the
        # depth-smooth [n,p,p] reshape sees the same pixel order)
        dr = jnp.tile(jnp.arange(p), p)[None]
        dc = jnp.repeat(jnp.arange(p), p)[None]
        return ((y0 + dc) + w * (x0 + dr)).reshape(-1)
    if cfg.sample_mode == "center":
        bh = int(h * (1 - cfg.center_ratio) / 2.0)
        bw = int(w * (1 - cfg.center_ratio) / 2.0)
        hh = h - 2 * bh
        ww = w - 2 * bw
        scores = jax.random.uniform(key, (hh * ww,))
        _, sel = jax.lax.top_k(scores, cfg.n_rand)
        u = sel // ww + bh  # row in full image
        v = sel % ww + bw
        return v + w * u
    scores = jax.random.uniform(key, (h * w,))
    _, sel = jax.lax.top_k(scores, cfg.n_rand)
    return sel


def make_optimizer(cfg: AttackConfig):
    if not cfg.use_adam:
        return None
    schedule = optax.exponential_decay(
        init_value=cfg.adam_lr,
        transition_steps=cfg.lr_step_size,
        decay_rate=cfg.lr_gamma,
        staircase=True,
    )
    return optax.adam(schedule)


def init_attack_state(key, cfg: AttackConfig, src_rgbs):
    """Build the attack-state pytree: delta, camera params, optimizer state."""
    kd, kr, kt = jax.random.split(key, 3)
    delta = init_delta(kd, src_rgbs, cfg.eps)
    if cfg.perturb_camera:
        if cfg.zero_camera_init:
            rot = jnp.zeros((src_rgbs.shape[0], 3))
            trans = jnp.zeros((src_rgbs.shape[0], 3))
        else:
            rot = jax.random.uniform(
                kr, (src_rgbs.shape[0], 3), minval=-cfg.rot_eps_rad, maxval=cfg.rot_eps_rad
            )
            trans = jax.random.uniform(
                kt, (src_rgbs.shape[0], 3), minval=-cfg.trans_epsilon, maxval=cfg.trans_epsilon
            )
    else:
        rot = jnp.zeros((src_rgbs.shape[0], 3))
        trans = jnp.zeros((src_rgbs.shape[0], 3))
    opt = make_optimizer(cfg)
    opt_state = opt.init((delta, rot, trans)) if opt is not None else ()
    return {"delta": delta, "rot": rot, "trans": trans, "opt_state": opt_state,
            "step": jnp.zeros((), jnp.int32)}


def make_attack_step(bundle, render_cfg: RenderConfig, cfg: AttackConfig,
                     ray_sharding=None):
    """Build the pure attack step.

    step(state, target, src, key) -> (state, aux)
      target: {'camera' [34], 'rgb' [H*W, 3] or None, 'depth' [H*W] or None,
               'depth_range' [1,2]}
      src:    {'rgbs' [V,Hs,Ws,3], 'cameras' [V,34],
               'featmaps_clean': (coarse, fine) or None}

    ``ray_sharding``: optional NamedSharding splitting the ray axis over the
    mesh — the sampled ray batch is shard-constrained so each chip shades
    n_rand/n_chips rays and GSPMD psums the delta gradient over ICI (the
    TPU-native replacement for the reference's DDP all-reduce).
    """
    modules = bundle.modules
    params = bundle.render_params
    feature_params = bundle.params["feature_net"]
    opt = make_optimizer(cfg)
    loss_names = cfg.enabled_losses()
    # fused rgb+feat superrows lose inside the attack step: the constant RGB
    # patch block would be repacked every iteration (n_rand-ray batches gather
    # too few rows to amortize it; measured +90 ms/iter on v5e) — whole-frame
    # eval renders keep the fused tables
    render_cfg = dataclasses.replace(render_cfg, fuse_rgb_rows=False)
    gt_cfg = dataclasses.replace(render_cfg, det=True, geo_noise=0.0)
    # auxiliary renders (ds_rgb half-res consistency, dedicated depth-smooth
    # patch batch) ray-sample DIFFERENT cameras/batches than the planned
    # main rays — keep them on the per-tap gather
    aux_cfg = dataclasses.replace(render_cfg, spg_specs=None)

    def render_subset(net_params, feats, target, src_cams, src_rgbs, sel, rcfg, key):
        intr = target["camera"][2:18].reshape(4, 4)
        c2w = target["camera"][18:34].reshape(4, 4)
        rays_o, rays_d = get_rays_at(sel, cfg.w, intr, c2w)
        batch = {
            "ray_o": rays_o,
            "ray_d": rays_d,
            "depth_range": target["depth_range"],
            "camera": target["camera"][None],
        }
        if ray_sharding is not None:
            for k in ("ray_o", "ray_d"):
                batch[k] = jax.lax.with_sharding_constraint(batch[k], ray_sharding)
        return render_rays(
            net_params, modules, batch, feats, rcfg,
            src_rgbs=src_rgbs, src_cameras=src_cams, key=key,
        )

    def compute_losses(delta, rot, trans, target, src, sel, key):
        src_rgbs = src["rgbs"]
        if cfg.perturb_camera:
            src_cams = transform_src_cameras(src["cameras"], rot, trans)
        else:
            src_cams = src["cameras"]

        perturbed = src_rgbs + delta
        if ray_sharding is not None:
            # the feature net is per-view independent (InstanceNorm normalizes
            # per instance), so its conv fwd+bwd — the attack step's dominant
            # cost on one chip — shards EXACTLY over the view axis on the same
            # mesh axis the rays use; GSPMD all-gathers the (small) featmaps
            # for the ray gathers and reduce-scatters their backward
            perturbed = jax.lax.with_sharding_constraint(perturbed, ray_sharding)
        feats = bundle.extract_features(perturbed, params=feature_params)
        if ray_sharding is not None:
            rep = jax.sharding.NamedSharding(
                ray_sharding.mesh, jax.sharding.PartitionSpec()
            )
            feats = tuple(
                jax.lax.with_sharding_constraint(f, rep) for f in feats
            )

        # NOTE (reference semantics, eval_adv.py:292-304): delta reaches the
        # renderer only through the feature maps — the projector's RGB gather
        # stays on the *clean* source pixels (src_ray_batch is never perturbed).
        ret = render_subset(params, feats, target, src_cams, src_rgbs,
                            sel, render_cfg, key)

        if cfg.use_pseudo_gt:
            feats_clean = src["featmaps_clean"]
            ret_gt = render_subset(
                params, feats_clean, target, src_cams, src_rgbs, sel, gt_cfg, key
            )
            ret_gt = jax.lax.stop_gradient(ret_gt)
            top_gt = ret_gt["outputs_fine"] or ret_gt["outputs_coarse"]
            gt_rgb = top_gt["rgb"]
            gt_depth = top_gt["depth"]
        else:
            ret_gt = None
            gt_rgb = target["rgb"][sel]
            gt_depth = target["depth"][sel] if target.get("depth") is not None else None

        terms = {}
        loss_rgb = L.rgb_criterion(ret["outputs_coarse"], gt_rgb)
        if ret["outputs_fine"] is not None:
            loss_rgb = loss_rgb + L.rgb_criterion(ret["outputs_fine"], gt_rgb)
        terms["rgb"] = loss_rgb

        if cfg.density_loss > 0:
            assert cfg.use_pseudo_gt, "density loss requires pseudo-GT"
            d = L.density_loss(ret["outputs_coarse"], ret_gt["outputs_coarse"])
            if ret["outputs_fine"] is not None:
                d = d + L.density_loss(ret["outputs_fine"], ret_gt["outputs_fine"])
            terms["density"] = cfg.density_loss * d

        if cfg.depth_var_loss > 0:
            v = L.depth_var_loss(ret["outputs_coarse"])
            if ret["outputs_fine"] is not None:
                v = v + L.depth_var_loss(ret["outputs_fine"])
            terms["depth_var"] = cfg.depth_var_loss * v

        if cfg.depth_diff_loss > 0:
            dd = L.depth_diff_loss(ret["outputs_coarse"], gt_depth)
            if ret["outputs_fine"] is not None:
                dd = dd + L.depth_diff_loss(ret["outputs_fine"], gt_depth)
            terms["depth_diff"] = cfg.depth_diff_loss * dd

        if cfg.depth_consistency_loss > 0:
            # warp one random source view's GT depth into the target and pull
            # the rendered depth toward it (eval_adv.py:350-436). Without
            # ds_rgb, depths are pre-upsampled to rgb resolution by the data
            # pipeline and the main render's rays are reused; with ds_rgb a
            # second render runs at half (native depth) resolution.
            from nerfool_tpu.attack.warp import forward_warp

            k_src = jax.random.fold_in(key, 17)
            src_id = jax.random.randint(k_src, (), 0, src_cams.shape[0])
            src_cam = src_cams[src_id]
            tar_cam = target["camera"]

            if cfg.ds_rgb:
                # reduced-res target camera: hw and intrinsics scaled by
                # resize_factor (reference sample_ray.py:78-83)
                rf = cfg.resize_factor
                hh, ww = int(cfg.h * rf), int(cfg.w * rf)
                intr = tar_cam[2:18].reshape(4, 4)
                intr = intr.at[:2, :3].multiply(rf)
                tar_hw = jnp.concatenate(
                    [jnp.array([hh, ww], tar_cam.dtype), intr.reshape(-1),
                     tar_cam[18:34]]
                )
                k_sel2 = jax.random.fold_in(key, 19)
                # half-res ray selection mirrors the main batch's mode
                # (random_sample OR random_patch_sample at the cons
                # resolution, eval_adv.py:356-360)
                half_cfg = dataclasses.replace(cfg, h=hh, w=ww)
                sel_c = select_ray_indices(k_sel2, half_cfg)
                t2 = dict(target, camera=tar_hw)
                # half-res render with the same perturbed features
                intr_full = tar_hw[2:18].reshape(4, 4)
                c2w = tar_hw[18:34].reshape(4, 4)
                rays_o, rays_d = get_rays_at(sel_c, ww, intr_full, c2w)
                rb = {
                    "ray_o": rays_o, "ray_d": rays_d,
                    "depth_range": target["depth_range"], "camera": tar_hw[None],
                }
                ret_cons = render_rays(
                    params, modules, rb, feats, aux_cfg,
                    src_rgbs=src_rgbs, src_cameras=src_cams, key=key,
                )
                sel_used, tar_cam_used = sel_c, tar_hw
            else:
                ret_cons, sel_used, tar_cam_used = ret, sel, tar_cam

            if cfg.ds_rgb:
                # nearest-downsample to depth resolution, exactly the
                # reference's F.interpolate(scale_factor=rf) default-nearest
                # (eval_adv.py:397-399): out pixel i reads in pixel
                # floor(i * in/out) (= 2i at rf=0.5)
                full = src_rgbs[src_id]
                rgb_ref = full[nearest_resize_indices(hh, full.shape[0], rf)][
                    :, nearest_resize_indices(ww, full.shape[1], rf)]
            else:
                rgb_ref = src_rgbs[src_id]
            rgb_ref = rgb_ref[: src["depths"].shape[1], : src["depths"].shape[2]]
            _, _, rgb_proj, depth_proj = forward_warp(
                sel_used,
                rgb_ref,
                src["depths"][src_id],
                # ds_rgb scales the ref intrinsics' first two rows by
                # resize_factor (eval_adv.py:397-398); [2,2] stays 1
                src_cam[2:18].reshape(4, 4)[:3, :3]
                * (cfg.resize_factor if cfg.ds_rgb else 1.0)
                + (jnp.diag(jnp.array([0.0, 0.0, 1.0 - cfg.resize_factor]))
                   if cfg.ds_rgb else 0.0),
                src_cam[18:34].reshape(4, 4),
                tar_cam_used[2:18].reshape(4, 4)[:3, :3],
                tar_cam_used[18:34].reshape(4, 4),
                src2tar=True,
            )
            dc = L.smooth_l1(ret_cons["outputs_coarse"]["depth"], depth_proj,
                             depth_proj > 0)
            if ret_cons["outputs_fine"] is not None:
                dc = dc + L.smooth_l1(ret_cons["outputs_fine"]["depth"], depth_proj,
                                      depth_proj > 0)
            terms["depth_cons"] = cfg.depth_consistency_loss * dc

        if cfg.depth_smooth_loss > 0:
            if cfg.use_patch_sampling:
                ret_smooth = ret  # rides the main patch-sampled rays
            else:
                # the reference renders a DEDICATED patch batch with the same
                # perturbed features when the main batch isn't patch-sampled
                # (eval_adv.py:441-459)
                k_patch = jax.random.fold_in(key, 23)
                patch_cfg = dataclasses.replace(cfg, use_patch_sampling=True)
                sel_p = select_ray_indices(k_patch, patch_cfg)
                ret_smooth = render_subset(
                    params, feats, target, src_cams, src_rgbs, sel_p,
                    aux_cfg, key,
                )
            s = L.depth_smooth_loss(ret_smooth["outputs_coarse"]["depth"],
                                    cfg.patch_size)
            if ret_smooth["outputs_fine"] is not None:
                s = s + L.depth_smooth_loss(ret_smooth["outputs_fine"]["depth"],
                                            cfg.patch_size)
            terms["depth_smooth"] = cfg.depth_smooth_loss * s

        if cfg.camera_consistency_loss > 0:
            # bidirectional src<->tar rgb/depth consistency through GT-depth
            # warps (eval_adv.py:469-510); drives the camera-pose attack
            from nerfool_tpu.attack.warp import forward_warp

            k_src = jax.random.fold_in(key, 23)
            src_id = jax.random.randint(k_src, (), 0, src_cams.shape[0])
            src_cam = src_cams[src_id]
            tar_cam = target["camera"]
            k_tar = tar_cam[2:18].reshape(4, 4)[:3, :3]
            e_tar = tar_cam[18:34].reshape(4, 4)
            k_sv = src_cam[2:18].reshape(4, 4)[:3, :3]
            e_sv = src_cam[18:34].reshape(4, 4)
            rgb_src = src_rgbs[src_id]
            depth_src = src["depths"][src_id]
            rgb_tar = target["rgb"].reshape(cfg.h, cfg.w, 3)
            depth_tar = target["depth_full"].reshape(cfg.h, cfg.w)

            _, _, rgb_src2tar, depth_src2tar = forward_warp(
                sel, rgb_src, depth_src, k_sv, e_sv, k_tar, e_tar, src2tar=True
            )
            _, _, rgb_tar2src, depth_tar2src, inds_src = forward_warp(
                sel, rgb_tar, depth_tar, k_tar, e_tar, k_sv, e_sv, src2tar=False
            )
            top = ret["outputs_fine"] if ret["outputs_fine"] is not None else ret["outputs_coarse"]
            rgb_tar_sampled = top["rgb"]
            if not cfg.perturb_camera_no_detach:
                rgb_tar_sampled = jax.lax.stop_gradient(rgb_tar_sampled)
            depth_tar_sampled = target["depth"][sel]
            rgb_src_sampled = rgb_src.reshape(-1, 3)[inds_src]
            depth_src_sampled = depth_src.reshape(-1)[inds_src]

            cc = (
                cfg.cam_src2tar * L.smooth_l1(rgb_tar_sampled, rgb_src2tar, rgb_src2tar > 0)
                + cfg.cam_tar2src * L.smooth_l1(rgb_src_sampled, rgb_tar2src, rgb_tar2src > 0)
            )
            cc = cc + cfg.cam_depth * (
                L.smooth_l1(depth_tar_sampled, depth_src2tar, depth_src2tar > 0)
                + L.smooth_l1(depth_src_sampled, depth_tar2src, depth_tar2src > 0)
            )
            terms["camera_cons"] = cfg.camera_consistency_loss * cc

        return terms

    def step(state, target, src, key):
        k_sel, k_render, k_pc = jax.random.split(key, 3)
        sel = select_ray_indices(k_sel, cfg)
        delta, rot, trans = state["delta"], state["rot"], state["trans"]

        def total_loss(p3):
            d, r, t = p3
            terms = compute_losses(d, r, t, target, src, sel, k_render)
            return sum(terms.values()), terms

        if cfg.use_pcgrad:
            # per-loss gradients for gradient surgery on delta; camera params
            # keep the summed gradient
            def loss_vec(p3):
                terms = compute_losses(*p3, target, src, sel, k_render)
                return jnp.stack([terms[n] for n in loss_names])

            jac = jax.jacrev(loss_vec)((delta, rot, trans))
            major_idx = (
                loss_names.index(cfg.major_loss) if cfg.major_loss in loss_names else None
            )
            g_delta = pcgrad_combine(jac[0], major_idx=major_idx, key=k_pc)
            g_rot = jnp.sum(jac[1], axis=0)
            g_trans = jnp.sum(jac[2], axis=0)
            terms = compute_losses(delta, rot, trans, target, src, sel, k_render)
            loss = sum(terms.values())
            grads = (g_delta, g_rot, g_trans)
        else:
            (loss, terms), grads = jax.value_and_grad(total_loss, has_aux=True)(
                (delta, rot, trans)
            )

        if cfg.perturb_camera_no_opt:
            grads = (grads[0], jnp.zeros_like(grads[1]), jnp.zeros_like(grads[2]))

        if cfg.use_adam:
            neg = jax.tree.map(lambda g: -g, grads)
            updates, opt_state = opt.update(neg, state["opt_state"], (delta, rot, trans))
            delta, rot, trans = optax.apply_updates((delta, rot, trans), updates)
        else:
            opt_state = state["opt_state"]
            delta = delta + cfg.alpha * jnp.sign(grads[0])
            if cfg.perturb_camera and not cfg.perturb_camera_no_opt:
                rot = rot + cfg.adv_lr * jnp.sign(grads[1])
                trans = trans + cfg.adv_lr * jnp.sign(grads[2])

        delta = project_delta(delta, src["rgbs"], cfg.eps)
        if cfg.perturb_camera:
            rot = clamp(rot, -cfg.rot_eps_rad, cfg.rot_eps_rad)
            trans = clamp(trans, -cfg.trans_epsilon, cfg.trans_epsilon)

        new_state = {"delta": delta, "rot": rot, "trans": trans,
                     "opt_state": opt_state, "step": state["step"] + 1}
        return new_state, {"loss": loss, **terms}

    return step


def run_attack_scan(step_fn, state, target, src, key, n_iters: int):
    """View-specific attack: n_iters of step_fn under lax.scan (fixed target)."""

    def body(state, k):
        return step_fn(state, target, src, k)

    keys = jax.random.split(key, n_iters)
    return jax.lax.scan(body, state, keys)
