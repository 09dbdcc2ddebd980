"""Backbone trainer: one jitted step = ray sampling, optional adversarial
inner loop, feature extraction, render, masked-MSE criterion (+ depth-variance
regularizer), Adam with per-group learning rates and StepLR decay.

TPU-first restructuring of /root/reference/train.py:48-245: the whole step —
including the adversarial-training inner PGD loop on the source images
(train.py:120-158) as a lax.fori_loop — is one pure function; rays shard over
the mesh and GSPMD all-reduces the parameter gradients (the reference's
DDP/NCCL role, SURVEY.md §2.6).
"""
from __future__ import annotations

import dataclasses
import os
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfool_tpu.attack import losses as L
from nerfool_tpu.attack.perturb import clamp
from nerfool_tpu.render.render_rays import RenderConfig, render_rays
from nerfool_tpu.utils.cameras import get_rays


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    h: int
    w: int
    n_rand: int = 512
    sample_mode: str = "uniform"
    center_ratio: float = 0.8
    lrate_feature: float = 1e-3
    lrate_mlp: float = 5e-4
    lrate_decay_factor: float = 0.5
    lrate_decay_steps: int = 50000
    depth_var_loss: float = 0.0
    # adversarial training (inner PGD on source pixels)
    use_adv_train: bool = False
    adv_iters: int = 3
    epsilon: float = 8.0
    adv_lr: float = 2.0


def aggregator_lr(args):
    """The aggregator LR knob is per-backbone: the GNT stack trains its
    transformer at --lrate_gnt (/root/reference/gnt/model.py:59-61), the
    IBRNet stack its MLP at --lrate_mlp (/root/reference/ibrnet/model.py)."""
    return args.lrate_gnt if args.backbone == "gnt" else args.lrate_mlp


def _select_rays(key, cfg: TrainConfig):
    h, w = cfg.h, cfg.w
    if cfg.sample_mode == "center":
        bh = int(h * (1 - cfg.center_ratio) / 2.0)
        bw = int(w * (1 - cfg.center_ratio) / 2.0)
        hh, ww = h - 2 * bh, w - 2 * bw
        scores = jax.random.uniform(key, (hh * ww,))
        _, sel = jax.lax.top_k(scores, cfg.n_rand)
        return (sel % ww + bw) + w * (sel // ww + bh)
    scores = jax.random.uniform(key, (h * w,))
    _, sel = jax.lax.top_k(scores, cfg.n_rand)
    return sel


def make_optimizer(cfg: TrainConfig, params):
    """Per-group LRs: feature_net at lrate_feature, aggregators at lrate_mlp,
    both on the same StepLR schedule (ibrnet/model.py:52-76)."""

    def schedule(base):
        return optax.exponential_decay(
            base, cfg.lrate_decay_steps, cfg.lrate_decay_factor, staircase=True
        )

    labels = {k: ("feature" if k == "feature_net" else "mlp") for k in params}
    return optax.multi_transform(
        {"feature": optax.adam(schedule(cfg.lrate_feature)),
         "mlp": optax.adam(schedule(cfg.lrate_mlp))},
        labels,
    )


def make_train_step(bundle, render_cfg: RenderConfig, cfg: TrainConfig,
                    ray_sharding=None):
    """step(params, opt_state, batch, key) -> (params, opt_state, aux)

    batch: {'camera' [34], 'rgb' [H*W, 3], 'depth_range' [1,2],
            'src_rgbs' [V,Hs,Ws,3], 'src_cameras' [V,34]}
    """
    modules = bundle.modules
    opt = make_optimizer(cfg, bundle.params)
    # the reference's adv-train inner render takes neither geo_noise nor the
    # depth_var regularizer — both apply only to the outer step
    # (/root/reference/train.py:122-158 vs :162-190)
    inner_render_cfg = dataclasses.replace(render_cfg, geo_noise=0.0)

    def render_loss(params, src_rgbs_input, batch, sel, key, inner=False):
        rcfg = inner_render_cfg if inner else render_cfg
        feats = bundle.extract_features(src_rgbs_input, params=params["feature_net"])
        intr = batch["camera"][2:18].reshape(4, 4)
        c2w = batch["camera"][18:34].reshape(4, 4)
        rays_o, rays_d = get_rays(cfg.h, cfg.w, intr, c2w)
        rb = {
            "ray_o": rays_o[sel], "ray_d": rays_d[sel],
            "depth_range": batch["depth_range"], "camera": batch["camera"][None],
        }
        if ray_sharding is not None:
            rb["ray_o"] = jax.lax.with_sharding_constraint(rb["ray_o"], ray_sharding)
            rb["ray_d"] = jax.lax.with_sharding_constraint(rb["ray_d"], ray_sharding)
        net_params = {"net_coarse": params["net_coarse"],
                      "net_fine": params.get("net_fine", params["net_coarse"])}
        ret = render_rays(
            net_params, modules, rb, feats, rcfg,
            src_rgbs=batch["src_rgbs"], src_cameras=batch["src_cameras"], key=key,
        )
        gt = batch["rgb"][sel]
        loss = L.rgb_criterion(ret["outputs_coarse"], gt)
        if ret["outputs_fine"] is not None:
            loss = loss + L.rgb_criterion(ret["outputs_fine"], gt)
        if not inner and cfg.depth_var_loss > 0:
            dv = L.depth_var_loss(ret["outputs_coarse"])
            if ret["outputs_fine"] is not None:
                dv = dv + L.depth_var_loss(ret["outputs_fine"])
            loss = loss + cfg.depth_var_loss * dv
        psnr = -10.0 * jnp.log(loss + 1e-6) / jnp.log(10.0)
        return loss, psnr

    def adv_perturb_sources(params, batch, sel, key):
        """Inner sign-PGD maximizing the render loss wrt source pixels."""
        eps = cfg.epsilon / 255.0
        alpha = cfg.adv_lr / 255.0
        src = batch["src_rgbs"]
        k0, key = jax.random.split(key)
        delta = jax.random.uniform(k0, src.shape, src.dtype, -eps, eps)
        delta = clamp(delta, -src, 1.0 - src)

        def body(i, delta):
            # fresh randomness per inner iteration, like the reference's
            # per-call torch jitter (train.py:131-158)
            ki = jax.random.fold_in(key, i)
            g = jax.grad(
                lambda d: render_loss(params, src + d, batch, sel, ki,
                                      inner=True)[0]
            )(delta)
            delta = delta + alpha * jnp.sign(g)
            delta = clamp(delta, -eps, eps)
            return clamp(delta, -src, 1.0 - src)

        return jax.lax.fori_loop(0, cfg.adv_iters, body, delta)

    def step(params, opt_state, batch, key):
        k_sel, k_adv, k_render = jax.random.split(key, 3)
        sel = _select_rays(k_sel, cfg)
        src = batch["src_rgbs"]
        if cfg.use_adv_train:
            delta = adv_perturb_sources(params, batch, sel, k_adv)
            src = src + jax.lax.stop_gradient(delta)

        (loss, psnr), grads = jax.value_and_grad(
            lambda p: render_loss(p, src, batch, sel, k_render), has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "psnr": psnr}

    # exposed for the oracle trajectory tests (test_advtrain_trajectory_x64)
    step.adv_perturb_sources = adv_perturb_sources
    step.render_loss = render_loss
    return step, opt


@dataclasses.dataclass
class Trainer:
    """Host-side training driver: data streaming, logging, checkpointing."""

    bundle: any
    render_cfg: RenderConfig
    cfg: TrainConfig
    out_dir: str = "out/exp"
    start_step: int = 0
    # NamedSharding splitting the ray axis over a device mesh (parallel.mesh
    # .shard_rays). Replaces the reference's DDP/NCCL data parallelism
    # (train.py:360-363, ibrnet/model.py:78-96): rays shard, params replicate,
    # GSPMD psums the gradients over the mesh.
    ray_sharding: Optional[object] = None

    def __post_init__(self):
        self.step_fn, self.opt = make_train_step(
            self.bundle, self.render_cfg, self.cfg,
            ray_sharding=self.ray_sharding,
        )
        self.step_jit = jax.jit(self.step_fn)
        self.params = self.bundle.params
        self.opt_state = self.opt.init(self.params)

    def save(self, step):
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, f"model_{step:06d}.ckpt")
        with open(path, "wb") as f:
            pickle.dump(
                {"params": jax.device_get(self.params),
                 "opt_state": jax.device_get(self.opt_state),
                 "step": step},
                f,
            )
        return path

    def load_latest(self, load_opt=True):
        """Resume from the newest model_%06d.ckpt in out_dir (model.py:162-191)."""
        if not os.path.isdir(self.out_dir):
            return 0
        ckpts = sorted(
            f for f in os.listdir(self.out_dir) if f.endswith(".ckpt")
        )
        if not ckpts:
            return 0
        with open(os.path.join(self.out_dir, ckpts[-1]), "rb") as f:
            state = pickle.load(f)
        self.params = state["params"]
        self.bundle.params = state["params"]
        if load_opt:
            self.opt_state = state["opt_state"]
        self.start_step = state["step"]
        return self.start_step

    def log_view(self, data, step, logger, prefix="val"):
        """Render one full view and write image panels (GT, coarse/fine pred,
        colorized depth) — the reference's log_view_to_tb (train.py:248-314).
        """
        from nerfool_tpu.render.render_image import render_single_image
        from nerfool_tpu.utils.cameras import get_rays
        from nerfool_tpu.utils.vis import colorize_np

        cam = np.asarray(data["camera"]).reshape(-1)[:34]
        h, w = int(cam[0]), int(cam[1])
        intr = cam[2:18].reshape(4, 4)
        c2w = cam[18:34].reshape(4, 4)
        rays_o, rays_d = get_rays(h, w, jnp.asarray(intr), jnp.asarray(c2w))
        batch = {
            "ray_o": rays_o, "ray_d": rays_d,
            "depth_range": jnp.asarray(np.asarray(data["depth_range"]).reshape(1, 2)),
            "camera": jnp.asarray(cam[None]),
        }
        src_rgbs = jnp.asarray(np.asarray(data["src_rgbs"]))
        src_cams = jnp.asarray(np.asarray(data["src_cameras"]).reshape(-1, 34))
        feats = self.bundle.extract_features(src_rgbs,
                                             params=self.params["feature_net"])
        render_params = {
            "net_coarse": self.params["net_coarse"],
            "net_fine": self.params.get("net_fine", self.params["net_coarse"]),
        }
        # validation renders are deterministic (the training cfg samples
        # stochastically and would require a key; reference eval renders are
        # det=True as well)
        vcfg = dataclasses.replace(self.render_cfg, det=True, geo_noise=0.0)
        out = render_single_image(
            render_params, self.bundle.modules, batch, feats, vcfg,
            h, w, src_rgbs, src_cams,
        )
        if data.get("rgb") is not None:
            logger.add_image(f"{prefix}/gt_rgb",
                             np.asarray(data["rgb"]).reshape(h, w, 3), step)
        for lvl in ("outputs_coarse", "outputs_fine"):
            if out[lvl] is None:
                continue
            tag = lvl.split("_")[1]
            logger.add_image(f"{prefix}/pred_{tag}",
                             np.asarray(out[lvl]["rgb"]), step)
            if out[lvl].get("depth") is not None:
                logger.add_image(
                    f"{prefix}/depth_{tag}",
                    colorize_np(np.asarray(out[lvl]["depth"])), step,
                )

    def train(self, data_iter, n_iters, key=None, i_print=100, i_weights=10000,
              log_fn=print, i_img=0, val_iter=None, logger=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        keys = jax.random.split(key, n_iters)
        t0 = time.perf_counter()
        for i in range(self.start_step, self.start_step + n_iters):
            data = next(data_iter)
            batch = {
                "camera": jnp.asarray(np.asarray(data["camera"]).reshape(-1)[:34]),
                "rgb": jnp.asarray(np.asarray(data["rgb"]).reshape(-1, 3)),
                "depth_range": jnp.asarray(
                    np.asarray(data["depth_range"]).reshape(1, 2)
                ),
                "src_rgbs": jnp.asarray(np.asarray(data["src_rgbs"])),
                "src_cameras": jnp.asarray(
                    np.asarray(data["src_cameras"]).reshape(-1, 34)
                ),
            }
            self.params, self.opt_state, aux = self.step_jit(
                self.params, self.opt_state, batch, keys[i - self.start_step]
            )
            if (i + 1) % i_print == 0:
                dt = (time.perf_counter() - t0) / (i + 1 - self.start_step)
                log_fn(
                    f"step {i+1}: loss={float(aux['loss']):.5f} "
                    f"psnr={float(aux['psnr']):.2f} ({dt*1e3:.0f} ms/it)"
                )
            if (i + 1) % i_weights == 0:
                # rank-0-only checkpointing (reference train.py:202,220-223);
                # params are GSPMD-replicated so rank 0's copy is canonical
                from nerfool_tpu.parallel.distributed import is_main_process

                if is_main_process():
                    self.save(i + 1)
            if i_img and logger is not None and val_iter is not None and (
                (i + 1) % i_img == 0
            ):
                self.log_view(next(val_iter), i + 1, logger)
        self.bundle.params = self.params
        return self.params
