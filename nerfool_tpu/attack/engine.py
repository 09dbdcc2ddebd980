"""Adversarial evaluation engine — the flagship flow.

Orchestrates what /root/reference/eval/ibrnet/eval_adv.py:525-1029 (and the GNT
twin) does: per-scene view-specific or universal (view-generalizable) attacks,
optional camera-pose perturbation / unseen-view interpolation / PCGrad /
purification defenses, then whole-frame rendering of every test view with the
perturbed sources and PSNR/SSIM/LPIPS measurement + image artifact dumps.

All device work happens through the jitted attack step and the blocked
whole-image renderer; this module is thin host-side control flow.
"""
from __future__ import annotations

import sys
import os
import time
import warnings

import numpy as np

from nerfool_tpu.attack.attack import (
    AttackConfig,
    init_attack_state,
    make_attack_step,
)
from nerfool_tpu.attack.geo_interp import sample_unseen_pose
from nerfool_tpu.attack.perturb import project_delta
from nerfool_tpu.data import dataset_dict
from nerfool_tpu.data.base import Loader
from nerfool_tpu.models.bundle import create_model, default_render_config
from nerfool_tpu.utils.cameras import transform_src_cameras
from nerfool_tpu.utils.vis import colorize_np, to8b


def build_attack_config(args, h, w):
    return AttackConfig(
        h=h, w=w,
        epsilon=float(args.epsilon), adv_lr=args.adv_lr, adv_iters=args.adv_iters,
        use_adam=args.use_adam, adam_lr=args.adam_lr,
        lr_step_size=args.lr_step_size, lr_gamma=args.lr_gamma,
        n_rand=args.N_rand, sample_mode=args.sample_mode,
        center_ratio=args.center_ratio,
        use_patch_sampling=args.use_patch_sampling, patch_size=args.patch_size,
        use_pseudo_gt=args.use_pseudo_gt or args.use_unseen_views,
        density_loss=args.density_loss, depth_var_loss=args.depth_var_loss,
        depth_diff_loss=args.depth_diff_loss,
        depth_smooth_loss=args.depth_smooth_loss,
        depth_consistency_loss=args.depth_consistency_loss,
        ds_rgb=getattr(args, "ds_rgb", False),
        resize_factor=getattr(args, "resize_factor", 0.5),
        camera_consistency_loss=args.camera_consistency_loss,
        cam_src2tar=args.cam_src2tar, cam_tar2src=args.cam_tar2src,
        cam_depth=args.cam_depth,
        perturb_camera_no_detach=args.perturb_camera_no_detach,
        use_pcgrad=args.use_pcgrad, major_loss=args.major_loss,
        perturb_camera=args.perturb_camera,
        perturb_camera_no_opt=args.perturb_camera_no_opt,
        zero_camera_init=args.zero_camera_init,
        rot_epsilon=args.rot_epsilon, trans_epsilon=args.trans_epsilon,
    )


def save_attack_state(path, state, meta=None):
    """Checkpoint the attack state (delta, camera params, optimizer moments) so
    1000-iteration attacks are resumable — the reference keeps attack state only
    in memory (SURVEY.md §5 checkpoint/resume)."""
    import pickle

    import jax

    with open(path, "wb") as f:
        pickle.dump({"state": jax.device_get(state), "meta": meta or {}}, f)


def load_attack_state(path):
    import pickle

    with open(path, "rb") as f:
        blob = pickle.load(f)
    return blob["state"], blob["meta"]


class AdvEvaluator:
    def __init__(self, args, bundle=None, dataset_kwargs=None):
        import jax

        self.args = args
        self.jax = jax
        args.det = True  # the reference forces deterministic sampling for attacks
        self.bundle = bundle if bundle is not None else create_model(
            args=args, backbone=args.backbone,
            ckpt_path=args.ckpt_path or None,
            rng_key=jax.random.PRNGKey(0),
        )
        self.render_cfg = default_render_config(args, backbone=args.backbone)
        # multi-chip: shard the ray axis over every visible device (attack-step
        # gradients psum over ICI; whole-frame render blocks split per chip).
        # Single-device runs keep ray_sharding=None (identical program).
        self.ray_sharding = None
        if getattr(args, "shard_rays", True) and len(jax.devices()) > 1:
            from nerfool_tpu.parallel.mesh import get_mesh, shard_rays

            self.ray_sharding = shard_rays(get_mesh())
        dkw = dataset_kwargs or {}
        self.test_dataset = dataset_dict[args.eval_dataset](
            args, "test", scenes=args.eval_scenes, **dkw
        )
        self.load_gt_depth = bool(args.gt_depth_path)
        self.dataset_kwargs = dkw
        self.key = jax.random.PRNGKey(1234)
        self._step_cache = {}
        self._spg_cfg = None
        self._bspg_cfg = {}  # n_src -> RenderConfig

    def retarget(self, args):
        """Point the evaluator at another scene/dataset while keeping the
        model bundle and every compiled step function.

        Attack/render step shapes depend on (n_rand, H, W, V), not on the
        scene, so an 8-scene sweep over one dataset pays compilation ONCE —
        the reference re-creates its whole session per scene and a fresh
        evaluator per scene was measured to cost up to ~an hour of pure
        recompilation on relay-backed TPUs (80-480s per graph)."""
        args.det = True
        self.args = args
        self.test_dataset = dataset_dict[args.eval_dataset](
            args, "test", scenes=args.eval_scenes, **self.dataset_kwargs
        )
        self.load_gt_depth = bool(args.gt_depth_path)
        return self

    # ---------- helpers ----------

    def _split(self):
        self.key, k = self.jax.random.split(self.key)
        return k

    def _make_target(self, data):
        import jax.numpy as jnp

        h, w = int(data["camera"][0]), int(data["camera"][1])
        target = {
            "camera": jnp.asarray(data["camera"].reshape(-1)[:34]),
            "rgb": jnp.asarray(np.asarray(data["rgb"]).reshape(-1, 3))
            if data.get("rgb") is not None else None,
            "depth": jnp.asarray(np.asarray(data["depth"]).reshape(-1))
            if data.get("depth") is not None else None,
            "depth_full": jnp.asarray(np.asarray(data["depth"]).reshape(-1))
            if data.get("depth") is not None else None,
            "depth_range": jnp.asarray(
                np.asarray(data["depth_range"]).reshape(1, 2)
            ),
        }
        return target, (h, w)

    def _make_src(self, data):
        import jax.numpy as jnp

        src_rgbs = jnp.asarray(np.asarray(data["src_rgbs"]))
        src = {
            "rgbs": src_rgbs,
            "cameras": jnp.asarray(np.asarray(data["src_cameras"]).reshape(-1, 34)),
            "featmaps_clean": self.bundle.extract_features(src_rgbs),
        }
        if data.get("src_depths") is not None:
            src["depths"] = jnp.asarray(np.asarray(data["src_depths"]))
        return src

    def _grad_render_cfg(self):
        """Base render config for DIFFERENTIATED steps (attack /
        purification). --gnt_fused_attack: the ray-attention kernel has a
        custom VJP (ops/ra_kernel.fused_ray_attention_ad), so these steps
        may opt into the fusion (TPU only; off by default pending hardware
        A/B)."""
        args = self.args
        if (args.backbone == "gnt"
                and getattr(args, "gnt_fused_attack", False)
                and self.jax.default_backend() == "tpu"):
            import dataclasses as _dc

            return _dc.replace(self.render_cfg, gnt_fused_attn=True)
        return self.render_cfg

    def _attack_render_cfg(self, extra_datasets=()):
        """Render config for ATTACK steps: with --attack_spg, the per-ray
        segment-patch gather is planned ONCE over every camera the attack may
        sample (test views + source candidates; universal additionally unions
        the train split) with a single uniform-K view group, so one compiled
        step serves every view. Falls back to the per-tap gather — with a
        warning — where the plan cannot cover the rays: unseen-view
        interpolation and camera-pose attacks move cameras outside any
        pre-planned set, and not every dataset exposes target_cameras().

        Gather selection: --attack_spg / --attack_gather spg force SPG,
        --attack_gather tap forces per-tap; the default (auto) picks per-tap
        below --attack_spg_min_views source views and SPG at or above it —
        SPG's planning cost and per-step selection overhead amortize as the
        view count grows while the per-tap random-row gather scales linearly
        with V (measured crossover: BENCH_NOTES attack-gather section)."""
        args = self.args
        base = self._grad_render_cfg()
        mode = getattr(args, "attack_gather", "auto")
        want_spg = getattr(args, "attack_spg", False) or mode == "spg" or (
            mode == "auto"
            and int(getattr(args, "num_source_views", 0))
            >= int(getattr(args, "attack_spg_min_views", 10))
        )
        if mode == "tap" and not getattr(args, "attack_spg", False):
            want_spg = False
        if not want_spg:
            return base
        if self._spg_cfg is not None:
            return self._spg_cfg
        import dataclasses
        import warnings

        def fallback(reason):
            warnings.warn(f"--attack_spg disabled: {reason}")
            self._spg_cfg = base
            return base

        if getattr(args, "use_unseen_views", False):
            return fallback("unseen-view targets are interpolated poses "
                            "outside any pre-planned camera set")
        if getattr(args, "perturb_camera", False):
            return fallback("the camera-pose attack moves source cameras "
                            "outside the planned set")
        cam_sets, ranges = [], []
        for ds in (self.test_dataset, *extra_datasets):
            fn = getattr(ds, "target_cameras", None)
            got = fn() if fn is not None else None
            if got is None:
                return fallback(
                    f"{type(ds).__name__} exposes no target_cameras()")
            cams, dr = got
            cam_sets.append(np.asarray(cams, np.float64))
            ranges.append(np.asarray(dr, np.float64))
        cams_all = np.concatenate(cam_sets, axis=0)
        dr = np.array([min(r[0] for r in ranges), max(r[1] for r in ranges)])
        h, w = int(cams_all[0][0]), int(cams_all[0][1])

        from nerfool_tpu.ops.spg import plan_attack_specs

        jnpf = self.jax.ShapeDtypeStruct((1, h, w, 3), np.float32)
        fshape = self.jax.eval_shape(
            lambda x: self.bundle.extract_features(x), jnpf
        )[0].shape
        specs = plan_attack_specs(cams_all, cams_all, dr, (h, w),
                                  fshape[1:3], n_groups=1)
        # remap the N-candidate plan onto the runtime's V source-view slots:
        # any candidate may occupy any slot, so every slot gets the uniform
        # worst-case K (one group -> one compiled step for all views)
        v = int(args.num_source_views)
        specs = tuple(
            dataclasses.replace(
                sp, groups=((tuple(range(v)), sp.groups[0][1]),)
            ) for sp in specs
        )
        self._spg_cfg = dataclasses.replace(base, spg_specs=specs)
        return self._spg_cfg

    def _view_render_cfg(self, n_src):
        """Render config for WHOLE-IMAGE eval renders: with --use_bspg
        (default), the block segment-patch gather is planned ONCE over every
        camera the dataset can emit (targets + source candidates), so one
        compiled render serves every view — contiguous per-(block,view) patch
        fetches replace the issue-rate-bound random-row gathers (26.1k vs
        17.3k rays/s measured on v5e at the flagship IBRNet config). Any
        candidate camera may occupy any of the ``n_src`` runtime source slots,
        so every slot gets the uniform worst-case crossing budget (one
        compiled render for all views — the same remap the attack-SPG planner
        uses). Falls back to the per-tap gather — with a warning — where the
        plan cannot cover the rays (camera-pose attacks move source cameras
        outside the planned set; some datasets expose no camera inventory)."""
        args = self.args
        base = self.render_cfg
        # fused GNT RAY attention (ops/ra_kernel.py) on the no-grad
        # whole-image renders. The kernel wins its micro A/B 1.5x but LOSES
        # -19% end to end (battery5, interleaved whole-frame A/B: XLA 10,407
        # rays/s vs fused 8,420 — the custom-call boundary forces the
        # [R,S,D] operand to materialize and breaks XLA's fusion of the
        # surrounding LN/FF/q_fc chain), so 'auto' now resolves to OFF;
        # 'on' forces it (A/B + CPU equality tests). The kernel is grad-safe
        # (custom VJP) — the attack step can opt in via --gnt_fused_attack.
        fmode = getattr(args, "gnt_fused_attn", "auto")
        if args.backbone == "gnt" and fmode == "on":
            import dataclasses as _dc

            base = _dc.replace(base, gnt_fused_attn=True)
        # whole-chain kernel (ops/chain_kernel.py): the one fused variant
        # that wins e2e (battery5 +3%); auto = TPU no-grad renders
        cmode = getattr(args, "gnt_fused_chain", "auto")
        if (args.backbone == "gnt" and cmode != "off"
                and (cmode == "on"
                     or self.jax.default_backend() == "tpu")):
            import dataclasses as _dc

            base = _dc.replace(base, gnt_fused_chain=True)
        if not getattr(args, "use_bspg", True):
            return base
        if n_src in self._bspg_cfg:
            return self._bspg_cfg[n_src]
        import dataclasses
        import warnings

        def fallback(reason):
            warnings.warn(f"--use_bspg disabled: {reason}")
            self._bspg_cfg[n_src] = base
            return base

        if (self.jax.default_backend() != "tpu"
                and not os.environ.get("NERFOOL_FORCE_BSPG")):
            # the Pallas selection kernel interprets off-TPU (crawls) and the
            # plain-XLA selection loses to the per-tap gather — TPU-only path
            self._bspg_cfg[n_src] = base
            return base
        if getattr(args, "perturb_camera", False):
            return fallback("the camera-pose attack moves source cameras "
                            "outside the planned set")
        fn = getattr(self.test_dataset, "target_cameras", None)
        got = fn() if fn is not None else None
        if got is None:
            return fallback(
                f"{type(self.test_dataset).__name__} exposes no target_cameras()")
        cams_all, dr = np.asarray(got[0], np.float64), np.asarray(got[1], np.float64)
        h, w = int(cams_all[0][0]), int(cams_all[0][1])

        from nerfool_tpu.ops.bspg import plan_render_specs

        jnpf = self.jax.ShapeDtypeStruct((1, h, w, 3), np.float32)
        fshape = self.jax.eval_shape(
            lambda x: self.bundle.extract_features(x), jnpf
        )[0].shape
        blk = int(getattr(args, "bspg_block", 8))
        specs = plan_render_specs(
            cams_all, cams_all, dr, (h, w), fshape[1:3],
            block=(blk, blk),
            render_stride=args.render_stride,
            n_samples=base.n_samples, n_importance=base.n_importance,
            inv_uniform=base.inv_uniform,
        )
        if specs is None:
            return fallback("no admissible patch size covers the epipolar "
                            "spans of this camera set")
        specs = tuple(
            dataclasses.replace(
                sp,
                groups=((tuple(range(n_src)), max(k for _, k in sp.groups)),),
                kwin=None if sp.kwin is None else (max(sp.kwin),),
            )
            for sp in specs
        )
        self._bspg_hw = (h, w)
        self._bspg_cfg[n_src] = dataclasses.replace(base, bspg_specs=specs)
        return self._bspg_cfg[n_src]

    def _attack_step_fn(self, cfg):
        rcfg = self._attack_render_cfg()
        key = (cfg, rcfg)
        if key not in self._step_cache:
            # donate the carried attack state (delta + Adam moments): in-place
            # buffer reuse instead of a fresh allocation per iteration
            self._step_cache[key] = self.jax.jit(
                make_attack_step(self.bundle, rcfg, cfg,
                                 ray_sharding=self.ray_sharding),
                donate_argnums=0,
            )
        return self._step_cache[key]

    def _scan_group(self, n_iters):
        """Iterations per device execution, clipped to divide n_iters.

        --scan_group unset picks by mesh size: per-iteration dispatch on a
        single chip (queued dispatches pipeline better than one long scan —
        203 vs 238-240 ms/iter measured on the v5e relay, buffer donation
        included), scan groups once rays shard over a multi-chip mesh, where
        a single host dispatching every iteration becomes the bottleneck
        (BENCH_NOTES.md scan-vs-dispatch)."""
        group = getattr(self.args, "scan_group", None)
        if group is None:
            group = 25 if self.ray_sharding is not None else 1
        group = max(1, min(group, n_iters))
        while n_iters % group:  # exact iteration-count parity with the CLI
            group -= 1
        return group

    # ---------- attacks ----------

    def attack_view_specific(self, data, verbose=False):
        """Optimize delta against one test view's own source set
        (eval_adv.py:762-843). Returns (delta, src, perturbed_src_cameras).

        Iterations run per-dispatch or in lax.scan groups per
        ``_scan_group``'s measured rule (dispatch single-chip, scan groups
        on a multi-chip mesh); the fixed target view makes the whole loop
        scannable."""
        target, (h, w) = self._make_target(data)
        src = self._make_src(data)
        cfg = build_attack_config(self.args, h, w)
        state = init_attack_state(self._split(), cfg, src["rgbs"])
        t0 = time.perf_counter()
        n_iters = self.args.adv_iters
        group = self._scan_group(n_iters)
        scan = self._attack_scan_fn(cfg, group)
        # pre-split ALL per-iteration keys once (a per-iteration host-side
        # split is a tiny device op that serializes the pipeline, ~2s/iter on
        # relay-backed TPUs) and feed each scan execution a SLICE: the
        # iteration keys — hence the whole trajectory — are identical for any
        # --scan_group, which the sharded scan-equivalence test relies on
        keys = self.jax.random.split(self._split(), n_iters)
        keys = keys.reshape(n_iters // group, group, *keys.shape[1:])
        for g in range(n_iters // group):
            state, aux = scan(state, target, src, keys[g])
            done = (g + 1) * group
            if verbose:
                print(f"  attack iter {done}/{n_iters} "
                      f"loss={float(aux['loss'][-1]):.5f} "
                      f"({(time.perf_counter()-t0)/done*1e3:.0f} ms/iter)")
        return self._finalize(state, src, cfg)

    def _attack_scan_fn(self, cfg, group):
        rcfg = self._attack_render_cfg()
        key = (cfg, rcfg, group)
        if key not in self._step_cache:
            step = make_attack_step(self.bundle, rcfg, cfg,
                                    ray_sharding=self.ray_sharding)

            def scan(state, target, src, ks):
                def body(st, k):
                    return step(st, target, src, k)

                return self.jax.lax.scan(body, state, ks)

            self._step_cache[key] = self.jax.jit(scan, donate_argnums=0)
        return self._step_cache[key]

    def attack_universal(self, verbose=False, ckpt_path=None):
        """Optimize one delta across train-split target views through the
        global source set (eval_adv.py:546-740). Returns (delta, src_glb,
        perturbed_src_cameras).

        ``ckpt_path``: optional attack-state checkpoint — the state (delta,
        camera params, Adam moments, step) is saved every ``i_attack_ckpt``
        iterations and a matching run resumes from it, making 1000-iteration
        attacks restartable (the reference keeps attack state only in memory,
        SURVEY.md §5)."""
        args = self.args
        train_dataset = dataset_dict[args.eval_dataset](
            args, "train", scenes=args.eval_scenes, **self.dataset_kwargs
        )
        src_dataset = dataset_dict[args.eval_dataset](
            args, "test", scenes=args.eval_scenes,
            use_glb_src=args.use_center_view, **self.dataset_kwargs
        )
        src = self._make_src(src_dataset[0])
        # prime the SPG plan with the train split's target cameras included
        self._attack_render_cfg(extra_datasets=(train_dataset,))
        render_poses = getattr(train_dataset, "render_poses_spiral", None)
        if render_poses is None:
            render_poses = getattr(train_dataset, "render_poses", None)

        rng = np.random.RandomState(0)
        loader = Loader(train_dataset, shuffle=True, seed=0,
                        num_workers=args.workers, infinite=True)
        it = iter(loader)
        first = next(it)
        target, (h, w) = self._make_target(first)
        cfg = build_attack_config(args, h, w)
        step = self._attack_step_fn(cfg)
        state = init_attack_state(self._split(), cfg, src["rgbs"])

        t0 = time.perf_counter()
        data = first
        n_iters = args.adv_iters
        start_iter = 0
        ckpt_every = int(getattr(args, "i_attack_ckpt", 0) or 0)
        if ckpt_path and os.path.exists(ckpt_path):
            state, meta = load_attack_state(ckpt_path)
            state = self.jax.tree.map(self.jax.numpy.asarray, state)
            start_iter = int(meta.get("iters_done", 0))
            if verbose:
                print(f"  resuming universal attack from iter {start_iter}")
        # scan groups over PRE-STACKED target views: per-iteration host
        # dispatch leaves the device idle (op-profile: IDLE is the top cost on
        # relay-backed chips); stacking `group` streamed targets lets a
        # lax.scan drive `group` iterations in one device execution
        group = self._scan_group(n_iters)
        scan = self._universal_scan_fn(cfg, group) if group > 1 else None
        keys = self.jax.random.split(self._split(), n_iters)
        i = start_iter
        while i < n_iters:
            batch = []
            for _ in range(group):
                if args.use_unseen_views:
                    pose = sample_unseen_pose(
                        rng, render_poses,
                        interp_upbound=args.interp_upbound,
                        decouple=args.decouple_interp_range,
                        upbound_rot=args.interp_upbound_rot,
                        upbound_trans=args.interp_upbound_trans,
                        sample_based_on_depth=args.sample_based_on_depth,
                        beta=args.beta, temp=args.temp,
                    )
                    cam = np.asarray(data["camera"]).copy()
                    cam[18:34] = pose.reshape(-1)[:16]
                    data = dict(data, camera=cam)
                target, _ = self._make_target(data)
                batch.append(target)
                data = next(it)
            if group == 1:
                state, aux = step(state, batch[0], src, keys[i])
                last_loss = float(aux["loss"])
            else:
                targets = self.jax.tree.map(
                    lambda *xs: self.jax.numpy.stack(xs), *batch
                )
                state, aux = scan(state, targets, src,
                                  keys[i:i + group])
                last_loss = float(aux["loss"][-1])
            i += group
            if verbose and (i % max(group, n_iters // 10)) < group:
                print(f"  universal iter {i}/{n_iters} "
                      f"loss={last_loss:.5f} "
                      f"({(time.perf_counter()-t0)/max(i-start_iter,1)*1e3:.0f} ms/iter)")
            if ckpt_path and ckpt_every and (
                i % ckpt_every < group or i >= n_iters
            ):
                save_attack_state(ckpt_path, state, {"iters_done": i})
        return self._finalize(state, src, cfg)

    def _universal_scan_fn(self, cfg, group):
        rcfg = self._attack_render_cfg()
        key = (cfg, rcfg, group, "universal")
        if key not in self._step_cache:
            step = make_attack_step(self.bundle, rcfg, cfg,
                                    ray_sharding=self.ray_sharding)

            def scan(state, targets, src, keys):
                def body(st, inp):
                    k, tgt = inp
                    return step(st, tgt, src, k)

                return self.jax.lax.scan(body, state, (keys, targets))

            self._step_cache[key] = self.jax.jit(scan, donate_argnums=0)
        return self._step_cache[key]

    def _finalize(self, state, src, cfg):
        delta = state["delta"]
        src_cameras = src["cameras"]
        if cfg.perturb_camera:
            src_cameras = transform_src_cameras(
                src["cameras"], state["rot"], state["trans"]
            )
        # defenses (gnt stack): purification then random noise
        if getattr(self.args, "use_purification", False):
            delta = self._purify(delta, src, src_cameras)
        if getattr(self.args, "def_random_noise", 0) > 0:
            from nerfool_tpu.attack.purify import apply_random_noise_defense

            delta = apply_random_noise_defense(
                self._split(), delta, self.args.def_random_noise
            )
        return delta, src, src_cameras

    def _purify(self, delta, src, src_cameras):
        from nerfool_tpu.attack.purify import PurifyConfig, make_purify_step

        args = self.args
        train_dataset = dataset_dict[args.eval_dataset](
            args, "train", scenes=args.eval_scenes, **self.dataset_kwargs
        )
        loader = Loader(train_dataset, shuffle=True, seed=1,
                        num_workers=args.workers, infinite=True)
        it = iter(loader)
        first = next(it)
        target, (h, w) = self._make_target(first)
        cfg = PurifyConfig(
            h=h, w=w, purif_epsilon=args.purif_epsilon,
            purif_iters=args.purif_iters, adam_lr=args.adam_lr or 1e-3,
            lr_step_size=args.lr_step_size, lr_gamma=args.lr_gamma,
            n_rand=args.N_rand, sample_mode=args.sample_mode,
            center_ratio=args.center_ratio,
            use_patch_sampling=args.use_patch_sampling, patch_size=args.patch_size,
            use_self_purification=args.use_self_purification,
            purif_consistency_loss=args.purif_consistency_loss,
        )
        init_state, step = make_purify_step(self.bundle,
                                            self._grad_render_cfg(), cfg)
        step = self.jax.jit(step)
        state = init_state(self._split(), src["rgbs"], delta)
        keys = self.jax.random.split(self._split(), args.purif_iters)
        for i in range(args.purif_iters):
            target, _ = self._make_target(next(it))
            state, _ = step(state, target, src, delta, keys[i])
        return delta + state["purif"]

    # ---------- evaluation ----------

    def render_view(self, data, delta, src, src_cameras):
        """Whole-frame render of one test view with perturbed sources."""
        import jax.numpy as jnp

        from nerfool_tpu.render.render_image import render_single_image
        from nerfool_tpu.utils.cameras import get_rays

        args = self.args
        h, w = int(data["camera"][0]), int(data["camera"][1])
        cam = np.asarray(data["camera"]).reshape(-1)[:34]
        intr = cam[2:18].reshape(4, 4)
        c2w = cam[18:34].reshape(4, 4)
        rays_o, rays_d = get_rays(
            h, w, jnp.asarray(intr), jnp.asarray(c2w),
            render_stride=args.render_stride,
        )
        batch = {
            "ray_o": rays_o, "ray_d": rays_d,
            "depth_range": jnp.asarray(np.asarray(data["depth_range"]).reshape(1, 2)),
            "camera": jnp.asarray(cam[None]),
        }
        feats = self.bundle.extract_features(src["rgbs"] + delta)
        feats_clean = None
        if args.use_clean_color or args.use_clean_density:
            feats_clean = src["featmaps_clean"]
        rcfg = self._view_render_cfg(int(src_cameras.shape[0]))
        if rcfg.bspg_specs is not None and getattr(self, "_bspg_hw", None) != (h, w):
            rcfg = self.render_cfg  # plan covers one image size only
        return render_single_image(
            self.bundle.render_params, self.bundle.modules, batch, feats,
            rcfg, h, w, src["rgbs"], src_cameras,
            chunk_size=args.chunk_size, render_stride=args.render_stride,
            featmaps_clean=feats_clean, ray_sharding=self.ray_sharding,
        )

    def evaluate(self, out_dir=None, save_images=True, verbose=True,
                 max_views=None):
        """Full eval loop: attack (once for universal; per view otherwise),
        render, measure. Returns the results dict keyed like the reference's
        psnr_{scene}_{step}.txt."""
        import jax.numpy as jnp

        args = self.args
        psnr_fn, ssim_fn = self._metric_fns()
        lpips_fn = self._build_lpips()
        scene = args.eval_scenes[0] if args.eval_scenes else args.eval_dataset
        if out_dir:
            from nerfool_tpu.utils.logging import save_run_config

            save_run_config(out_dir, args)  # args.txt + config.txt snapshot

        delta = src_glb = cams_glb = None
        if not args.no_attack and not args.view_specific:
            if verbose:
                print("Attack with Adv Perturbations Generalizable across Views...")
            ckpt = (os.path.join(out_dir, "attack_state.pkl")
                    if out_dir and getattr(args, "i_attack_ckpt", 0) else None)
            delta, src_glb, cams_glb = self.attack_universal(
                verbose=verbose, ckpt_path=ckpt)
        elif args.no_attack and not args.view_specific:
            src_dataset = dataset_dict[args.eval_dataset](
                args, "test", scenes=args.eval_scenes,
                use_glb_src=args.use_center_view, **self.dataset_kwargs
            )
            src_glb = self._make_src(src_dataset[0])
            cams_glb = src_glb["cameras"]
            delta = jnp.zeros_like(src_glb["rgbs"])

        results = {scene: {}}
        # per-view metric rows; means are nan-aware so absent metrics (no
        # LPIPS weights, missing coarse/fine level) are excluded rather than
        # recorded as fake perfect 0.0 scores
        rows_acc = []
        n_views = len(self.test_dataset)
        if max_views:
            n_views = min(n_views, max_views)

        for i in range(n_views):
            data = self.test_dataset[i]
            file_id = os.path.splitext(os.path.basename(data["rgb_path"]))[0] or f"view{i:03d}"

            if src_glb is not None:
                d_i, src_i, cams_i = delta, src_glb, cams_glb
            elif args.no_attack:
                src_i = self._make_src(data)
                cams_i = src_i["cameras"]
                d_i = jnp.zeros_like(src_i["rgbs"])
            else:
                if verbose:
                    print(f"[{file_id}] view-specific attack "
                          f"({args.adv_iters} iters)...")
                if args.use_trans_attack and i > 0:
                    # transfer attack: reuse view 0's delta on this view's sources
                    src_i = self._make_src(data)
                    cams_i = src_i["cameras"]
                else:
                    d_i, src_i, cams_i = self.attack_view_specific(data, verbose=verbose)

            ret = self.render_view(data, d_i, src_i, cams_i)
            gt = np.asarray(data["rgb"])[:: args.render_stride, :: args.render_stride]

            row = {}
            for li, level in enumerate(("outputs_coarse", "outputs_fine")):
                name = "coarse" if li == 0 else "fine"
                if ret[level] is None:
                    # absent level (e.g. GNT with N_importance=0): NaN, never 0.0
                    row[f"{name}_psnr"] = row[f"{name}_ssim"] = float("nan")
                    row[f"{name}_lpips"] = float("nan")
                    continue
                pred = np.clip(np.asarray(ret[level]["rgb"]), 0, 1)
                row[f"{name}_psnr"] = float(psnr_fn(jnp.asarray(pred), jnp.asarray(gt)))
                row[f"{name}_ssim"] = float(ssim_fn(jnp.asarray(pred), jnp.asarray(gt)))
                # without weights LPIPS is unmeasurable: NaN (excluded from
                # means), matching the reference protocol only when weights ship
                row[f"{name}_lpips"] = (
                    float(lpips_fn(pred[None], gt[None])[0])
                    if lpips_fn else float("nan")
                )
                if save_images and out_dir:
                    self._save_view_images(out_dir, file_id, name, pred, gt,
                                           ret[level], data)
            if save_images and out_dir:
                avg = to8b(np.mean(np.asarray(src_i["rgbs"]), axis=0))
                self._imwrite(os.path.join(out_dir, f"{file_id}_average.png"), avg)
                if args.export_adv_source_img:
                    adv = np.asarray(src_i["rgbs"] + d_i)
                    for j in range(adv.shape[0]):
                        self._imwrite(
                            os.path.join(out_dir, f"adv_src_{i}_{j}.png"), to8b(adv[j])
                        )

            results[scene][file_id] = row
            rows_acc.append([row["coarse_psnr"], row["fine_psnr"],
                             row["coarse_ssim"], row["fine_ssim"],
                             row["coarse_lpips"], row["fine_lpips"]])
            if verbose:
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore", RuntimeWarning)
                    m = np.nanmean(np.array(rows_acc), axis=0)
                print(
                    f"{scene} {file_id}: coarse/fine psnr "
                    f"{row['coarse_psnr']:.3f}/{row['fine_psnr']:.3f}  "
                    f"running mean {m[0]:.3f}/{m[1]:.3f}  ssim {m[2]:.3f}/{m[3]:.3f}  "
                    f"lpips {m[4]:.3f}/{m[5]:.3f}"
                )

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            means = (np.nanmean(np.array(rows_acc), axis=0)
                     if rows_acc else np.full(6, np.nan))
        results[scene]["coarse_mean_psnr"] = float(means[0])
        results[scene]["fine_mean_psnr"] = float(means[1])
        results[scene]["coarse_mean_ssim"] = float(means[2])
        results[scene]["fine_mean_ssim"] = float(means[3])
        results[scene]["coarse_mean_lpips"] = float(means[4])
        results[scene]["fine_mean_lpips"] = float(means[5])
        if out_dir:
            with open(os.path.join(out_dir, f"psnr_{scene}.txt"), "w") as f:
                f.write(str(results))
        return results

    def _metric_fns(self):
        """Per-backbone metric protocol (what the reference actually reports):
        IBRNet results use the TF ops "to match the NeRF paper setup"
        (/root/reference/eval/ibrnet/eval_adv.py:573-581) — tf.image.psnr +
        tf.image.ssim (VALID padding); GNT results use img2psnr + the torch
        windowed SSIM with SAME padding
        (/root/reference/eval/gnt/eval_adv.py:1193-1196,
        /root/reference/eval/gnt/utils.py:264-297)."""
        from nerfool_tpu.metrics.image import img2psnr, psnr, ssim, ssim_windowed

        if self.args.backbone == "gnt":
            return self.jax.jit(img2psnr), self.jax.jit(ssim_windowed)
        return self.jax.jit(psnr), self.jax.jit(ssim)

    def _build_lpips(self):
        if not getattr(self.args, "lpips_weights", ""):
            print("WARNING: --lpips_weights not set; LPIPS is unmeasurable and "
                  "will be recorded as NaN / excluded from means (export "
                  "weights with scripts/export_lpips_weights.py)",
                  file=sys.stderr)
            return None
        import jax.numpy as jnp

        from nerfool_tpu.metrics.lpips import LPIPS, load_lpips_weights

        params = load_lpips_weights(self.args.lpips_weights)
        # IBRNet protocol scales [0,1] inputs to [-1,1] inside the TF graph;
        # GNT's pip-lpips call feeds [0,1] raw (normalize=False default)
        model = LPIPS(normalize=self.args.backbone != "gnt")
        fn = self.jax.jit(lambda a, b: model.apply({"params": params}, a, b))
        return lambda a, b: np.asarray(fn(jnp.asarray(a), jnp.asarray(b)))

    def _imwrite(self, path, img):
        import imageio.v2 as imageio

        imageio.imwrite(path, img)

    def _save_view_images(self, out_dir, file_id, name, pred, gt, outputs, data):
        self._imwrite(os.path.join(out_dir, f"{file_id}_pred_{name}.png"), to8b(pred))
        if name == "coarse":
            self._imwrite(os.path.join(out_dir, f"{file_id}_gt_rgb.png"), to8b(gt))
        err = np.sum((pred - gt) ** 2, axis=-1)
        self._imwrite(
            os.path.join(out_dir, f"{file_id}_err_map_{name}.png"),
            to8b(colorize_np(err, range=(0.0, 1.0))),
        )
        depth = np.asarray(outputs["depth"]) if outputs.get("depth") is not None else None
        if depth is not None:
            self._imwrite(
                os.path.join(out_dir, f"{file_id}_depth_{name}.png"),
                (depth.squeeze() * 1000.0).astype(np.uint16),
            )
            drange = tuple(np.asarray(data["depth_range"]).reshape(-1)[:2])
            self._imwrite(
                os.path.join(out_dir, f"{file_id}_depth_vis_{name}.png"),
                to8b(colorize_np(depth, range=drange)),
            )
        if outputs.get("weights") is not None:
            acc = np.sum(np.asarray(outputs["weights"]), axis=-1)
            self._imwrite(
                os.path.join(out_dir, f"{file_id}_acc_map_{name}.png"),
                to8b(colorize_np(acc, range=(0.0, 1.0))),
            )
