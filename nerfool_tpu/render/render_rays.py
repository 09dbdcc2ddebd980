"""Functional ray renderer: one pure function from (params, batch) to outputs.

Equivalent of the reference's render_rays / render_rays_hybrid
(/root/reference/ibrnet/render_ray.py:173-390 and gnt/render_ray.py:196-279) but
expressed as a jit-able pure function of a parameter pytree, a ray batch, and a
static RenderConfig. The two backbones share the whole pipeline; they differ
only in the aggregator signature and in how raw outputs become radiance:

  * ibrnet: aggregator -> [R,S,4] raw, alpha-composited by raw2outputs
  * gnt:    aggregator -> [R, 3(+S)] rgb (+ attention weights as "density")

No chunk loop lives here: callers vmap/shard the ray axis.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from nerfool_tpu.render.compositor import raw2outputs
from nerfool_tpu.render.projection import (
    epipolar_gather_components,
)
from nerfool_tpu.render.sampling import sample_along_camera_ray, sample_fine_zvals


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (hashable: safe as a jit static arg)."""

    n_samples: int = 64
    n_importance: int = 0
    inv_uniform: bool = False
    det: bool = True
    white_bkgd: bool = False
    backbone: str = "ibrnet"  # 'ibrnet' | 'gnt'
    single_net: bool = False  # gnt: reuse net_coarse for the fine pass
    ret_alpha: bool = True  # gnt: return attention weights as density
    stop_camera_grad: bool = True  # ibrnet detaches src cameras; gnt does not
    geo_noise: float = 0.0
    # hybrid rendering (density/color vulnerability analysis)
    use_clean_color: bool = False
    use_clean_density: bool = False
    # aggregation compute dtype: 'bfloat16' halves gather + MLP HBM traffic
    # (geometry/projection/compositing stay f32); keep f32 for parity runs
    compute_dtype: str = "float32"
    # fine-pass tap reuse: pack coarse+fine feature heads into ONE table
    # (gather cost on TPU is per-row) and re-gather only the n_importance NEW
    # points in the fine pass, reordering the coarse taps on-chip — ~1/3 fewer
    # random HBM gathers (and backward scatters) per rendered ray
    reuse_fine_taps: bool = False
    # fused rgb+feature superrows: append each feat-resolution row's PxP
    # full-res RGB patch to the corner-packed feature table so ONE gather
    # serves both taps — row gathers are issue-rate bound (~47M rows/s on v5e
    # regardless of width up to ~512ch), so this halves sampler time. Exact
    # numerics (see tests/test_grid_sample.py superrow tests). Disabled
    # automatically for hybrid clean-feature rendering.
    fuse_rgb_rows: bool = True
    # block segment-patch gather (ops/bspg.py) for whole-frame rendering:
    # rays arrive block-major (render_image reorders), patch rows are gathered
    # per (8x8 block, view) and samples reconstructed by one-hot MXU matmuls —
    # replaces per-tap gathering AND the fine-pass tap-reuse permutes.
    # (spec_feat, spec_rgb) are static BSPGSpec pairs from the host planner;
    # None keeps the per-tap path.
    bspg_specs: Optional[tuple] = None
    # route BSPG sample selection through the Pallas kernel (VMEM one-hots);
    # off -> XLA einsum selection (small batches / CPU tests)
    bspg_pallas: bool = True
    # windowed BSPG selection: depth-major sample chunks contract only the
    # Kw-slot window of the walk their depth range can touch (~2-3x less
    # one-hot width on the dominant wide-K view groups)
    bspg_window: bool = True
    # per-RAY segment-patch gather (ops/spg.py) for random-pixel ray batches
    # (the attack step, where block-major BSPG does not apply): per (ray,
    # view) the <= K patch rows its epipolar segment crosses are gathered
    # once and serve BOTH passes; the per-tap gather (and its scatter-add
    # backward, which carries the attack gradient into delta) drops from
    # S+I rows per (ray, view) to K ~ 8-24 patch rows. (spec_feat, spec_rgb)
    # static SPGSpec pair from the host planner; None keeps per-tap.
    spg_specs: Optional[tuple] = None
    # route the GNT RAY attention through the fused Pallas kernel
    # (ops/ra_kernel.py — no [R,H,S,S] score materialization; measured 1.5x
    # per block on v5e). GRAD-SAFE: the kernel has a flash-style-recompute
    # custom VJP, so it is valid on no-grad renders AND the differentiated
    # attack step (--gnt_fused_attack); f64 inputs fall back inside the
    # module (parity tests)
    gnt_fused_attn: bool = False
    # fused VIEW attention kernel (ops/vt_kernel.py): forward-only (no VJP)
    # and currently loses to XLA's fusion at D=64 (probe_kernel_micro) —
    # experimental
    gnt_fused_vt: bool = False
    # lane-packed vt-kernel variant (two rows per 128-lane register,
    # block-diagonal weights; exact) — only meaningful with gnt_fused_vt
    gnt_fused_vt_lp: bool = False
    # WHOLE-CHAIN fused GNT aggregation (ops/chain_kernel.py): the entire
    # depth-8 view-attn/q_fc/ray-attn stack runs as ONE Pallas kernel per
    # ray tile — two fusion boundaries per block instead of ~16 per depth
    # (the boundary cost is what sank the per-stage kernels, battery5).
    # Forward-only; no-grad render paths. f64/ray-packed inputs fall back.
    gnt_fused_chain: bool = False


def make_shade_fn(model, cfg: RenderConfig) -> Callable:
    """Bind the aggregator apply into a uniform shade(params, ...) signature.

    ``model`` holds the flax Modules: {'net_coarse': Module, 'net_fine': Module|None}.
    """
    if cfg.backbone == "ibrnet":
        def shade(agg_params, agg_module, rgb_feat, ray_diff, mask, pts, ray_d,
                  inputs_packed=False):
            return agg_module.apply({"params": agg_params}, rgb_feat, ray_diff, mask)

    else:
        def shade(agg_params, agg_module, rgb_feat, ray_diff, mask, pts, ray_d,
                  inputs_packed=False):
            # bf16-only: f32 doubles the kernel's VMEM residency past the
            # scoped limit at flagship shapes (f32/f64 renders are
            # parity-protocol runs — they keep the XLA path)
            if (cfg.gnt_fused_chain and not inputs_packed
                    and getattr(agg_module, "ray_fold", 1) != 2
                    and getattr(agg_module, "sample_fold", 1) != 2
                    and jnp.dtype(rgb_feat.dtype) == jnp.bfloat16):
                from nerfool_tpu.ops.chain_kernel import fused_chain_aggregate

                return fused_chain_aggregate(
                    agg_params, rgb_feat, ray_diff, mask, pts, ray_d,
                    depth=agg_module.trans_depth,
                    posenc_freqs=agg_module.posenc_freqs,
                    ret_alpha=agg_module.ret_alpha,
                )
            if (cfg.gnt_fused_attn
                    and getattr(agg_module, "fused_attn", True) is False):
                agg_module = agg_module.clone(fused_attn=True,
                                              fused_vt=cfg.gnt_fused_vt,
                                              fused_vt_lp=cfg.gnt_fused_vt_lp)
            return agg_module.apply(
                {"params": agg_params}, rgb_feat, ray_diff, mask, pts, ray_d,
                inputs_packed=inputs_packed,
            )

    return shade


def wants_unified_tables(cfg: RenderConfig, featmaps, featmaps_clean=None):
    """True when the fine-pass tap-reuse path applies (and so the packed
    feature tables should be channel-unified)."""
    return (
        cfg.reuse_fine_taps
        and cfg.n_importance > 0
        and not (cfg.use_clean_color or cfg.use_clean_density)
        and featmaps_clean is None
        and featmaps[0].shape[:3] == featmaps[1].shape[:3]
    )


def make_packed_tables(src_rgbs, featmaps, featmaps_clean=None,
                       compute_dtype="float32", unify_feat=False,
                       fuse_rgb=False, bspg_specs=None, spg_specs=None):
    """Corner-pack the gather tables once (outside any chunk loop).

    Returns {'rgb', 'feat': (coarse, fine), 'shapes', optionally 'feat_clean'};
    tables are cast to the compute dtype first so the packed rows carry the
    cheap representation through every chunk's gathers.

    With ``unify_feat`` (fine-pass tap reuse) the coarse and fine feature heads
    are packed as ONE channel-concatenated table instead: 'feat' is None and
    the dict gains 'feat_all' plus per-level channel ranges 'feat_slices'.
    Gather cost on TPU is per-row, so one 2C-channel row costs what a C-channel
    row does — and the same row then serves both render passes.

    With ``fuse_rgb`` each feature table additionally carries the PxP full-res
    RGB patch of its cell (grid_sample.pack_superrow_table): 'rgb' is None and
    the feature tables become superrow tables ('super'/'super_all' + 'p') —
    ONE gather per tap instead of two (row gathers are issue-rate bound).
    """
    from nerfool_tpu.ops.grid_sample import (
        pack_corner_table,
        pack_superrow_table,
    )

    dt = jnp.dtype(compute_dtype)
    cast = (lambda x: jnp.asarray(x).astype(dt)) if dt != jnp.float32 else jnp.asarray
    if spg_specs is not None:
        from nerfool_tpu.ops.spg import pack_patch_table as _ppt

        spec_f, spec_r = spg_specs
        if featmaps[0] is featmaps[1]:
            t = _ppt(cast(featmaps[0]), spec_f.p)
            feat_tables = (t, t)
        else:
            feat_tables = tuple(_ppt(cast(f), spec_f.p) for f in featmaps)
        return {
            "spg": {
                "feat": feat_tables,
                "rgb": _ppt(cast(src_rgbs), spec_r.p),
            },
            "shapes": {
                "rgb": src_rgbs.shape,
                "feat": tuple(f.shape for f in featmaps),
            },
        }
    if bspg_specs is not None:
        from nerfool_tpu.ops.bspg import pack_patch_table

        spec_f, spec_r = bspg_specs
        if featmaps[0] is featmaps[1]:
            t = pack_patch_table(cast(featmaps[0]), spec_f.p)
            feat_tables = (t, t)
        else:
            feat_tables = tuple(
                pack_patch_table(cast(f), spec_f.p) for f in featmaps
            )
        return {
            "bspg": {
                "feat": feat_tables,
                "rgb": pack_patch_table(cast(src_rgbs), spec_r.p),
            },
            "shapes": {
                "rgb": src_rgbs.shape,
                "feat": tuple(f.shape for f in featmaps),
            },
        }
    packed = {
        "rgb": None if fuse_rgb else pack_corner_table(cast(src_rgbs)),
        "shapes": {
            "rgb": src_rgbs.shape,
            "feat": tuple(f.shape for f in featmaps),
        },
        "super": None,
        "super_all": None,
        "p": None,
    }
    if unify_feat:
        c0 = featmaps[0].shape[-1]
        if featmaps[0] is featmaps[1]:  # gnt single_net: one shared head
            feat_all = jnp.asarray(featmaps[0])
            slices = ((0, c0), (0, c0))
        else:
            feat_all = jnp.concatenate(
                [jnp.asarray(f) for f in featmaps], axis=-1
            )
            slices = ((0, c0), (c0, c0 + featmaps[1].shape[-1]))
        packed["feat"] = None
        packed["feat_slices"] = slices
        packed["shapes"]["feat_all"] = feat_all.shape
        table = pack_corner_table(cast(feat_all))
        if fuse_rgb:
            packed["super_all"], packed["p"] = pack_superrow_table(
                cast(src_rgbs), table, feat_all.shape
            )
        else:
            packed["feat_all"] = table
    elif fuse_rgb:
        packed["feat"] = None
        rgb_cast = cast(src_rgbs)
        if featmaps[0] is featmaps[1]:
            t, p = pack_superrow_table(
                rgb_cast, pack_corner_table(cast(featmaps[0])), featmaps[0].shape
            )
            packed["super"], packed["p"] = (t, t), p
        else:
            tables = []
            for f in featmaps:
                t, p = pack_superrow_table(
                    rgb_cast, pack_corner_table(cast(f)), f.shape
                )
                tables.append(t)
            packed["super"], packed["p"] = tuple(tables), p
    else:
        packed["feat"] = tuple(pack_corner_table(cast(f)) for f in featmaps)
    if featmaps_clean is not None:
        packed["feat_clean"] = tuple(
            pack_corner_table(cast(f)) for f in featmaps_clean
        )
        packed["shapes"]["feat_clean"] = tuple(f.shape for f in featmaps_clean)
    return packed


def _rayfold_active(model, cfg, n_rays):
    """Gather-native ray packing applies: GNT aggregator with ray_fold=2 and
    an even ray count (models/gnt.py inputs_packed)."""
    return (cfg.backbone == "gnt"
            and getattr(model["net_coarse"], "ray_fold", 1) == 2
            and n_rays % 2 == 0)


def _gather_and_shade(params, model, cfg, pts, ray_batch, src_rgbs, src_cameras,
                      featmap, level, ray_d, packed_rgb=None, packed_feat=None,
                      feat_shape=None, packed_super=None, super_p=None,
                      rgb_shape=None):
    """Project points into source views and run the aggregator.

    With a ray_fold=2 GNT aggregator the sample points are fed in ray-packed
    ORDER, so the point-order-agnostic gather emits the packed layout
    natively (no relayout of the [V,R,S,*] operands — see
    _render_rays_bspg's rayfold notes)."""
    dt = jnp.dtype(cfg.compute_dtype)
    if dt != jnp.float32 and packed_feat is None and packed_super is None:
        featmap = featmap.astype(dt)
    if dt != jnp.float32 and packed_rgb is None and packed_super is None:
        src_rgbs_gather = src_rgbs.astype(dt)
    else:
        src_rgbs_gather = src_rgbs
    r, s = pts.shape[0], pts.shape[1]
    rayfold = _rayfold_active(model, cfg, r)
    xyz = (pts.reshape(r // 2, 2, s, 3).swapaxes(1, 2) if rayfold else pts)
    rgb, feat, ray_diff, mask = epipolar_gather_components(
        xyz,
        ray_batch["camera"].reshape(-1)[:34],
        src_rgbs_gather,
        src_cameras,
        featmap,
        stop_camera_grad=cfg.stop_camera_grad,
        packed_rgb=packed_rgb,
        packed_feat=packed_feat,
        feat_shape=feat_shape,
        packed_super=packed_super,
        super_p=super_p,
        rgb_shape=rgb_shape,
    )
    v = mask.shape[0]
    if rayfold:
        r2 = r // 2
        # [V, R/2, S, 2, C] -> packed channel segments (free reshapes)
        rgb_feat = jnp.concatenate(
            [rgb.reshape(v, r2, s, -1), feat.reshape(v, r2, s, -1)], axis=-1)
        ray_diff = ray_diff.reshape(v, r2, s, 8)
        mask = mask.reshape(v, r2, s, 2)
        raw = _shade_raw(params, model, cfg, rgb_feat, ray_diff, mask, xyz,
                         ray_d.reshape(r2, 2, 3), level, inputs_packed=True)
        pm = jnp.sum(mask, axis=0) > 1  # [R/2, S, 2]
        pixel_mask = pm.transpose(0, 2, 1).reshape(r, s)
        return raw, pixel_mask
    rgb_feat = jnp.concatenate([rgb, feat], axis=-1)
    raw = _shade_raw(params, model, cfg, rgb_feat, ray_diff, mask, pts, ray_d,
                     level)
    pixel_mask = jnp.sum(mask[..., 0], axis=0) > 1  # >= 2 observations (views-first)
    return raw, pixel_mask


def _shade_raw(params, model, cfg, rgb_feat, ray_diff, mask, pts, ray_d, level,
               inputs_packed=False):
    """Run the aggregator on gathered taps; returns raw outputs in float32."""
    dt = jnp.dtype(cfg.compute_dtype)
    if dt != jnp.float32:
        rgb_feat = rgb_feat.astype(dt)
        ray_diff = ray_diff.astype(dt)
        mask = mask.astype(dt)
        params = jax.tree.map(lambda p: p.astype(dt), params)
    shade = make_shade_fn(model, cfg)
    net_key = "net_coarse" if (level == "coarse" or cfg.single_net) else "net_fine"
    raw = shade(params[net_key], model[net_key], rgb_feat, ray_diff, mask,
                pts.astype(dt), ray_d.astype(dt), inputs_packed=inputs_packed)
    # promote back: f32 for bf16/f32 compute, but keep f64 pipelines (x64
    # parity tests) lossless end to end
    return raw.astype(jnp.result_type(jnp.float32, rgb_feat.dtype))


def _finalize_level(cfg: RenderConfig, raw, z_vals, pixel_mask, noise_key):
    """Raw aggregator outputs -> per-ray render outputs."""
    if cfg.backbone == "ibrnet":
        return raw2outputs(
            raw, z_vals, pixel_mask, white_bkgd=cfg.white_bkgd,
            geo_noise=cfg.geo_noise, key=noise_key,
        )
    # gnt: rgb directly; attention map doubles as compositing weights
    if cfg.ret_alpha:
        rgb, weights = raw[:, :3], raw[:, 3:]
        depth = jnp.sum(weights * z_vals, axis=-1)
    else:
        rgb, weights, depth = raw, None, None
    # NOTE: no validity mask — the GNT stack's outputs carry none, so its
    # criterion falls back to a plain mean (gnt/criterion.py:9-22) and its
    # whole-image render does no white painting
    return {"rgb": rgb, "weights": weights, "depth": depth}


def render_rays(
    params,
    model,
    ray_batch,
    featmaps,
    cfg: RenderConfig,
    src_rgbs=None,
    src_cameras=None,
    key: Optional[jax.Array] = None,
    featmaps_clean=None,
    packed=None,
):
    """Render a batch of rays end to end (coarse + optional fine pass).

    :param params: {'net_coarse': ..., 'net_fine': ...} flax param trees
    :param model: same keys, flax Modules
    :param ray_batch: dict with ray_o [R,3], ray_d [R,3], depth_range [1,2],
        camera [34] or [1,34]; optionally rgb [R,3]
    :param featmaps: (coarse [V,Hf,Wf,C], fine [V,Hf,Wf,C]) from the feature net
    :param cfg: static RenderConfig
    :param src_rgbs: [V,H,W,3] source images (the ``src_ray_batch`` override of
        the reference: rays come from the target view, sources may be global)
    :param src_cameras: [V,34]
    :param featmaps_clean: optional clean featmaps for hybrid rendering
    :return: {'outputs_coarse': {...}, 'outputs_fine': {...}|None}
    """
    keys = jax.random.split(key, 4) if key is not None else [None] * 4
    pts, z_vals = sample_along_camera_ray(
        ray_batch["ray_o"], ray_batch["ray_d"], ray_batch["depth_range"],
        cfg.n_samples, inv_uniform=cfg.inv_uniform, det=cfg.det, key=keys[0],
    )
    ray_d = ray_batch["ray_d"]
    hybrid = cfg.use_clean_color or cfg.use_clean_density
    if packed is None:
        packed = make_packed_tables(
            src_rgbs, featmaps, featmaps_clean, cfg.compute_dtype,
            unify_feat=wants_unified_tables(cfg, featmaps, featmaps_clean),
            fuse_rgb=cfg.fuse_rgb_rows and featmaps_clean is None and not hybrid,
            bspg_specs=cfg.bspg_specs if not hybrid
            and featmaps_clean is None else None,
            spg_specs=cfg.spg_specs if not hybrid
            and featmaps_clean is None else None,
        )
    if packed.get("spg") is not None:  # per-ray segment-patch gather
        return _render_rays_spg(
            params, model, ray_batch, cfg, src_rgbs, src_cameras, keys, packed,
            pts, z_vals,
        )
    if packed.get("bspg") is not None:  # block segment-patch gather
        return _render_rays_bspg(
            params, model, ray_batch, cfg, src_rgbs, src_cameras, keys, packed,
            pts, z_vals,
        )
    if "feat_slices" in packed:  # unified tables -> fine-pass tap reuse
        return _render_rays_reuse(
            params, model, ray_batch, cfg, src_rgbs, src_cameras, keys, packed,
            pts, z_vals,
        )

    def run_level(pts, z_vals, level, li, noise_key):
        super_tabs = packed.get("super")
        raw, pixel_mask = _gather_and_shade(
            params, model, cfg, pts, ray_batch, src_rgbs, src_cameras,
            featmaps[li], level, ray_d,
            packed_rgb=packed["rgb"],
            packed_feat=None if super_tabs else packed["feat"][li],
            feat_shape=packed["shapes"]["feat"][li],
            packed_super=super_tabs[li] if super_tabs else None,
            super_p=packed.get("p"),
            rgb_shape=packed["shapes"]["rgb"],
        )
        # Hybrid clean/adv mixing (the paper's density-vs-color vulnerability
        # analysis). The two references differ: ibrnet mixes raw color/sigma
        # at BOTH levels (render_rays_hybrid, ibrnet/render_ray.py:311-322,
        # 375-386); gnt mixes only the COARSE outputs — rgb from the clean
        # branch under use_clean_color, the attention-weight vector under
        # use_clean_density, while depth always stays the adv branch's and
        # the fine pass renders adv features unmixed
        # (gnt/render_ray.py:343-364,367-387).
        hybrid_here = (cfg.use_clean_color or cfg.use_clean_density) and (
            cfg.backbone == "ibrnet" or level == "coarse"
        )
        if hybrid_here:
            raw_clean, _ = _gather_and_shade(
                params, model, cfg, pts, ray_batch, src_rgbs, src_cameras,
                featmaps_clean[li], level, ray_d,
                packed_rgb=packed["rgb"],
                packed_feat=packed["feat_clean"][li],
                feat_shape=packed["shapes"]["feat_clean"][li],
            )
            if cfg.backbone == "ibrnet":
                color = raw_clean[..., :3] if cfg.use_clean_color else raw[..., :3]
                sigma = raw_clean[..., 3:4] if cfg.use_clean_density else raw[..., 3:4]
                raw = jnp.concatenate([color, sigma], axis=-1)
            else:
                out = _finalize_level(cfg, raw, z_vals, pixel_mask, noise_key)
                out_clean = _finalize_level(cfg, raw_clean, z_vals, pixel_mask,
                                            noise_key)
                return {
                    "rgb": out_clean["rgb"] if cfg.use_clean_color else out["rgb"],
                    "weights": (out_clean["weights"] if cfg.use_clean_density
                                else out["weights"]),
                    "depth": out["depth"],  # adv depth either way (ref quirk)
                }

        return _finalize_level(cfg, raw, z_vals, pixel_mask, noise_key)

    outputs_coarse = run_level(pts, z_vals, "coarse", 0, keys[1])
    ret = {"outputs_coarse": outputs_coarse, "outputs_fine": None}

    if cfg.n_importance > 0:
        weights = jax.lax.stop_gradient(outputs_coarse["weights"])
        z_all = sample_fine_zvals(
            z_vals, weights, cfg.n_importance, inv_uniform=cfg.inv_uniform,
            det=cfg.det, key=keys[2],
        )
        pts_fine = z_all[..., None] * ray_d[:, None, :] + ray_batch["ray_o"][:, None, :]
        ret["outputs_fine"] = run_level(pts_fine, z_all, "fine", 1, keys[3])
    return ret


def _render_rays_reuse(params, model, ray_batch, cfg: RenderConfig, src_rgbs,
                       src_cameras, keys, packed, pts, z_vals):
    """Coarse+fine rendering with fine-pass tap reuse (unified feature table).

    The fine pass of the reference re-projects and re-gathers ALL
    n_samples+n_importance merged points (/root/reference/ibrnet/render_ray.py:
    235-248). Here the coarse taps (rgb, features, ray_diff, mask) are kept,
    only the n_importance NEW importance samples are gathered, and the merged
    sample axis is restored with one on-chip permute — the random-row HBM
    gathers (and their backward scatters, which carry the attack gradient into
    delta) drop from 2S+2(S+I) to 2S+2I rows per ray: one third fewer at the
    flagship S=I=64 setting. Both feature heads ride ONE unified table whose
    2C-channel rows cost the same per-row gather as C-channel rows.
    """
    cam = ray_batch["camera"].reshape(-1)[:34]
    ray_o, ray_d = ray_batch["ray_o"], ray_batch["ray_d"]
    sl0, sl1 = packed["feat_slices"]
    fshape = packed["shapes"]["feat_all"]
    gather_kw = dict(
        stop_camera_grad=cfg.stop_camera_grad,
        packed_rgb=packed["rgb"],
        packed_feat=packed.get("feat_all"),
        feat_shape=fshape,
        packed_super=packed.get("super_all"),
        super_p=packed.get("p"),
        rgb_shape=packed["shapes"]["rgb"],
    )

    rgb_c, feat_c, rd_c, m_c = epipolar_gather_components(
        pts, cam, src_rgbs, src_cameras, None, **gather_kw
    )
    rgb_feat_c = jnp.concatenate([rgb_c, feat_c[..., sl0[0]:sl0[1]]], axis=-1)
    raw_c = _shade_raw(params, model, cfg, rgb_feat_c, rd_c, m_c, pts, ray_d,
                       "coarse")
    pmask_c = jnp.sum(m_c[..., 0], axis=0) > 1
    outputs_coarse = _finalize_level(cfg, raw_c, z_vals, pmask_c, keys[1])
    ret = {"outputs_coarse": outputs_coarse, "outputs_fine": None}

    weights = jax.lax.stop_gradient(outputs_coarse["weights"])
    z_all, order, z_new = sample_fine_zvals(
        z_vals, weights, cfg.n_importance, inv_uniform=cfg.inv_uniform,
        det=cfg.det, key=keys[2], return_order=True,
    )
    pts_new = z_new[..., None] * ray_d[:, None, :] + ray_o[:, None, :]
    rgb_n, feat_n, rd_n, m_n = epipolar_gather_components(
        pts_new, cam, src_rgbs, src_cameras, None, **gather_kw
    )
    # restore sorted-z sample order with a one-hot matmul: a per-ray
    # (S+I)x(S+I) permutation rides the MXU with natural layouts
    # (take_along_axis lowers to a gather whose forced operand layout pads
    # these tensors ~200x on TPU) and its backward is a transposed matmul
    # instead of a scatter. Only the channels the fine pass consumes are
    # permuted — the fine head slice is taken BEFORE the permute and the
    # components ride separate einsums (an op-profile on v5e showed a combined
    # all-channel concat + permute dominating the whole render with data
    # formatting traffic)
    dt = rgb_c.dtype
    s_all = rgb_c.shape[2] + rgb_n.shape[2]
    perm = jax.nn.one_hot(order, s_all, dtype=dt)  # [R, S+I, S+I]

    def permute(pre):  # [V, R, S+I, C] pre-sort [coarse | new] -> sorted
        return jnp.einsum("rij,vrjk->vrik", perm, pre)

    rgb_feat_f = permute(jnp.concatenate([
        jnp.concatenate([rgb_c, feat_c[..., sl1[0]:sl1[1]]], axis=-1),
        jnp.concatenate([rgb_n, feat_n[..., sl1[0]:sl1[1]]], axis=-1),
    ], axis=2))
    rd_f = permute(jnp.concatenate([rd_c, rd_n], axis=2).astype(dt))
    m_f = permute(jnp.concatenate([m_c, m_n], axis=2).astype(dt))
    pts_fine = z_all[..., None] * ray_d[:, None, :] + ray_o[:, None, :]
    raw_f = _shade_raw(params, model, cfg, rgb_feat_f, rd_f, m_f, pts_fine,
                       ray_d, "fine")
    pmask_f = jnp.sum(m_f[..., 0], axis=0) > 1
    ret["outputs_fine"] = _finalize_level(cfg, raw_f, z_all, pmask_f, keys[3])
    return ret


def _render_rays_spg(params, model, ray_batch, cfg: RenderConfig, src_rgbs,
                     src_cameras, keys, packed, pts, z_vals):
    """Coarse+fine rendering through the per-RAY segment-patch gather.

    The attack-step twin of ``_render_rays_bspg`` for random-pixel ray
    batches (no block structure): per (ray, view) the <= K patch rows its
    epipolar segment crosses are enumerated once (slot walk over the clipped
    segment, ops/spg.py) and ONE patch gather serves both render passes —
    fine z-values stay inside [near, far], which the segment covers by
    construction. Replaces the per-tap random-row gather and, in the
    backward pass, turns the attack gradient's per-tap scatter-add into a
    K-patch-row scatter plus transposed one-hot matmuls.

    Differentiability matches the per-tap path: table gradients flow through
    the selection matmuls into ``pack_patch_table`` (reshape-only backward),
    coordinate gradients through the bilinear fractions (slot ids and
    integer cells are stop-gradient, exactly like the per-tap floor).
    """
    from nerfool_tpu.ops.spg import (
        build_slots,
        gather_patches,
        project_endpoints,
        select_samples,
    )
    from nerfool_tpu.render.projection import (
        compute_angle_planes,
        inbound_mask_planes,
        project_points_planes,
    )

    spec_f, spec_r = cfg.spg_specs
    r = pts.shape[0]
    v = src_cameras.shape[0]
    cam = ray_batch["camera"].reshape(-1)[:34]
    # same camera-gradient semantics as epipolar_gather (projection.py:129):
    # IBRNet detaches the source cameras, GNT / camera attacks do not. The
    # slot WALK always sees detached endpoints (build_slots stop-grads
    # internally — slot ids are integers).
    if cfg.stop_camera_grad:
        src_cameras = jax.lax.stop_gradient(src_cameras)
    h = jax.lax.stop_gradient(src_cameras[0, 0])
    w = jax.lax.stop_gradient(src_cameras[0, 1])

    ray_o, ray_d = ray_batch["ray_o"], ray_batch["ray_d"]
    near = ray_batch["depth_range"].reshape(-1)[0]
    far = ray_batch["depth_range"].reshape(-1)[1]
    pa, pb = project_endpoints(ray_o + ray_d * near, ray_o + ray_d * far,
                               src_cameras)  # [V, R, 3] homogeneous

    slots_f = build_slots(pa, pb, spec_f)
    slots_r = build_slots(pa, pb, spec_r)
    tabs = packed["spg"]
    g_rgb = gather_patches(tabs["rgb"], slots_r, spec_r)
    c_feat = packed["shapes"]["feat"][0][-1]

    def sample_level(pts_l, li):
        s = pts_l.shape[1]
        flat = pts_l.reshape(-1, 3)
        px, py, front = project_points_planes(flat, src_cameras)
        gx = 2.0 * px / (w - 1.0) - 1.0
        gy = 2.0 * py / (h - 1.0) - 1.0
        g_f = gather_patches(tabs["feat"][li], slots_f, spec_f)
        feat = select_samples(g_f, slots_f, gx, gy, spec_f, c_feat
                              ).reshape(v, r, s, c_feat)
        rgb = select_samples(g_rgb, slots_r, gx, gy, spec_r, 3
                             ).reshape(v, r, s, 3)
        dxp, dyp, dzp, dot = compute_angle_planes(flat, cam, src_cameras)
        ray_diff = jnp.stack([dxp, dyp, dzp, dot], axis=-1).reshape(v, r, s, 4)
        mask = (inbound_mask_planes(px, py, h, w) & front).astype(
            rgb.dtype
        ).reshape(v, r, s, 1)
        rgb_feat = jnp.concatenate([rgb, feat], axis=-1)
        return rgb_feat, ray_diff, mask

    ray_d_full = ray_batch["ray_d"]
    rgb_feat_c, rd_c, m_c = sample_level(pts, 0)
    raw_c = _shade_raw(params, model, cfg, rgb_feat_c, rd_c, m_c, pts,
                       ray_d_full, "coarse")
    pmask_c = jnp.sum(m_c[..., 0], axis=0) > 1
    outputs_coarse = _finalize_level(cfg, raw_c, z_vals, pmask_c, keys[1])
    ret = {"outputs_coarse": outputs_coarse, "outputs_fine": None}

    if cfg.n_importance > 0:
        weights = jax.lax.stop_gradient(outputs_coarse["weights"])
        z_all = sample_fine_zvals(
            z_vals, weights, cfg.n_importance, inv_uniform=cfg.inv_uniform,
            det=cfg.det, key=keys[2],
        )
        pts_fine = (z_all[..., None] * ray_d_full[:, None, :]
                    + ray_batch["ray_o"][:, None, :])
        rgb_feat_f, rd_f, m_f = sample_level(pts_fine, 1)
        raw_f = _shade_raw(params, model, cfg, rgb_feat_f, rd_f, m_f, pts_fine,
                           ray_d_full, "fine")
        pmask_f = jnp.sum(m_f[..., 0], axis=0) > 1
        ret["outputs_fine"] = _finalize_level(cfg, raw_f, z_all, pmask_f,
                                              keys[3])
    return ret


def _render_rays_bspg(params, model, ray_batch, cfg: RenderConfig, src_rgbs,
                      src_cameras, keys, packed, pts, z_vals):
    """Coarse+fine rendering through the block segment-patch gather.

    Rays must arrive BLOCK-MAJOR (render_image reorders raster rays into
    bh x bw pixel blocks). Per chunk: one slot walk + one patch-row gather per
    (block, view) serves BOTH passes (fine z-values stay inside [near, far],
    which the block tube covers by construction) — there is no per-tap gather,
    no fine-pass re-gather and no sample-order permute left.
    """
    from nerfool_tpu.ops.bspg import (
        build_block_slots,
        gather_block_patches,
        select_block_samples,
        select_block_samples_win,
    )
    from nerfool_tpu.ops.spg import project_endpoints
    from nerfool_tpu.render.projection import (
        compute_angle_planes,
        inbound_mask_planes,
        project_points_planes,
    )

    spec_f, spec_r = cfg.bspg_specs
    bh, bw = spec_f.block
    npb = bh * bw
    r = pts.shape[0]
    assert r % npb == 0, f"BSPG needs block-major rays: {r} % {npb}"
    b = r // npb
    v = src_cameras.shape[0]
    cam = ray_batch["camera"].reshape(-1)[:34]
    src_cameras = jax.lax.stop_gradient(src_cameras)
    h = src_cameras[0, 0]
    w = src_cameras[0, 1]
    dt = jnp.dtype(cfg.compute_dtype)

    ray_o, ray_d = ray_batch["ray_o"], ray_batch["ray_d"]
    near = ray_batch["depth_range"].reshape(-1)[0]
    far = ray_batch["depth_range"].reshape(-1)[1]
    ro_b = ray_o.reshape(b, npb, 3)
    rd_b = ray_d.reshape(b, npb, 3)
    cidx = jnp.asarray([0, bw - 1, (bh - 1) * bw, npb - 1])
    pa_w = (ro_b[:, cidx] + rd_b[:, cidx] * near).reshape(-1, 3)
    pb_w = (ro_b[:, cidx] + rd_b[:, cidx] * far).reshape(-1, 3)
    pa, pb = project_endpoints(pa_w, pb_w, src_cameras)
    pa = pa.reshape(v, b, 4, 3)
    pb = pb.reshape(v, b, 4, 3)

    slots_f, starts_f = build_block_slots(pa, pb, spec_f, return_starts=True)
    slots_r, starts_r = build_block_slots(pa, pb, spec_r, return_starts=True)
    tabs = packed["bspg"]
    g_rgb = gather_block_patches(tabs["rgb"], slots_r, spec_r)
    c_feat = packed["shapes"]["feat"][0][-1]
    windowed = cfg.bspg_window and cfg.bspg_pallas

    # GNT ray_fold: the gather emits the ray-packed layout NATIVELY.
    # The selection's depth-major kernels pay one exit transpose either way
    # (packed moves 2c-contiguous runs — cheaper); ray_diff / mask / the
    # positional encodings are elementwise over sample points, so feeding
    # packed-ORDER points makes their packed layout free. This removes the
    # pack_rays2 relayouts of the big [V,R,S,*] operands that inverted the
    # ray-fold chain win end-to-end (BENCH_NOTES round-4 ray-fold section).
    rayfold = (cfg.backbone == "gnt"
               and getattr(model["net_coarse"], "ray_fold", 1) == 2
               and npb % 2 == 0)

    def sample_level(pts_l, li):
        s = pts_l.shape[1]
        flat = pts_l.reshape(-1, 3)
        px, py, front = project_points_planes(flat, src_cameras)
        gx = 2.0 * px / (w - 1.0) - 1.0
        gy = 2.0 * py / (h - 1.0) - 1.0
        gxb = gx.reshape(v, b, npb, s)
        gyb = gy.reshape(v, b, npb, s)
        g_f = gather_block_patches(tabs["feat"][li], slots_f, spec_f)
        r2 = r // 2
        if windowed:
            feat = select_block_samples_win(
                g_f, slots_f, starts_f, gxb, gyb, spec_f, c_feat,
                packed_pairs=rayfold,
            )
            rgb = select_block_samples_win(
                g_rgb, slots_r, starts_r, gxb, gyb, spec_r, 3,
                packed_pairs=rayfold,
            )
        else:
            feat = select_block_samples(
                g_f, slots_f, gxb, gyb, spec_f, c_feat,
                use_pallas=cfg.bspg_pallas, packed_pairs=rayfold,
            )
            rgb = select_block_samples(
                g_rgb, slots_r, gxb, gyb, spec_r, 3,
                use_pallas=cfg.bspg_pallas, packed_pairs=rayfold,
            )
        if rayfold:
            feat = feat.reshape(v, r2, s, 2 * c_feat)  # [fA|fB]
            rgb = rgb.reshape(v, r2, s, 6)  # [rgbA|rgbB]
            # packed-ORDER points: [R/2, S, 2, 3]; every plane op below is
            # elementwise over points, so its packed layout costs nothing
            # (the tiny pts transpose fuses into the projection chain)
            pts_pk = pts_l.reshape(r2, 2, s, 3).swapaxes(1, 2)
            flat_pk = pts_pk.reshape(-1, 3)
            px_pk, py_pk, front_pk = project_points_planes(flat_pk, src_cameras)
            dxp, dyp, dzp, dot = compute_angle_planes(flat_pk, cam, src_cameras)
            ray_diff = jnp.stack(
                [dxp, dyp, dzp, dot], axis=-1).reshape(v, r2, s, 2, 4)
            ray_diff = ray_diff.reshape(v, r2, s, 8)  # [rdA|rdB]
            mask = (inbound_mask_planes(px_pk, py_pk, h, w) & front_pk).astype(
                rgb.dtype).reshape(v, r2, s, 2)
            rgb_feat = jnp.concatenate([rgb, feat], axis=-1)  # segments (3, F)
            pm = jnp.sum(mask, axis=0) > 1  # [r2, s, 2] (pair axis last)
            pmask = pm.transpose(0, 2, 1).reshape(r, s)
            return rgb_feat, ray_diff, mask, pts_pk, pmask
        feat = feat.reshape(v, r, s, c_feat)
        rgb = rgb.reshape(v, r, s, 3)
        dxp, dyp, dzp, dot = compute_angle_planes(flat, cam, src_cameras)
        ray_diff = jnp.stack([dxp, dyp, dzp, dot], axis=-1).reshape(v, r, s, 4)
        mask = (inbound_mask_planes(px, py, h, w) & front).astype(
            rgb.dtype
        ).reshape(v, r, s, 1)
        rgb_feat = jnp.concatenate([rgb, feat], axis=-1)
        pmask = jnp.sum(mask[..., 0], axis=0) > 1
        return rgb_feat, ray_diff, mask, pts_l, pmask

    ray_d_full = ray_batch["ray_d"]
    rd_shade = (ray_d_full.reshape(r // 2, 2, 3) if rayfold else ray_d_full)
    rgb_feat_c, rd_c, m_c, pts_c, pmask_c = sample_level(pts, 0)
    raw_c = _shade_raw(params, model, cfg, rgb_feat_c, rd_c, m_c, pts_c,
                       rd_shade, "coarse", inputs_packed=rayfold)
    outputs_coarse = _finalize_level(cfg, raw_c, z_vals, pmask_c, keys[1])
    ret = {"outputs_coarse": outputs_coarse, "outputs_fine": None}

    if cfg.n_importance > 0:
        weights = jax.lax.stop_gradient(outputs_coarse["weights"])
        z_all = sample_fine_zvals(
            z_vals, weights, cfg.n_importance, inv_uniform=cfg.inv_uniform,
            det=cfg.det, key=keys[2],
        )
        pts_fine = (z_all[..., None] * ray_d_full[:, None, :]
                    + ray_batch["ray_o"][:, None, :])
        rgb_feat_f, rd_f, m_f, pts_f, pmask_f = sample_level(pts_fine, 1)
        raw_f = _shade_raw(params, model, cfg, rgb_feat_f, rd_f, m_f, pts_f,
                           rd_shade, "fine", inputs_packed=rayfold)
        ret["outputs_fine"] = _finalize_level(cfg, raw_f, z_all, pmask_f,
                                              keys[3])
    return ret
