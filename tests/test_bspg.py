"""Block segment-patch gather: exact parity with the per-tap bilinear gather
for raster ray blocks of a real projected scene (coverage through the dilated
center-path walk, planner-verified tube bound)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import llff_rig_scene, synthetic_scene

from nerfool_tpu.ops.grid_sample import gather_bilinear_planes
from nerfool_tpu.ops import bspg
from nerfool_tpu.ops.spg import project_endpoints
from nerfool_tpu.render.projection import project_points_planes
from nerfool_tpu.render.sampling import sample_along_camera_ray
from nerfool_tpu.utils.cameras import get_rays

H = W = 32
BLOCK = (4, 4)


def _block_rays(rays_o, rays_d, h, w, bh, bw):
    """Raster rays [h*w, 3] -> block-major [B, bh*bw, 3]."""
    def blk(x):
        x = x.reshape(h // bh, bh, w // bw, bw, 3)
        return x.transpose(0, 2, 1, 3, 4).reshape(-1, bh * bw, 3)
    return blk(rays_o), blk(rays_d)


def _setup(rng, n_src=4, n_samples=12, images=None, scale=1, block=BLOCK):
    target_cam, src_rgbs, src_cams, _, depth_range = llff_rig_scene(
        rng, n_src=n_src, h=H, w=W
    )
    if images is None:
        hs, ws = (H - 1) // scale + 1, (W - 1) // scale + 1
        images = rng.rand(n_src, hs, ws, 3).astype(np.float32)
    hs, ws = images.shape[1:3]

    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
    pts, z_vals = sample_along_camera_ray(
        rays_o, rays_d, jnp.asarray(depth_range), n_samples, det=True
    )
    bh, bw = block
    ro_b, rd_b = _block_rays(np.asarray(rays_o), np.asarray(rays_d), H, W, bh, bw)
    b = ro_b.shape[0]

    groups, r_max = bspg.plan_block_groups(
        target_cam[None], src_cams, depth_range.reshape(-1), (hs, ws),
        p=12, block=block,
    )
    spec = bspg.make_block_spec(groups, 12, (hs, ws), (H, W), block=block)

    # corner rays of each block: indices 0, bw-1, (bh-1)*bw, bh*bw-1
    cidx = np.array([0, bw - 1, (bh - 1) * bw, bh * bw - 1])
    near, far = float(depth_range[0, 0]), float(depth_range[0, 1])
    pa_c = ro_b[:, cidx] + rd_b[:, cidx] * near  # [B, 4, 3]
    pb_c = ro_b[:, cidx] + rd_b[:, cidx] * far
    pa, pb = project_endpoints(jnp.asarray(pa_c.reshape(-1, 3)),
                               jnp.asarray(pb_c.reshape(-1, 3)),
                               jnp.asarray(src_cams))
    v = src_cams.shape[0]
    pa = pa.reshape(v, b, 4, 3)
    pb = pb.reshape(v, b, 4, 3)

    # per-sample normalized coords through the real projector
    flat = pts.reshape(-1, 3)
    px, py, _ = project_points_planes(flat, jnp.asarray(src_cams))
    gx = 2.0 * px / (W - 1.0) - 1.0
    gy = 2.0 * py / (H - 1.0) - 1.0
    return (images, spec, pa, pb, gx, gy, src_cams, pts, z_vals,
            rays_o, rays_d, b)


def _to_blocks(gx, h, w, bh, bw, s):
    """[V, h*w*s] -> [V, B, bh*bw, S] matching block-major ray order."""
    v = gx.shape[0]
    x = gx.reshape(v, h // bh, bh, w // bw, bw, s)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        v, (h // bh) * (w // bw), bh * bw, s
    )


@pytest.mark.parametrize("scale", [1, 4])
def test_bspg_matches_per_tap(rng, scale):
    (images, spec, pa, pb, gx, gy, src_cams, pts, z_vals,
     rays_o, rays_d, b) = _setup(rng, scale=scale)
    s = pts.shape[1]
    ref = gather_bilinear_planes(jnp.asarray(images), gx, gy)

    table = bspg.pack_patch_table(jnp.asarray(images), spec.p)
    slots = bspg.build_block_slots(pa, pb, spec)
    g = bspg.gather_block_patches(table, slots, spec)
    gxb = _to_blocks(gx, H, W, *BLOCK, s)
    gyb = _to_blocks(gy, H, W, *BLOCK, s)
    out = bspg.select_block_samples(g, slots, gxb, gyb, spec, 3)
    ref_b = _to_blocks(ref.reshape(ref.shape[0], -1), H, W, *BLOCK,
                       s * 3).reshape(out.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_b),
                               rtol=1e-5, atol=1e-6)


def test_bspg_block16_matches_per_tap(rng):
    """16x16 pixel blocks (the BENCH_BSPG_BLOCK=16 bench variant): block size
    is carried by the spec, not assumed by pack/slots/selection."""
    blk = (16, 16)
    (images, spec, pa, pb, gx, gy, src_cams, pts, z_vals,
     rays_o, rays_d, b) = _setup(rng, block=blk)
    s = pts.shape[1]
    ref = gather_bilinear_planes(jnp.asarray(images), gx, gy)

    table = bspg.pack_patch_table(jnp.asarray(images), spec.p)
    slots = bspg.build_block_slots(pa, pb, spec)
    g = bspg.gather_block_patches(table, slots, spec)
    gxb = _to_blocks(gx, H, W, *blk, s)
    gyb = _to_blocks(gy, H, W, *blk, s)
    out = bspg.select_block_samples(g, slots, gxb, gyb, spec, 3)
    ref_b = _to_blocks(ref.reshape(ref.shape[0], -1), H, W, *blk,
                       s * 3).reshape(out.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_b),
                               rtol=1e-5, atol=1e-6)


def test_bspg_fine_samples_reuse_slots(rng):
    """Fine z-values (arbitrary within [near, far]) select exactly from the
    slots built for the block — no re-gather needed for the fine pass."""
    (images, spec, pa, pb, _, _, src_cams, pts, z_vals,
     rays_o, rays_d, b) = _setup(rng)
    s_fine = 17
    zr = np.asarray(z_vals)
    z_fine = (zr[:, :1] + (zr[:, -1:] - zr[:, :1])
              * np.sort(np.random.RandomState(5).rand(zr.shape[0], s_fine), -1))
    pts_f = (jnp.asarray(z_fine)[..., None] * rays_d[:, None, :]
             + rays_o[:, None, :])
    px, py, _ = project_points_planes(pts_f.reshape(-1, 3),
                                      jnp.asarray(src_cams))
    gx = 2.0 * px / (W - 1.0) - 1.0
    gy = 2.0 * py / (H - 1.0) - 1.0
    ref = gather_bilinear_planes(jnp.asarray(images), gx, gy)

    table = bspg.pack_patch_table(jnp.asarray(images), spec.p)
    slots = bspg.build_block_slots(pa, pb, spec)
    g = bspg.gather_block_patches(table, slots, spec)
    gxb = _to_blocks(gx, H, W, *BLOCK, s_fine)
    gyb = _to_blocks(gy, H, W, *BLOCK, s_fine)
    out = bspg.select_block_samples(g, slots, gxb, gyb, spec, 3)
    ref_b = _to_blocks(ref.reshape(ref.shape[0], -1), H, W, *BLOCK,
                       s_fine * 3).reshape(out.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_b),
                               rtol=1e-5, atol=1e-6)


def test_bspg_planner_rejects_oversized_tube():
    """A huge block with a tiny patch must violate r + 2 <= p and raise."""
    rng = np.random.RandomState(0)
    target_cam, _, src_cams, _, depth_range = synthetic_scene(
        rng, n_src=2, h=H, w=W
    )
    with pytest.raises(ValueError, match="dilation bound"):
        bspg.plan_block_groups(
            target_cam[None], src_cams, depth_range.reshape(-1), (H, W),
            p=2, block=(16, 16),
        )


def test_bspg_pallas_select_matches_xla(rng):
    """Pallas selection kernel (interpret mode on CPU) == XLA selection."""
    (images, spec, pa, pb, gx, gy, src_cams, pts, z_vals,
     rays_o, rays_d, b) = _setup(rng)
    s = pts.shape[1]
    table = bspg.pack_patch_table(jnp.asarray(images), spec.p)
    slots = bspg.build_block_slots(pa, pb, spec)
    g = bspg.gather_block_patches(table, slots, spec)
    gxb = _to_blocks(gx, H, W, *BLOCK, s)
    gyb = _to_blocks(gy, H, W, *BLOCK, s)
    ref = bspg.select_block_samples(g, slots, gxb, gyb, spec, 3)
    out = bspg.select_block_samples(g, slots, gxb, gyb, spec, 3,
                                    use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_bspg_whole_image_render_matches(rng):
    """render_single_image with BSPG == per-tap path (IBRNet, coarse+fine)."""
    import dataclasses

    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.ops.bspg import plan_render_specs
    from nerfool_tpu.render.render_image import render_single_image
    from nerfool_tpu.render.render_rays import RenderConfig

    target_cam, src_rgbs, src_cams, _, depth_range = llff_rig_scene(
        rng, n_src=3, h=H, w=W
    )
    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(3))
    feats = bundle.extract_features(jnp.asarray(src_rgbs))
    cfg = RenderConfig(n_samples=12, n_importance=8, det=True,
                       backbone="ibrnet")
    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
    batch = {
        "ray_o": rays_o, "ray_d": rays_d,
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }
    params = bundle.render_params
    args = (params, bundle.modules, batch, feats)
    kw = dict(h=H, w=W, src_rgbs=jnp.asarray(src_rgbs),
              src_cameras=jnp.asarray(src_cams), chunk_size=256)
    ref = render_single_image(*args, cfg, **kw)

    specs = plan_render_specs(
        target_cam[None], src_cams, np.asarray(depth_range).reshape(-1),
        (H, W), feats[0].shape[1:3], block=BLOCK,
    )
    assert specs is not None
    cfg_b = dataclasses.replace(cfg, bspg_specs=specs, bspg_pallas=False)
    out = render_single_image(*args, cfg_b, **kw)
    for lvl in ("outputs_coarse", "outputs_fine"):
        np.testing.assert_allclose(
            np.asarray(out[lvl]["rgb"]), np.asarray(ref[lvl]["rgb"]),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out[lvl]["depth"]), np.asarray(ref[lvl]["depth"]),
            rtol=1e-4, atol=1e-4,
        )


def _setup_win(rng, c=32, s=64, h=128, w=128, scale=2, p=6, block=(4, 4),
               scene="orbit", b_take=64):
    """Scene-driven fixture at shapes where windowed selection engages
    (orbit cameras give long epipolar segments -> wide slot lists). Only
    ``b_take`` raster-consecutive blocks are selected for the reference
    computation to keep the CPU einsum affordable; the spec carries
    plan_window_spans bounds (spec.kwin)."""
    scene_fn = synthetic_scene if scene == "orbit" else llff_rig_scene
    target_cam, _, src_cams, _, depth_range = scene_fn(
        rng, n_src=4, h=h, w=w
    )
    hs, ws = (h - 1) // scale + 1, (w - 1) // scale + 1
    images = rng.rand(4, hs, ws, c).astype(np.float32)

    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(h, w, jnp.asarray(intr), jnp.asarray(c2w))
    pts, z_vals = sample_along_camera_ray(
        rays_o, rays_d, jnp.asarray(depth_range), s, det=True
    )
    bh, bw = block
    ro_b, rd_b = _block_rays(np.asarray(rays_o), np.asarray(rays_d), h, w,
                             bh, bw)
    b = ro_b.shape[0]
    groups, _ = bspg.plan_block_groups(
        target_cam[None], src_cams, depth_range.reshape(-1), (hs, ws),
        p=p, block=block,
    )
    spans = bspg.plan_window_spans(
        target_cam[None], src_cams, depth_range.reshape(-1), (hs, ws),
        p=p, block=block, n_samples=s, n_importance=0,
    )
    kwin = tuple(int(max(spans[list(v)])) for v, _ in groups)
    spec = bspg.make_block_spec(groups, p, (hs, ws), (h, w), block=block,
                                kwin=kwin)
    cidx = np.array([0, bw - 1, (bh - 1) * bw, bh * bw - 1])
    near, far = float(depth_range[0, 0]), float(depth_range[0, 1])
    pa_c = ro_b[:, cidx] + rd_b[:, cidx] * near
    pb_c = ro_b[:, cidx] + rd_b[:, cidx] * far
    pa, pb = project_endpoints(jnp.asarray(pa_c.reshape(-1, 3)),
                               jnp.asarray(pb_c.reshape(-1, 3)),
                               jnp.asarray(src_cams))
    v = src_cams.shape[0]
    pa = pa.reshape(v, b, 4, 3)
    pb = pb.reshape(v, b, 4, 3)
    flat = pts.reshape(-1, 3)
    px, py, _ = project_points_planes(flat, jnp.asarray(src_cams))
    gx = 2.0 * px / (w - 1.0) - 1.0
    gy = 2.0 * py / (h - 1.0) - 1.0
    gxb = _to_blocks(gx, h, w, bh, bw, s)[:, :b_take]
    gyb = _to_blocks(gy, h, w, bh, bw, s)[:, :b_take]

    table = bspg.pack_patch_table(jnp.asarray(images), spec.p)
    slots, starts = bspg.build_block_slots(
        pa[:, :b_take], pb[:, :b_take], spec, return_starts=True)
    g = bspg.gather_block_patches(table, slots, spec)
    ref = bspg.select_block_samples(g, slots, gxb, gyb, spec, c)
    return spec, g, slots, starts, gxb, gyb, ref, c


def _realized_spans(spec, starts, gxb, gyb, sblk):
    """Realized L1 patch-cell span per (group, GB-chunk grid step), mirroring
    the selector's window computation in numpy."""
    from nerfool_tpu.ops.bspg_kernel import GB
    from nerfool_tpu.ops.spg import _sample_ingredients

    v, b, n, s = gxb.shape
    ns = n * s
    ix = (np.asarray(gxb) + 1.0) * 0.5 * (spec.w - 1)
    iy = (np.asarray(gyb) + 1.0) * 0.5 * (spec.h - 1)
    spans = []
    for (views, k_path), (px0, py0) in zip(spec.groups, starts):
        vi = list(views)
        vg = len(vi)
        ixg = ix[vi].transpose(0, 1, 3, 2).reshape(vg, b, ns)
        iyg = iy[vi].transpose(0, 1, 3, 2).reshape(vg, b, ns)
        ing = jax.tree.map(np.asarray, _sample_ingredients(
            jnp.asarray(ixg), jnp.asarray(iyg), spec.as_spg(), jnp.float32))
        n_rv = vg * b
        pid = ing["pid"].reshape(n_rv, ns)
        pos = (np.abs(pid % spec.pbx - np.asarray(px0).reshape(n_rv)[:, None])
               + np.abs(pid // spec.pbx
                        - np.asarray(py0).reshape(n_rv)[:, None]))
        rel = (((ing["vy0"] + ing["vy1"]) > 0.5)
               & ((ing["vx0"] + ing["vx1"]) > 0.5)).reshape(n_rv, ns)
        npg = ns // sblk // GB
        pos2 = pos.reshape(n_rv, npg, GB * sblk)
        rel2 = rel.reshape(n_rv, npg, GB * sblk)
        big = 1 << 30
        pmin = np.where(rel2, pos2, big).min(axis=-1)
        pmax = np.where(rel2, pos2, -1).max(axis=-1)
        ok = pmax >= 0
        spans.append(int(np.where(ok, pmax - np.minimum(pmin, pmax), 0).max()))
    return spans


@pytest.mark.parametrize("c", [3, 32])
def test_bspg_windowed_select_matches_xla(rng, c):
    """Windowed Pallas selection (scalar-prefetch slot windows, interpret
    mode) == XLA full-width selection, with windows genuinely narrower than
    the slot list. Window widths come from the measured realized spans, so
    the placement math (not margin slack) is what's exercised."""
    spec, g, slots, starts, gxb, gyb, ref, c = _setup_win(rng, c=c)
    sblk = 64 if c == 3 else 128  # c=3 needs short chunks on this fixture
    spans = _realized_spans(spec, starts, gxb, gyb, sblk)
    from nerfool_tpu.ops.bspg_kernel import KB
    kw = max(-(-(3 * sp_ + 18) // KB) * KB for sp_ in spans)
    dbg = []
    out = bspg.select_block_samples_win(g, slots, starts, gxb, gyb, spec, c,
                                        kw_override=kw, sblk_override=sblk,
                                        debug=dbg)
    assert any(kw_ < ks for kw_, ks, _ in dbg), (dbg, spans)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # ray-packed exit: [V, B, n/2, S, 2, c] pairs adjacent rays
    out_pk = bspg.select_block_samples_win(g, slots, starts, gxb, gyb, spec,
                                           c, kw_override=kw,
                                           sblk_override=sblk,
                                           packed_pairs=True)
    v_, b_, n_, s_, c_ = np.asarray(ref).shape
    ref_pk = np.asarray(ref).reshape(v_, b_, n_ // 2, 2, s_, c_).swapaxes(3, 4)
    np.testing.assert_allclose(np.asarray(out_pk), ref_pk,
                               rtol=1e-5, atol=1e-6)


def test_bspg_windowed_plan_bound_matches(rng):
    """Windows sized by the plan-time span bound (spec.kwin, no override)
    select exactly, and the plan bound dominates the realized spans."""
    spec, g, slots, starts, gxb, gyb, ref, c = _setup_win(rng, c=32)
    assert spec.kwin is not None
    from nerfool_tpu.ops.bspg import _window_sblk
    spans = _realized_spans(spec, starts, gxb, gyb,
                            _window_sblk(gxb.shape[2] * gxb.shape[3], c))
    assert all(k >= s_ for k, s_ in zip(spec.kwin, spans)), (spec.kwin, spans)
    dbg = []
    out = bspg.select_block_samples_win(g, slots, starts, gxb, gyb, spec, c,
                                        debug=dbg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_bspg_windowed_gb_fallback(rng):
    """Shapes violating the Pallas grid constraint (views*blocks % GB != 0 —
    tiny smoke scenes) take the plain-XLA fallback inside BOTH selectors
    instead of tripping kernel asserts, and still select exactly."""
    from nerfool_tpu.ops.bspg_kernel import GB

    spec, g, slots, starts, gxb, gyb, ref, c = _setup_win(rng, c=32, b_take=3)
    assert all(len(v) * 3 % GB for v, _ in spec.groups), spec.groups
    out = bspg.select_block_samples_win(g, slots, starts, gxb, gyb, spec, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    out2 = bspg.select_block_samples(g, slots, gxb, gyb, spec, c,
                                     use_pallas=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_bspg_sharded_render_matches_single_device(rng):
    """The flagship path composition: BSPG whole-image render with the ray
    axis sharded over the 8-device virtual mesh == single-device (GSPMD
    replicates the patch tables, splits the block-major rays)."""
    import dataclasses

    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.ops.bspg import plan_render_specs
    from nerfool_tpu.parallel.mesh import get_mesh, shard_rays
    from nerfool_tpu.render.render_image import render_single_image
    from nerfool_tpu.render.render_rays import RenderConfig

    target_cam, src_rgbs, src_cams, _, depth_range = llff_rig_scene(
        rng, n_src=3, h=H, w=W
    )
    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(3))
    feats = bundle.extract_features(jnp.asarray(src_rgbs))
    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
    batch = {
        "ray_o": rays_o, "ray_d": rays_d,
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }
    specs = plan_render_specs(
        target_cam[None], src_cams, np.asarray(depth_range).reshape(-1),
        (H, W), feats[0].shape[1:3], block=BLOCK,
    )
    assert specs is not None
    cfg = RenderConfig(n_samples=12, n_importance=8, det=True,
                       backbone="ibrnet", bspg_specs=specs, bspg_pallas=False)
    args = (bundle.render_params, bundle.modules, batch, feats)
    kw = dict(h=H, w=W, src_rgbs=jnp.asarray(src_rgbs),
              src_cameras=jnp.asarray(src_cams), chunk_size=256)
    ref = render_single_image(*args, cfg, **kw)
    out = render_single_image(*args, cfg, **kw,
                              ray_sharding=shard_rays(get_mesh()))
    for lvl in ("outputs_coarse", "outputs_fine"):
        np.testing.assert_allclose(
            np.asarray(out[lvl]["rgb"]), np.asarray(ref[lvl]["rgb"]),
            rtol=1e-4, atol=1e-5,
        )


def test_bspg_gnt_rayfold_matches(rng):
    """BSPG + ray_fold=2 (gather emits the ray-packed layout natively;
    inputs_packed model entry) == per-tap ray_fold=1 — the gnt-full bench
    path with the round-4 packed-gather ray-fold."""
    import dataclasses

    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.ops.bspg import plan_render_specs
    from nerfool_tpu.render.render_image import render_single_image
    from nerfool_tpu.render.render_rays import RenderConfig

    target_cam, src_rgbs, src_cams, _, depth_range = llff_rig_scene(
        rng, n_src=3, h=H, w=W
    )
    bundle = create_model(backbone="gnt", rng_key=jax.random.PRNGKey(5),
                          trans_depth=2, single_net=True)
    bundle_rf = create_model(backbone="gnt", rng_key=jax.random.PRNGKey(5),
                             trans_depth=2, single_net=True, gnt_ray_fold=2)
    feats = bundle.extract_features(jnp.asarray(src_rgbs))
    cfg = RenderConfig(n_samples=24, n_importance=24, det=True, backbone="gnt",
                       single_net=True, ret_alpha=True, inv_uniform=True)
    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
    batch = {
        "ray_o": rays_o, "ray_d": rays_d,
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }
    kw = dict(h=H, w=W, src_rgbs=jnp.asarray(src_rgbs),
              src_cameras=jnp.asarray(src_cams), chunk_size=256)
    ref = render_single_image(bundle.render_params, bundle.modules, batch,
                              feats, cfg, **kw)

    specs = plan_render_specs(
        target_cam[None], src_cams, np.asarray(depth_range).reshape(-1),
        (H, W), feats[0].shape[1:3], block=BLOCK, n_samples=24,
        n_importance=24, inv_uniform=True,
    )
    assert specs is not None
    cfg_b = dataclasses.replace(cfg, bspg_specs=specs, bspg_pallas=False)
    out = render_single_image(bundle_rf.render_params, bundle_rf.modules,
                              batch, feats, cfg_b, **kw)
    for level in ("outputs_coarse", "outputs_fine"):
        np.testing.assert_allclose(
            np.asarray(out[level]["rgb"]),
            np.asarray(ref[level]["rgb"]), rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out[level]["depth"]),
            np.asarray(ref[level]["depth"]), rtol=1e-4, atol=1e-4,
        )


def test_bspg_whole_image_render_matches_gnt(rng):
    """BSPG == per-tap for the GNT backbone (single net, ret_alpha, no fine
    pass, 35-channel rgb+feat taps) — the gnt-full bench path."""
    import dataclasses

    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.ops.bspg import plan_render_specs
    from nerfool_tpu.render.render_image import render_single_image
    from nerfool_tpu.render.render_rays import RenderConfig

    target_cam, src_rgbs, src_cams, _, depth_range = llff_rig_scene(
        rng, n_src=3, h=H, w=W
    )
    bundle = create_model(backbone="gnt", rng_key=jax.random.PRNGKey(5),
                          trans_depth=2, single_net=True)
    feats = bundle.extract_features(jnp.asarray(src_rgbs))
    cfg = RenderConfig(n_samples=24, n_importance=0, det=True, backbone="gnt",
                       single_net=True, ret_alpha=True, inv_uniform=True)
    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
    batch = {
        "ray_o": rays_o, "ray_d": rays_d,
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }
    args = (bundle.render_params, bundle.modules, batch, feats)
    kw = dict(h=H, w=W, src_rgbs=jnp.asarray(src_rgbs),
              src_cameras=jnp.asarray(src_cams), chunk_size=256)
    ref = render_single_image(*args, cfg, **kw)

    specs = plan_render_specs(
        target_cam[None], src_cams, np.asarray(depth_range).reshape(-1),
        (H, W), feats[0].shape[1:3], block=BLOCK, n_samples=24,
        n_importance=0, inv_uniform=True,
    )
    assert specs is not None
    cfg_b = dataclasses.replace(cfg, bspg_specs=specs, bspg_pallas=False)
    out = render_single_image(*args, cfg_b, **kw)
    np.testing.assert_allclose(
        np.asarray(out["outputs_coarse"]["rgb"]),
        np.asarray(ref["outputs_coarse"]["rgb"]), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["outputs_coarse"]["depth"]),
        np.asarray(ref["outputs_coarse"]["depth"]), rtol=1e-4, atol=1e-4,
    )
