"""Segment-patch gather: exact parity with the per-tap bilinear gather.

SPG must reproduce grid_sample.gather_bilinear_planes bit-for-nearly-bit
(same align_corners mapping, zeros padding, per-corner validity) for samples
lying on per-ray epipolar segments — including segments that exit the image,
run behind the camera, or degenerate to points.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfool_tpu.ops.grid_sample import gather_bilinear_planes
from nerfool_tpu.ops import spg


def _segments_case(rng, v=4, r=6, s=9, h=13, w=17, c=3, span=8.0, scale=1):
    """Random segments + samples along them; returns everything both paths need.

    ``scale``: sampled grid = (h, w); projections live on a full-res grid
    scale x as large (mimicking feat-res sampling of full-res projections).
    """
    hf, wf = (h - 1) * scale + 1, (w - 1) * scale + 1
    images = rng.rand(v, h, w, c).astype(np.float32)
    # endpoints roam beyond the image so clipping paths are exercised
    ax = rng.uniform(-6, wf + 5, (v, r)).astype(np.float32)
    ay = rng.uniform(-6, hf + 5, (v, r)).astype(np.float32)
    bx = np.clip(ax + rng.uniform(-span * scale, span * scale, (v, r)), -9, wf + 8).astype(np.float32)
    by = np.clip(ay + rng.uniform(-span * scale, span * scale, (v, r)), -9, hf + 8).astype(np.float32)
    lam = rng.rand(v, r, s).astype(np.float32)
    ix_full = ax[..., None] + lam * (bx - ax)[..., None]
    iy_full = ay[..., None] + lam * (by - ay)[..., None]
    # normalized coords against the FULL grid (the projector's convention)
    gx = 2.0 * ix_full / (wf - 1) - 1.0
    gy = 2.0 * iy_full / (hf - 1) - 1.0
    pa = np.stack([ax, ay, np.ones_like(ax)], axis=-1)
    pb = np.stack([bx, by, np.ones_like(bx)], axis=-1)
    return images, (hf, wf), pa, pb, gx.reshape(v, -1), gy.reshape(v, -1)


def _spec_for(pa, pb, h, w, hf, wf, p, n_groups=2):
    """Planner stand-in for synthetic segments: exact K from the endpoints."""
    v = pa.shape[0]
    sx = 1.0 if wf <= 1 else (w - 1) / (wf - 1)
    sy = 1.0 if hf <= 1 else (h - 1) / (hf - 1)
    qa, qb = [], []
    for vi in range(v):
        a, b = spg._clip_segment_np(pa[vi].T, pb[vi].T, w, h, sx, sy)
        qa.append(a)
        qb.append(b)
    qa, qb = np.stack(qa), np.stack(qb)  # [V, 2, R]
    cbs = lambda x, n: np.clip(np.floor(x), -1, n - 1).astype(np.int64) + 1
    kx = np.abs(cbs(qa[:, 0], w) // p - cbs(qb[:, 0], w) // p)
    ky = np.abs(cbs(qa[:, 1], h) // p - cbs(qb[:, 1], h) // p)
    k_v = (kx + ky).max(axis=1) + 1 + 1  # +1 float-wobble margin
    groups = []
    order = np.argsort(k_v)
    half = max(1, v // n_groups)
    for gi in range(0, v, half):
        views = tuple(int(i) for i in order[gi:gi + half])
        if views:
            groups.append((views, int(k_v[list(views)].max())))
    return spg.make_spec(tuple(groups), p, (h, w), (hf, wf))


def _run_spg(images, spec, pa, pb, gx, gy):
    table = spg.pack_patch_table(jnp.asarray(images), spec.p)
    slots = spg.build_slots(jnp.asarray(pa), jnp.asarray(pb), spec)
    g = spg.gather_patches(table, slots, spec)
    return spg.select_samples(g, slots, jnp.asarray(gx), jnp.asarray(gy),
                              spec, images.shape[-1])


@pytest.mark.parametrize("p", [2, 4, 8])
def test_spg_matches_per_tap_gather(rng, p):
    images, (hf, wf), pa, pb, gx, gy = _segments_case(rng)
    spec = _spec_for(pa, pb, 13, 17, hf, wf, p)
    ref = gather_bilinear_planes(jnp.asarray(images), jnp.asarray(gx),
                                 jnp.asarray(gy))
    out = _run_spg(images, spec, pa, pb, gx, gy)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_spg_matches_at_feat_scale(rng):
    """Sampled grid at 1/4 of the projection grid (feature-map case)."""
    images, (hf, wf), pa, pb, gx, gy = _segments_case(
        rng, h=13, w=17, scale=4, span=24.0
    )
    spec = _spec_for(pa, pb, 13, 17, hf, wf, p=4)
    ref = gather_bilinear_planes(jnp.asarray(images), jnp.asarray(gx),
                                 jnp.asarray(gy))
    out = _run_spg(images, spec, pa, pb, gx, gy)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_spg_behind_camera_segment(rng):
    """Endpoint behind the camera: visible sub-segment still samples exactly;
    behind samples produce zeros in both paths."""
    v, r, s, h, w, c = 2, 5, 7, 11, 15, 2
    images = rng.rand(v, h, w, c).astype(np.float32)
    pa = np.stack([rng.uniform(0, w - 1, (v, r)), rng.uniform(0, h - 1, (v, r)),
                   np.ones((v, r))], axis=-1).astype(np.float32)
    pa *= pa[..., 2:3]
    pb = pa.copy()
    pb[..., 2] = -0.5  # far endpoint behind
    pb[..., 0] = rng.uniform(-2, 2, (v, r))
    pb[..., 1] = rng.uniform(-2, 2, (v, r))
    lam = rng.rand(v, r, s).astype(np.float32)
    ph = pa[..., None, :] + lam[..., None] * (pb - pa)[..., None, :]
    z = ph[..., 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        ix = np.clip(ph[..., 0] / np.clip(z, 1e-8, None), -1e6, 1e6)
        iy = np.clip(ph[..., 1] / np.clip(z, 1e-8, None), -1e6, 1e6)
    # behind-camera samples get the reference's clipped sentinel coords
    ix = np.where(z > 0, ix, 1e6)
    iy = np.where(z > 0, iy, 1e6)
    gx = (2.0 * ix / (w - 1) - 1.0).reshape(v, -1)
    gy = (2.0 * iy / (h - 1) - 1.0).reshape(v, -1)
    spec = _spec_for(pa, pb, h, w, h, w, p=4)
    ref = gather_bilinear_planes(jnp.asarray(images), jnp.asarray(gx),
                                 jnp.asarray(gy))
    out = _run_spg(images, spec, pa, pb, gx, gy)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_spg_gradients_match(rng):
    """d(out)/d(images) and d(out)/d(coords) agree with the per-tap gather."""
    images, (hf, wf), pa, pb, gx, gy = _segments_case(rng, v=2, r=4, s=5)
    spec = _spec_for(pa, pb, 13, 17, hf, wf, p=4)
    cot = rng.rand(2, 20, 3).astype(np.float32)

    def loss_ref(img, gx_, gy_):
        return jnp.sum(gather_bilinear_planes(img, gx_, gy_) * cot)

    def loss_spg(img, gx_, gy_):
        table = spg.pack_patch_table(img, spec.p)
        slots = spg.build_slots(jnp.asarray(pa), jnp.asarray(pb), spec)
        g = spg.gather_patches(table, slots, spec)
        out = spg.select_samples(g, slots, gx_, gy_, spec, 3)
        return jnp.sum(out * cot)

    args = (jnp.asarray(images), jnp.asarray(gx), jnp.asarray(gy))
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    gs = jax.grad(loss_spg, argnums=(0, 1, 2))(*args)
    for a, b in zip(gr, gs):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_spg_zero_length_segments(rng):
    """Degenerate segments (single point) and K=1 specs."""
    v, h, w, c = 2, 9, 9, 2
    images = rng.rand(v, h, w, c).astype(np.float32)
    pts_x = rng.uniform(-2, w + 1, (v, 3)).astype(np.float32)
    pts_y = rng.uniform(-2, h + 1, (v, 3)).astype(np.float32)
    pa = np.stack([pts_x, pts_y, np.ones_like(pts_x)], axis=-1)
    pb = pa.copy()
    gx = (2.0 * np.repeat(pts_x[..., None], 4, -1) / (w - 1) - 1.0).reshape(v, -1)
    gy = (2.0 * np.repeat(pts_y[..., None], 4, -1) / (h - 1) - 1.0).reshape(v, -1)
    spec = spg.make_spec((((0, 1), 1),), 4, (h, w), (h, w))
    ref = gather_bilinear_planes(jnp.asarray(images), jnp.asarray(gx),
                                 jnp.asarray(gy))
    out = _run_spg(images, spec, pa, pb, gx, gy)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_plan_groups_covers_render(rng):
    """Planner budgets cover every (ray, view) of a synthetic scene: SPG
    whole-image sampling == per-tap sampling through the real projector."""
    from helpers import synthetic_scene
    from nerfool_tpu.render.projection import project_points_planes
    from nerfool_tpu.render.sampling import sample_along_camera_ray
    from nerfool_tpu.utils.cameras import get_rays

    h = w = 20
    target_cam, src_rgbs, src_cams, _, depth_range = synthetic_scene(
        rng, n_src=4, h=h, w=w
    )
    groups = spg.plan_groups(target_cam[None], src_cams,
                             depth_range.reshape(-1), (h, w), p=4,
                             ray_stride=2)
    spec = spg.make_spec(groups, 4, (h, w), (h, w))

    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(h, w, jnp.asarray(intr), jnp.asarray(c2w))
    pts, _ = sample_along_camera_ray(
        rays_o, rays_d, jnp.asarray(depth_range), 11, det=True
    )
    flat = pts.reshape(-1, 3)
    px, py, front = project_points_planes(flat, jnp.asarray(src_cams))
    wf, hf = w, h
    gx = 2.0 * px / (wf - 1.0) - 1.0
    gy = 2.0 * py / (hf - 1.0) - 1.0
    ref = gather_bilinear_planes(jnp.asarray(src_rgbs), gx, gy)

    pa, pb = spg.project_endpoints(pts[:, 0], pts[:, -1], jnp.asarray(src_cams))
    out = _run_spg(src_rgbs, spec, np.asarray(pa), np.asarray(pb), gx, gy)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_spg_render_rays_matches_per_tap(rng):
    """render_rays with spg_specs == the per-tap path: forward outputs AND
    the d(loss)/d(featmaps) gradient (the attack's delta-gradient carrier),
    coarse+fine, random-pixel ray batch — the attack-step configuration."""
    import dataclasses

    from helpers import llff_rig_scene
    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.ops.spg import plan_attack_specs
    from nerfool_tpu.render.render_rays import RenderConfig, render_rays
    from nerfool_tpu.utils.cameras import get_rays

    h, w = 32, 32
    target_cam, src_rgbs, src_cams, _, depth_range = llff_rig_scene(
        rng, n_src=3, h=h, w=w
    )
    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(2))
    feats = bundle.extract_features(jnp.asarray(src_rgbs))
    cfg = RenderConfig(n_samples=12, n_importance=8, det=True,
                       backbone="ibrnet", inv_uniform=True,
                       fuse_rgb_rows=False, reuse_fine_taps=False)

    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(h, w, jnp.asarray(intr), jnp.asarray(c2w))
    sel = rng.choice(h * w, 64, replace=False)
    batch = {
        "ray_o": rays_o[sel], "ray_d": rays_d[sel],
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }

    specs = plan_attack_specs(
        target_cam[None], src_cams, np.asarray(depth_range).reshape(-1),
        (h, w), feats[0].shape[1:3],
    )
    cfg_s = dataclasses.replace(cfg, spg_specs=specs)

    def run(c, f):
        ret = render_rays(bundle.render_params, bundle.modules, batch, f, c,
                          src_rgbs=jnp.asarray(src_rgbs),
                          src_cameras=jnp.asarray(src_cams), key=None)
        return ret

    ref = run(cfg, feats)
    out = run(cfg_s, feats)
    for lvl in ("outputs_coarse", "outputs_fine"):
        np.testing.assert_allclose(
            np.asarray(out[lvl]["rgb"]), np.asarray(ref[lvl]["rgb"]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out[lvl]["depth"]), np.asarray(ref[lvl]["depth"]),
            rtol=1e-5, atol=1e-5,
        )

    def loss(c):
        def fn(f):
            ret = run(c, f)
            return (jnp.mean(ret["outputs_fine"]["rgb"] ** 2)
                    + jnp.mean(ret["outputs_coarse"]["rgb"] ** 2))
        return fn

    g_ref = jax.grad(loss(cfg))(feats)
    g_spg = jax.grad(loss(cfg_s))(feats)
    for a, b in zip(g_spg, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
