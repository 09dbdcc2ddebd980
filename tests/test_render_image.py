"""Whole-image rendering: shape contract, chunk-size invariance, and
multi-device ray sharding on the virtual 8-CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from helpers import synthetic_scene

from nerfool_tpu.models.bundle import create_model
from nerfool_tpu.render.render_image import render_rays_blocked, render_single_image
from nerfool_tpu.render.render_rays import RenderConfig, render_rays
from nerfool_tpu.utils.cameras import get_rays
from nerfool_tpu.parallel.mesh import get_mesh, shard_rays


def _setup(rng, h=24, w=32):
    target_cam, src_rgbs, src_cams, feats, depth_range = synthetic_scene(rng, h=h, w=w)
    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(7))
    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(h, w, jnp.asarray(intr), jnp.asarray(c2w))
    batch = {
        "ray_o": rays_o,
        "ray_d": rays_d,
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }
    cfg = RenderConfig(n_samples=8, n_importance=4, det=True, backbone="ibrnet")
    return bundle, batch, cfg, src_rgbs, src_cams, feats, (h, w)


def test_image_shapes_and_chunk_invariance(rng):
    bundle, batch, cfg, src_rgbs, src_cams, feats, (h, w) = _setup(rng)
    out1 = render_single_image(
        bundle.render_params, bundle.modules, batch, feats, cfg, h, w,
        src_rgbs, src_cams, chunk_size=128,
    )
    out2 = render_single_image(
        bundle.render_params, bundle.modules, batch, feats, cfg, h, w,
        src_rgbs, src_cams, chunk_size=509,  # non-divisor: exercises padding
    )
    assert out1["outputs_coarse"]["rgb"].shape == (h, w, 3)
    assert out1["outputs_fine"]["depth"].shape == (h, w)
    np.testing.assert_allclose(
        np.asarray(out1["outputs_fine"]["rgb"]),
        np.asarray(out2["outputs_fine"]["rgb"]),
        rtol=1e-4, atol=1e-5,
    )


def test_white_paint_coarse_only(rng):
    """The reference paints ONLY the coarse rgb white where the validity mask
    is empty (/root/reference/ibrnet/render_image.py:113); the fine rgb is
    written out unpainted (the 'fine' metrics are computed on it directly,
    eval/ibrnet/eval_adv.py:873-905). With n_samples=8 the coarse mask
    (sum > 8) is unsatisfiable, so every coarse pixel must paint white while
    the fine level (12 samples) stays untouched."""
    bundle, batch, cfg, src_rgbs, src_cams, feats, (h, w) = _setup(rng)
    out = render_single_image(
        bundle.render_params, bundle.modules, batch, feats, cfg, h, w,
        src_rgbs, src_cams, chunk_size=256,
    )
    raw = render_rays_blocked(
        bundle.render_params, bundle.modules, batch, feats, cfg,
        jnp.asarray(src_rgbs), jnp.asarray(src_cams), block_size=256,
    )
    coarse = np.asarray(out["outputs_coarse"]["rgb"])
    assert not np.asarray(out["outputs_coarse"]["mask"]).any()
    np.testing.assert_array_equal(coarse, np.ones_like(coarse))
    fine_raw = np.asarray(raw["outputs_fine"]["rgb"]).reshape(h, w, 3)
    np.testing.assert_array_equal(np.asarray(out["outputs_fine"]["rgb"]),
                                  fine_raw)


def test_sharded_render_matches_single_device(rng):
    bundle, batch, cfg, src_rgbs, src_cams, feats, (h, w) = _setup(rng)
    assert len(jax.devices()) == 8

    ref = render_rays(
        bundle.render_params, bundle.modules, batch, feats, cfg,
        src_rgbs=jnp.asarray(src_rgbs), src_cameras=jnp.asarray(src_cams),
    )

    mesh = get_mesh()
    rs = shard_rays(mesh)
    sharded_batch = dict(batch)
    for k in ("ray_o", "ray_d"):
        sharded_batch[k] = jax.device_put(batch[k], rs)

    fn = jax.jit(
        lambda p, b, sr, sc, f: render_rays(
            p, bundle.modules, b, f, cfg, src_rgbs=sr, src_cameras=sc
        )
    )
    with mesh:
        out = fn(bundle.render_params, sharded_batch, jnp.asarray(src_rgbs),
                 jnp.asarray(src_cams), feats)
    np.testing.assert_allclose(
        np.asarray(out["outputs_fine"]["rgb"]),
        np.asarray(ref["outputs_fine"]["rgb"]),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_fine_tap_reuse_matches_default_path(rng):
    """reuse_fine_taps (unified feature table + fine-pass tap reuse) must be a
    pure optimization: identical renders and attack gradients.

    Exactness shown in float64 elsewhere (machine-eps agreement); in f32 the
    coarse pass is bit-identical and the fine pass differs only by XLA fusion
    rounding noise.
    """
    import dataclasses

    bundle, batch, cfg, src_rgbs, src_cams, feats, _ = _setup(rng)
    cfg_r = dataclasses.replace(cfg, reuse_fine_taps=True)
    src_rgbs = jnp.asarray(src_rgbs)
    src_cams = jnp.asarray(src_cams)
    sel = np.arange(0, batch["ray_o"].shape[0], 5)
    sub = dict(batch, ray_o=batch["ray_o"][sel], ray_d=batch["ray_d"][sel])

    r0 = jax.jit(lambda: render_rays(
        bundle.render_params, bundle.modules, sub, feats, cfg,
        src_rgbs=src_rgbs, src_cameras=src_cams))()
    r1 = jax.jit(lambda: render_rays(
        bundle.render_params, bundle.modules, sub, feats, cfg_r,
        src_rgbs=src_rgbs, src_cameras=src_cams))()
    for lvl in ("outputs_coarse", "outputs_fine"):
        for k in ("rgb", "depth", "weights"):
            np.testing.assert_allclose(
                np.asarray(r0[lvl][k]), np.asarray(r1[lvl][k]),
                rtol=1e-5, atol=2e-5, err_msg=f"{lvl}/{k}",
            )

    # the attack gradient (d loss / d source pixels) through the full renderer
    def loss(c, s):
        f = bundle.extract_features(s)
        r = render_rays(bundle.render_params, bundle.modules, sub, f, c,
                        src_rgbs=s, src_cameras=src_cams)
        return (jnp.mean(r["outputs_fine"]["rgb"] ** 2)
                + jnp.mean(r["outputs_coarse"]["rgb"] ** 2))

    g0 = jax.jit(jax.grad(lambda s: loss(cfg, s)))(src_rgbs)
    g1 = jax.jit(jax.grad(lambda s: loss(cfg_r, s)))(src_rgbs)
    scale = np.max(np.abs(np.asarray(g0))) + 1e-12
    assert np.max(np.abs(np.asarray(g0) - np.asarray(g1))) / scale < 1e-4


def test_fine_tap_reuse_blocked_render(rng):
    """Whole-image blocked render agrees between reuse and default paths
    (unified tables built once outside the block loop)."""
    import dataclasses

    bundle, batch, cfg, src_rgbs, src_cams, feats, (h, w) = _setup(rng)
    cfg_r = dataclasses.replace(cfg, reuse_fine_taps=True)
    out0 = render_single_image(
        bundle.render_params, bundle.modules, batch, feats, cfg, h, w,
        src_rgbs, src_cams, chunk_size=128,
    )
    out1 = render_single_image(
        bundle.render_params, bundle.modules, batch, feats, cfg_r, h, w,
        src_rgbs, src_cams, chunk_size=128,
    )
    for lvl in ("outputs_coarse", "outputs_fine"):
        np.testing.assert_allclose(
            np.asarray(out0[lvl]["rgb"]), np.asarray(out1[lvl]["rgb"]),
            rtol=1e-5, atol=2e-5, err_msg=lvl,
        )


def test_bf16_compute_dtype_close_to_f32(rng):
    """The bf16 aggregation path (bench default for rendering) must stay close
    to the f32 render: same geometry, reduced-precision shading."""
    import dataclasses

    bundle, batch, cfg, src_rgbs, src_cams, feats, _ = _setup(rng)
    sel = np.arange(0, batch["ray_o"].shape[0], 5)
    sub = dict(batch, ray_o=batch["ray_o"][sel], ray_d=batch["ray_d"][sel])
    cfg_bf = dataclasses.replace(cfg, compute_dtype="bfloat16",
                                 reuse_fine_taps=True)
    r0 = jax.jit(lambda: render_rays(
        bundle.render_params, bundle.modules, sub, feats, cfg,
        src_rgbs=jnp.asarray(src_rgbs), src_cameras=jnp.asarray(src_cams)))()
    r1 = jax.jit(lambda: render_rays(
        bundle.render_params, bundle.modules, sub, feats, cfg_bf,
        src_rgbs=jnp.asarray(src_rgbs), src_cameras=jnp.asarray(src_cams)))()
    for lvl in ("outputs_coarse", "outputs_fine"):
        a = np.asarray(r0[lvl]["rgb"], np.float32)
        b = np.asarray(r1[lvl]["rgb"], np.float32)
        assert b.dtype == np.float32  # outputs come back f32
        err = np.abs(a - b).max()
        assert err < 0.05, (lvl, err)  # bf16 mantissa ~3 decimal digits


def test_sharded_whole_frame_render_matches_single_device(rng):
    """render_single_image with ray_sharding (blocks split over the 8-device
    mesh inside lax.map) must reproduce the unsharded frame exactly."""
    bundle, batch, cfg, src_rgbs, src_cams, feats, (h, w) = _setup(rng)
    ref = render_single_image(
        bundle.render_params, bundle.modules, batch, feats, cfg, h, w,
        src_rgbs, src_cams, chunk_size=256,
    )
    rs = shard_rays(get_mesh())
    out = render_single_image(
        bundle.render_params, bundle.modules, batch, feats, cfg, h, w,
        src_rgbs, src_cams, chunk_size=256, ray_sharding=rs,
    )
    for lvl in ("outputs_coarse", "outputs_fine"):
        np.testing.assert_allclose(
            np.asarray(out[lvl]["rgb"]), np.asarray(ref[lvl]["rgb"]),
            rtol=1e-4, atol=1e-5,
        )
