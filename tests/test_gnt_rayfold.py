"""Ray-packed GNT aggregation == unpacked (same params, same inputs).

ray_fold=2 packs adjacent RAY pairs into the channel axis through the whole
aggregation (models/gnt.py module docstring): block-diagonal weights,
per-half LayerNorms, 2x4->8 ray-attention heads. Every dot product gains
only *0.0 terms, so the packing is mathematically exact; the K-dim blocking
of the wider dots reassociates accumulation, so outputs agree to dot
roundoff (measured: 6e-7 f32, 1.3e-15 f64), not bitwise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfool_tpu.models.gnt import GNTAggregator
from tests.test_gnt_fold import _inputs


@pytest.mark.parametrize("ret_alpha", [True, False])
def test_rayfold_matches_unpacked(ret_alpha):
    args = _inputs(r=6)
    base = GNTAggregator(trans_depth=4, ret_alpha=ret_alpha, ray_fold=1)
    packed = GNTAggregator(trans_depth=4, ret_alpha=ret_alpha, ray_fold=2)
    params = base.init(jax.random.PRNGKey(0), *args)["params"]
    out0 = jax.jit(lambda *a: base.apply({"params": params}, *a))(*args)
    out1 = jax.jit(lambda *a: packed.apply({"params": params}, *a))(*args)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=0, atol=2e-6)


def test_rayfold_param_tree_identical():
    args = _inputs()
    p0 = GNTAggregator(trans_depth=2, ray_fold=1).init(
        jax.random.PRNGKey(1), *args)["params"]
    p1 = GNTAggregator(trans_depth=2, ray_fold=2).init(
        jax.random.PRNGKey(1), *args)["params"]
    s0 = jax.tree.map(lambda x: (x.shape, str(x.dtype)), p0)
    s1 = jax.tree.map(lambda x: (x.shape, str(x.dtype)), p1)
    assert s0 == s1
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), p0, p1)


def test_rayfold_odd_rays_falls_back():
    args = _inputs(r=5)
    m = GNTAggregator(trans_depth=2, ray_fold=2)
    params = m.init(jax.random.PRNGKey(2), *args)["params"]
    out = m.apply({"params": params}, *args)
    ref = GNTAggregator(trans_depth=2, ray_fold=1).apply({"params": params}, *args)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_rayfold_takes_precedence_over_sample_fold():
    args = _inputs(r=4, s=8)
    both = GNTAggregator(trans_depth=2, ray_fold=2, sample_fold=2)
    params = both.init(jax.random.PRNGKey(3), *args)["params"]
    out = both.apply({"params": params}, *args)
    ref = GNTAggregator(trans_depth=2, ray_fold=1, sample_fold=1).apply(
        {"params": params}, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-6)


def test_inputs_packed_matches_unpacked():
    """Gather-native packed inputs (render_rays._render_rays_bspg layout:
    rgb_feat [V,R/2,S,6+2F] segment order [rgbA|rgbB|featA|featB], packed
    ray_diff/mask, pts [R/2,S,2,3], ray_d [R/2,2,3]) produce the same output
    as the plain call — the segment order is absorbed by the row-permuted
    block-diagonal entry weight."""
    from nerfool_tpu.models.layers import pack_rays2

    rgb_feat, ray_diff, mask, pts, ray_d = _inputs(r=6)
    r, s = pts.shape[0], pts.shape[1]
    base = GNTAggregator(trans_depth=4, ray_fold=1)
    params = base.init(jax.random.PRNGKey(5), rgb_feat, ray_diff, mask,
                       pts, ray_d)["params"]
    ref = base.apply({"params": params}, rgb_feat, ray_diff, mask, pts, ray_d)

    rgb_pk = jnp.concatenate(
        [pack_rays2(rgb_feat[..., :3]), pack_rays2(rgb_feat[..., 3:])], axis=-1)
    rd_pk = pack_rays2(ray_diff)
    m_pk = pack_rays2(mask)
    pts_pk = pts.reshape(r // 2, 2, s, 3).swapaxes(1, 2)
    rayd_pk = ray_d.reshape(r // 2, 2, 3)
    out = base.apply({"params": params}, rgb_pk, rd_pk, m_pk, pts_pk,
                     rayd_pk, inputs_packed=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-6)


def test_rayfold_per_tap_render_matches():
    """render_rays per-tap path with a ray_fold=2 aggregator (gather-native
    packed layout via packed-order points) == ray_fold=1."""
    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.render.render_rays import RenderConfig, render_rays
    from nerfool_tpu.utils.cameras import get_rays, make_camera_vector

    rng = np.random.RandomState(7)
    h = w = 16
    intr = np.eye(4)
    intr[0, 0] = intr[1, 1] = 20.0
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    cams = []
    for i in range(4):
        c2w = np.eye(4)
        c2w[0, 3] = 0.15 * i
        c2w[2, 3] = -2.0
        cams.append(make_camera_vector(h, w, intr, c2w))
    cams = np.stack(cams)
    src_rgbs = jnp.asarray(rng.rand(3, h, w, 3).astype(np.float32))

    out = {}
    for fold in (1, 2):
        bundle = create_model(backbone="gnt", rng_key=jax.random.PRNGKey(9),
                              trans_depth=2, single_net=True,
                              gnt_ray_fold=fold)
        feats = bundle.extract_features(src_rgbs)
        cfg = RenderConfig(n_samples=8, n_importance=8, det=True,
                           backbone="gnt", single_net=True, ret_alpha=True)
        rays_o, rays_d = get_rays(h, w, jnp.asarray(cams[0][2:18].reshape(4, 4)),
                                  jnp.asarray(cams[0][18:34].reshape(4, 4)))
        batch = {"ray_o": rays_o[:64], "ray_d": rays_d[:64],
                 "depth_range": jnp.asarray([1.0, 4.0]),
                 "camera": jnp.asarray(cams[0][None])}
        out[fold] = render_rays(bundle.render_params, bundle.modules, batch,
                                feats, cfg, src_rgbs=src_rgbs,
                                src_cameras=jnp.asarray(cams[1:]))
    for level in ("outputs_coarse", "outputs_fine"):
        np.testing.assert_allclose(
            np.asarray(out[2][level]["rgb"]),
            np.asarray(out[1][level]["rgb"]), rtol=1e-4, atol=1e-5)


def test_rayfold_gradients_match():
    """The attack differentiates through the aggregator: grads w.r.t. the
    gathered features must match between packings."""
    rgb_feat, ray_diff, mask, pts, ray_d = _inputs(r=4)

    def loss(feat, fold):
        m = GNTAggregator(trans_depth=2, ray_fold=fold)
        return jnp.sum(m.apply({"params": params}, feat, ray_diff, mask,
                               pts, ray_d) ** 2)

    params = GNTAggregator(trans_depth=2, ray_fold=1).init(
        jax.random.PRNGKey(4), rgb_feat, ray_diff, mask, pts, ray_d)["params"]
    g1 = jax.grad(lambda f: loss(f, 1))(rgb_feat)
    g2 = jax.grad(lambda f: loss(f, 2))(rgb_feat)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=0, atol=1e-6)
