"""Whole-chain fused GNT aggregation kernel (ops/chain_kernel.py) vs the XLA
module path — interpret mode on CPU; the on-hardware rows live in
scripts/probe_kernel_equality.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfool_tpu.models.gnt import GNTAggregator
from nerfool_tpu.ops.chain_kernel import fused_chain_aggregate


def _inputs(rng, v=4, r=6, s=24, f=32, dtype=jnp.float32):
    rf = jnp.asarray(rng.randn(v, r, s, 3 + f), dtype)
    rd = jnp.asarray(rng.randn(v, r, s, 4), dtype)
    m = jnp.asarray(rng.rand(v, r, s, 1) > 0.2, dtype)
    pts = jnp.asarray(rng.randn(r, s, 3), dtype)
    rayd = jnp.asarray(rng.randn(r, 3), dtype)
    return rf, rd, m, pts, rayd


def _params(mod, args, dtype):
    p = mod.init(jax.random.PRNGKey(1), *args)["params"]
    return jax.tree.map(lambda x: x.astype(dtype), p)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 5e-6),
                                       (jnp.bfloat16, 3e-2)])
@pytest.mark.parametrize("depth", [2, 3])
def test_chain_matches_module(dtype, tol, depth):
    rng = np.random.RandomState(0)
    args = _inputs(rng, dtype=dtype)
    mod = GNTAggregator(in_feat_ch=32, netwidth=64, trans_depth=depth,
                        ret_alpha=True)
    params = _params(mod, _inputs(np.random.RandomState(0)), dtype)
    ref = mod.apply({"params": params}, *args)
    got = fused_chain_aggregate(params, *args, depth=depth, rays_tile=4)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-8
    assert err / scale < tol, (err, scale)


def test_chain_ray_and_sample_padding():
    # R not a multiple of the tile AND S not a multiple of 8: the wrapper
    # pads; padded key positions must not receive ray-attention weight
    rng = np.random.RandomState(3)
    args = _inputs(rng, r=5, s=13)
    mod = GNTAggregator(in_feat_ch=32, netwidth=64, trans_depth=2,
                        ret_alpha=True)
    params = _params(mod, args, jnp.float32)
    ref = mod.apply({"params": params}, *args)
    got = fused_chain_aggregate(params, *args, depth=2, rays_tile=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6)


def test_chain_fully_masked_rows_finite():
    rng = np.random.RandomState(4)
    rf, rd, m, pts, rayd = _inputs(rng)
    m = m.at[:, 0].set(0.0)  # every view masked out for ray 0
    mod = GNTAggregator(in_feat_ch=32, netwidth=64, trans_depth=2,
                        ret_alpha=True)
    params = _params(mod, (rf, rd, m, pts, rayd), jnp.float32)
    ref = mod.apply({"params": params}, rf, rd, m, pts, rayd)
    got = fused_chain_aggregate(params, rf, rd, m, pts, rayd, depth=2,
                                rays_tile=4)
    assert bool(jnp.all(jnp.isfinite(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6)


def test_chain_no_ret_alpha():
    rng = np.random.RandomState(5)
    args = _inputs(rng)
    mod = GNTAggregator(in_feat_ch=32, netwidth=64, trans_depth=2,
                        ret_alpha=False)
    params = _params(mod, args, jnp.float32)
    ref = mod.apply({"params": params}, *args)
    got = fused_chain_aggregate(params, *args, depth=2, ret_alpha=False,
                                rays_tile=4)
    assert got.shape == ref.shape == (args[0].shape[1], 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6)


def test_chain_render_cfg_route():
    # the RenderConfig.gnt_fused_chain gate in make_shade_fn routes the
    # shade through the kernel (bf16 only — the production dtype; f32/f64
    # keep the XLA path) and reproduces the module
    import dataclasses

    from nerfool_tpu.render.render_rays import RenderConfig, make_shade_fn

    rng = np.random.RandomState(6)
    args = _inputs(rng, dtype=jnp.bfloat16)
    mod = GNTAggregator(in_feat_ch=32, netwidth=64, trans_depth=2,
                        ret_alpha=True)
    params = _params(mod, args, jnp.bfloat16)
    base = RenderConfig(n_samples=24, backbone="gnt", ret_alpha=True,
                        compute_dtype="bfloat16")
    model = {"net_coarse": mod, "net_fine": None}
    plain = make_shade_fn(model, base)(params, mod, *args)
    fused = make_shade_fn(
        model, dataclasses.replace(base, gnt_fused_chain=True)
    )(params, mod, *args)
    err = float(jnp.max(jnp.abs(jnp.asarray(fused, jnp.float32)
                                - jnp.asarray(plain, jnp.float32))))
    scale = float(jnp.max(jnp.abs(jnp.asarray(plain, jnp.float32)))) + 1e-8
    assert err / scale < 3e-2, (err, scale)
    # the f32 route must stay on the XLA path (VMEM: bf16-only kernel)
    f32_args = _inputs(np.random.RandomState(6))
    f32_params = _params(mod, f32_args, jnp.float32)
    a = make_shade_fn(model, dataclasses.replace(
        base, compute_dtype="float32", gnt_fused_chain=True))(
        f32_params, mod, *f32_args)
    b = mod.apply({"params": f32_params}, *f32_args)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
