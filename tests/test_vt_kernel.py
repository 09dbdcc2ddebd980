"""Fused ViewAttention Pallas kernel (ops/vt_kernel.py) exactness vs the XLA
path — module level and full-aggregator level (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfool_tpu.models.gnt import GNTAggregator, ViewAttention


def _va_inputs(rng, v=4, r=6, s=16, d=64, dtype=jnp.float32):
    q = jnp.asarray(rng.randn(r, s, d), dtype)
    k = jnp.asarray(rng.randn(v, r, s, d), dtype)
    pos = jnp.asarray(rng.randn(v, r, s, 4), dtype)
    mask = jnp.asarray(rng.rand(v, r, s, 1) > 0.2, dtype)
    return q, k, pos, mask


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
def test_fused_view_attention_matches_xla(dtype, tol):
    rng = np.random.RandomState(0)
    q, k, pos, mask = _va_inputs(rng, dtype=dtype)
    mod = ViewAttention(64)
    params = mod.init(jax.random.PRNGKey(1), q, k, pos, mask)["params"]
    params = jax.tree.map(lambda p: p.astype(dtype), params)
    ref = mod.apply({"params": params}, q, k, pos, mask)
    got = ViewAttention(64, fused=True).apply({"params": params}, q, k, pos,
                                              mask)
    assert got.dtype == ref.dtype
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-8
    assert err / scale < tol, (err, scale)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
def test_lane_packed_view_attention_matches_xla(dtype, tol):
    # r*s odd -> exercises the odd-row zero-pad half
    from nerfool_tpu.ops.vt_kernel import fused_view_attention

    rng = np.random.RandomState(7)
    q, k, pos, mask = _va_inputs(rng, v=4, r=3, s=5, d=64, dtype=dtype)
    mod = ViewAttention(64)
    params = mod.init(jax.random.PRNGKey(1), q, k, pos, mask)["params"]
    params = jax.tree.map(lambda p: p.astype(dtype), params)
    ref = mod.apply({"params": params}, q, k, pos, mask)
    p = params
    wkv = jnp.concatenate([p["k_fc"]["kernel"],
                           p["k_fc"]["kernel"] @ p["v_fc"]["kernel"]], -1)
    got = fused_view_attention(
        q.reshape(15, 64), k.reshape(4, 15, 64), pos.reshape(4, 15, 4),
        mask.reshape(4, 15, 1), p["q_fc"]["kernel"], wkv,
        p["pos_fc0"]["kernel"], p["pos_fc0"]["bias"],
        p["pos_fc1"]["kernel"], p["pos_fc1"]["bias"],
        p["attn_fc0"]["kernel"], p["attn_fc0"]["bias"],
        p["attn_fc1"]["kernel"], p["attn_fc1"]["bias"],
        p["out_fc"]["kernel"], p["out_fc"]["bias"],
        lane_pack=True).reshape(3, 5, 64)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-8
    assert err / scale < tol, (err, scale)


def test_lane_packed_module_route_matches_plain():
    # lane_pack is a module field (plumbed through RenderConfig), not an env
    # read — flipping it after trace would otherwise silently no-op
    rng = np.random.RandomState(8)
    q, k, pos, mask = _va_inputs(rng, v=3, r=4, s=8)
    mod = ViewAttention(64)
    params = mod.init(jax.random.PRNGKey(1), q, k, pos, mask)["params"]
    ref = mod.apply({"params": params}, q, k, pos, mask)
    got = ViewAttention(64, fused=True, lane_pack=True).apply(
        {"params": params}, q, k, pos, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_view_attention_fully_masked_rows_finite():
    # rows where every view is masked out: the XLA path softmaxes a uniform
    # -1e9 row to 1/V weights; the kernel must do the same (no NaN)
    rng = np.random.RandomState(1)
    q, k, pos, mask = _va_inputs(rng, v=3, r=2, s=8)
    mask = mask.at[:, 0].set(0.0)
    mod = ViewAttention(64)
    params = mod.init(jax.random.PRNGKey(1), q, k, pos, mask)["params"]
    ref = mod.apply({"params": params}, q, k, pos, mask)
    got = ViewAttention(64, fused=True).apply({"params": params}, q, k, pos,
                                              mask)
    assert bool(jnp.all(jnp.isfinite(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_aggregator_matches_plain():
    rng = np.random.RandomState(2)
    v, r, s, f = 4, 6, 12, 32
    rgb_feat = jnp.asarray(rng.randn(v, r, s, 3 + f), jnp.float32)
    ray_diff = jnp.asarray(rng.randn(v, r, s, 4), jnp.float32)
    mask = jnp.asarray(rng.rand(v, r, s, 1) > 0.2, jnp.float32)
    pts = jnp.asarray(rng.randn(r, s, 3), jnp.float32)
    ray_d = jnp.asarray(rng.randn(r, 3), jnp.float32)
    mod = GNTAggregator(in_feat_ch=f, trans_depth=2, ret_alpha=True)
    params = mod.init(jax.random.PRNGKey(3), rgb_feat, ray_diff, mask, pts,
                      ray_d)["params"]
    ref = mod.apply({"params": params}, rgb_feat, ray_diff, mask, pts, ray_d)
    got = mod.clone(fused_attn=True, fused_vt=True).apply(
        {"params": params}, rgb_feat, ray_diff, mask, pts, ray_d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5,
                               rtol=1e-4)


def test_fused_falls_back_on_f64():
    # parity tests run f64; the fused path must silently use the XLA branch
    rng = np.random.RandomState(4)
    jax.config.update("jax_enable_x64", True)
    try:
        q, k, pos, mask = _va_inputs(rng, v=3, r=2, s=8, dtype=jnp.float64)
        mod = ViewAttention(64)
        params = mod.init(jax.random.PRNGKey(1), q, k, pos, mask)["params"]
        ref = mod.apply({"params": params}, q, k, pos, mask)
        got = ViewAttention(64, fused=True).apply({"params": params}, q, k,
                                                  pos, mask)
        assert got.dtype == jnp.float64
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
def test_fused_ray_attention_matches_xla(dtype, tol):
    from nerfool_tpu.models.gnt import RayAttention

    rng = np.random.RandomState(5)
    r, s, d = 6, 12, 64  # s NOT a multiple of 8: exercises key-pad masking
    x = jnp.asarray(rng.randn(r, s, d), dtype)
    mod = RayAttention(d)
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    params = jax.tree.map(lambda p: p.astype(dtype), params)
    ref, ref_attn = mod.apply({"params": params}, x, ret_attn=True)
    ref_attn0 = jnp.mean(ref_attn, axis=1)[:, 0]
    got, got_attn0 = RayAttention(d, fused=True).apply(
        {"params": params}, x, ret_attn=True)
    assert got.dtype == ref.dtype
    for a, b in ((ref, got), (ref_attn0, got_attn0)):
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) + 1e-8
        assert err / scale < tol, (err, scale)


def test_fused_ray_transformer_matches_plain():
    from nerfool_tpu.models.gnt import RayTransformer

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(4, 16, 64), jnp.float32)
    mod = RayTransformer(64)
    params = mod.init(jax.random.PRNGKey(2), x, ret_attn=True)["params"]
    ref, ref_attn = mod.apply({"params": params}, x, ret_attn=True)
    got, got_attn = mod.clone(fused=True).apply({"params": params}, x,
                                                ret_attn=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_attn), np.asarray(ref_attn),
                               atol=3e-6)
