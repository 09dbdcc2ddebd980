import sys, time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from nerfool_tpu.models.gnt import GNTAggregator
from nerfool_tpu.ops.gnt_kernel import gnt_aggregate_pallas

depth = int(sys.argv[1]); v = int(sys.argv[2]); r = int(sys.argv[3]); s = int(sys.argv[4]); blk = int(sys.argv[5])
dt = jnp.bfloat16 if len(sys.argv) > 6 and sys.argv[6] == "bf16" else jnp.float32
rng = np.random.RandomState(0)
rgb_feat = jnp.asarray(rng.rand(v, r, s, 35).astype(np.float32)).astype(dt)
d = rng.randn(v, r, s, 3).astype(np.float32); d /= np.linalg.norm(d, axis=-1, keepdims=True)
ray_diff = jnp.asarray(np.concatenate([d, rng.rand(v, r, s, 1).astype(np.float32)], -1)).astype(dt)
mask = jnp.asarray((rng.rand(v, r, s, 1) > 0.2).astype(np.float32)).astype(dt)
pts = jnp.asarray(rng.randn(r, s, 3).astype(np.float32)).astype(dt)
ray_d = jnp.asarray(rng.randn(r, 3).astype(np.float32)).astype(dt)
m = GNTAggregator(in_feat_ch=32, netwidth=64, trans_depth=depth, ret_alpha=True)
params = m.init(jax.random.PRNGKey(0), rgb_feat.astype(jnp.float32), ray_diff.astype(jnp.float32),
                mask.astype(jnp.float32), pts.astype(jnp.float32), ray_d.astype(jnp.float32))["params"]
print(f"compiling depth={depth} v={v} r={r} s={s} blk={blk} {dt.__name__}...", flush=True)
t0 = time.time()
out = gnt_aggregate_pallas(params, rgb_feat, ray_diff, mask, pts, ray_d,
                           trans_depth=depth, ret_alpha=True, ray_block=blk)
print("compile+run", time.time()-t0, "s", flush=True)
ref = m.apply({"params": params}, rgb_feat.astype(jnp.float32), ray_diff.astype(jnp.float32),
              mask.astype(jnp.float32), pts.astype(jnp.float32), ray_d.astype(jnp.float32))
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
print("max err vs flax f32:", err, flush=True)
ts = []
for _ in range(3):
    t0 = time.time()
    float(jnp.sum(gnt_aggregate_pallas(params, rgb_feat, ray_diff, mask, pts, ray_d,
                                       trans_depth=depth, ret_alpha=True, ray_block=blk)[0]))
    ts.append(time.time()-t0)
print(f"steady: {min(ts)*1e3:.1f} ms for {r} rays -> {r/min(ts):,.0f} rays/s", flush=True)
