"""XLA-level GNT aggregation restructure probe at GNT-full shapes.

Candidates (all numerically exact up to f32/bf16 reassociation):
  base : current GNTAggregator
  fused: - RayAttention q/k/v as ONE [64 -> 192] matmul (same input)
         - ViewAttention k_fc + v_fc as ONE [64 -> 128] matmul
           (v = (k@Wk)@Wv = k@(Wk@Wv), no nonlinearity between)
Param trees stay identical to the Dense modules (.pth importer unaffected).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nerfool_tpu.utils.platform import apply_platform_env


def main():
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from nerfool_tpu.models import gnt as G

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    rng = np.random.RandomState(0)
    V, S = 10, 192
    dt = jnp.bfloat16

    def force(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    class _K(nn.Module):
        """Declares the same params as nn.Dense(name=...) without applying."""
        din: int
        dout: int
        use_bias: bool = True

        @nn.compact
        def __call__(self):
            k = self.param("kernel", nn.initializers.lecun_normal(),
                           (self.din, self.dout))
            b = (self.param("bias", nn.initializers.zeros, (self.dout,))
                 if self.use_bias else None)
            return k, b

    def fused_view_call(self, q, k, pos, mask=None):
        dim = self.dim
        din = q.shape[-1]
        wq, _ = _K(din, dim, False, name="q_fc")()
        wk, _ = _K(din, dim, False, name="k_fc")()
        wv, _ = _K(dim, dim, False, name="v_fc")()
        qp = q @ wq.astype(q.dtype)
        wkv = jnp.concatenate([wk, wk @ wv], axis=-1).astype(k.dtype)
        kv = k @ wkv
        kp, v = kv[..., :dim], kv[..., dim:]
        pos_ = nn.Dense(dim // 8, name="pos_fc0")(pos)
        pos_ = nn.Dense(dim, name="pos_fc1")(nn.relu(pos_))
        attn = kp - qp[None] + pos_
        attn = nn.Dense(dim // 8, name="attn_fc0")(attn)
        attn = nn.Dense(dim, name="attn_fc1")(nn.relu(attn))
        if mask is not None:
            attn = jnp.where(mask == 0, -1e9, attn)
        attn = jax.nn.softmax(attn, axis=0)
        x = jnp.sum((v + pos_) * attn, axis=0)
        return nn.Dense(dim, name="out_fc")(x)

    def fused_ray_call(self, x, ret_attn=False):
        r, s, _ = x.shape
        dim, n_heads = self.dim, self.n_heads
        hd = dim // n_heads
        din = x.shape[-1]
        wq, _ = _K(din, dim, False, name="q_fc")()
        wk, _ = _K(din, dim, False, name="k_fc")()
        wv, _ = _K(din, dim, False, name="v_fc")()
        wqkv = jnp.concatenate([wq, wk, wv], axis=-1).astype(x.dtype)
        qkv = x @ wqkv
        q, k, v = (qkv[..., :dim], qkv[..., dim:2 * dim], qkv[..., 2 * dim:])
        q = q.reshape(r, s, n_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(r, s, n_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(r, s, n_heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("rhqd,rhkd->rhqk", q, k) / jnp.sqrt(float(hd))
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("rhqk,rhkd->rhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(r, s, dim)
        out = nn.Dense(dim, name="out_fc")(out)
        if ret_attn:
            return out, attn
        return out

    model = G.GNTAggregator(trans_depth=8, ret_alpha=True)

    for R in (800, 1600):
        rgb_feat = jnp.asarray(rng.rand(V, R, S, 35), dt)
        ray_diff = jnp.asarray(rng.rand(V, R, S, 4), dt)
        mask = jnp.asarray((rng.rand(V, R, S, 1) > 0.1), dt)
        pts = jnp.asarray(rng.rand(R, S, 3), dt)
        ray_d = jnp.asarray(rng.rand(R, 3), dt)
        params = model.init(jax.random.PRNGKey(0), rgb_feat, ray_diff, mask,
                            pts, ray_d)["params"]

        base_out = None
        for name in ("base", "fused"):
            if name == "fused":
                orig_v = G.ViewAttention.__call__
                orig_r = G.RayAttention.__call__
                G.ViewAttention.__call__ = nn.compact(fused_view_call)
                G.RayAttention.__call__ = nn.compact(fused_ray_call)
            try:
                fn = jax.jit(lambda p, *a: model.apply({"params": p}, *a))
                t0 = time.perf_counter()
                out = fn(params, rgb_feat, ray_diff, mask, pts, ray_d)
                force(out)
                comp = time.perf_counter() - t0
                if name == "base":
                    base_out = np.asarray(out, np.float32)
                else:
                    err = np.abs(np.asarray(out, np.float32) - base_out).max()
                    print(f"R={R} fused-vs-base max err: {err:.2e}", flush=True)
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    force(fn(params, rgb_feat, ray_diff, mask, pts, ray_d))
                    ts.append(time.perf_counter() - t0)
                ms = min(ts) * 1e3
                print(f"R={R} {name}: {ms:7.1f} ms  ({R/min(ts):,.0f} rays/s agg) "
                      f"compile {comp:.0f}s", flush=True)
            except Exception as e:
                print(f"R={R} {name}: FAIL {str(e)[-300:]}", flush=True)
            finally:
                if name == "fused":
                    G.ViewAttention.__call__ = orig_v
                    G.RayAttention.__call__ = orig_r


if __name__ == "__main__":
    main()
