"""On-chip vs dispatch split for the feature net.

A single timed jit call on the relay mixes on-chip time with a large, noisy
host->relay dispatch latency (probe_feat_scaling: fwd V=1 34ms vs V=8 68ms —
nowhere near work-proportional). This probe separates them:

  1. dispatch floor: tiny x+1 jit call latency
  2. feature fwd V=4, K reps inside ONE jit (lax.scan) -> on-chip ms/rep
  3. feature fwd+bwd (remat) V=4, same -> on-chip ms/rep
  4. zero-pad variant of (2): bounds the reflect-pad copy cost on chip

Findings feed BENCH_NOTES (attack-step roofline: what a multi-iter scan could
ever achieve, and whether conv/pad optimization is worth anything).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = int(os.environ.get("PROBE_K", 10))


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    H = int(os.environ.get("BENCH_H", 756))
    W = int(os.environ.get("BENCH_W", 1008))
    V = int(os.environ.get("BENCH_SRC", 4))

    from nerfool_tpu.models.resunet import ResUNet

    net = ResUNet(coarse_out_ch=32, fine_out_ch=32)
    rng = np.random.RandomState(0)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, H, W, 3), jnp.float32))["params"]
    x = jnp.asarray(rng.rand(V, H, W, 3).astype(np.float32))

    def best_of(f, n=5):
        f()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return min(ts), sorted(ts)[len(ts) // 2]

    tiny = jnp.ones((8, 128), jnp.float32)
    add1 = jax.jit(lambda a: a + 1.0)
    b, m = best_of(lambda: jax.block_until_ready(add1(tiny)), n=10)
    print(f"dispatch floor (x+1): best {b*1e3:.1f} ms, median {m*1e3:.1f} ms",
          flush=True)

    def scan_fwd(xx):
        def body(c, _):
            out = net.apply({"params": params}, c)[0]
            # fold the output back into the carry so iterations can't collapse
            c = c + 1e-12 * jnp.mean(out)
            return c, jnp.mean(out)
        c, outs = jax.lax.scan(body, xx, None, length=K)
        return jnp.sum(outs) + jnp.sum(c[0, 0, 0])

    f = jax.jit(scan_fwd)
    b, m = best_of(lambda: jax.block_until_ready(f(x)), n=4)
    print(f"fwd x{K} in one call: best {b/K*1e3:.1f} ms/rep "
          f"(median {m/K*1e3:.1f})", flush=True)

    def scan_fwdbwd(xx):
        def loss(img):
            return jnp.sum(jax.checkpoint(
                lambda i: net.apply({"params": params}, i)[0])(img))
        def body(c, _):
            g = jax.grad(loss)(c)
            return c + 1e-12 * g, jnp.mean(g)
        c, outs = jax.lax.scan(body, xx, None, length=K)
        return jnp.sum(outs) + jnp.sum(c[0, 0, 0])

    fb = jax.jit(scan_fwdbwd)
    b, m = best_of(lambda: jax.block_until_ready(fb(x)), n=4)
    print(f"fwd+bwd(remat) x{K} in one call: best {b/K*1e3:.1f} ms/rep "
          f"(median {m/K*1e3:.1f})", flush=True)

    # zero-pad variant (perf probe only; numerics differ at borders). Swapping
    # the class SYMBOL in the resunet module keeps flax's compact machinery
    # intact (post-hoc __call__ reassignment bypasses module scoping); the
    # param tree matches because module instance names are explicit.
    from typing import Any

    from nerfool_tpu.models import resunet as R

    class ConvZero(nn.Module):
        features: int
        kernel_size: int
        stride: int = 1
        padding: int | None = None
        use_bias: bool = False
        dtype: Any = None

        @nn.compact
        def __call__(self, xx):
            pad = (self.padding if self.padding is not None
                   else (self.kernel_size - 1) // 2)
            return nn.Conv(self.features,
                           kernel_size=(self.kernel_size,) * 2,
                           strides=(self.stride,) * 2, padding=pad,
                           use_bias=self.use_bias, dtype=self.dtype,
                           name="conv")(xx)

    orig = R.ConvReflect
    R.ConvReflect = ConvZero
    try:
        fz = jax.jit(scan_fwd)
        b, m = best_of(lambda: jax.block_until_ready(fz(x)), n=4)
        print(f"ZERO-PAD fwd x{K} in one call: best {b/K*1e3:.1f} ms/rep "
              f"(median {m/K*1e3:.1f})", flush=True)
        fzb = jax.jit(scan_fwdbwd)
        b, m = best_of(lambda: jax.block_until_ready(fzb(x)), n=4)
        print(f"ZERO-PAD fwd+bwd x{K}: best {b/K*1e3:.1f} ms/rep "
              f"(median {m/K*1e3:.1f})", flush=True)
    finally:
        R.ConvReflect = orig


if __name__ == "__main__":
    main()
