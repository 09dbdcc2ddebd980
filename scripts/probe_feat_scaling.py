"""Feature-net scaling probe: where do the ResUNet's milliseconds come from?

Times the f32 fwd at V in {1,2,4,8} (dispatch-latency vs throughput split),
then at V=4 with reflect pads swapped for zero pads (perf-only probe: bounds
the cost of the per-conv reflect-pad materialization the op profile flags as
'data formatting' copies). Findings feed BENCH_NOTES.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    H = int(os.environ.get("BENCH_H", 756))
    W = int(os.environ.get("BENCH_W", 1008))

    from nerfool_tpu.models.resunet import ResUNet

    net = ResUNet(coarse_out_ch=32, fine_out_ch=32)
    rng = np.random.RandomState(0)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, H, W, 3), jnp.float32))["params"]

    def timed(apply, x, n=5):
        y = jax.block_until_ready(apply(x))
        del y
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(apply(x))
            ts.append(time.perf_counter() - t0)
        return min(ts), sorted(ts)[len(ts) // 2]

    fwd = jax.jit(lambda x: net.apply({"params": params}, x)[0])
    for v in (1, 2, 4, 8):
        x = jnp.asarray(rng.rand(v, H, W, 3).astype(np.float32))
        t0 = time.perf_counter()
        best, med = timed(fwd, x)
        print(f"fwd V={v}: best {best*1e3:.1f} ms, median {med*1e3:.1f} ms "
              f"(incl. compile {time.perf_counter()-t0:.0f}s)", flush=True)

    # zero-pad variant: same arch/params, pads swapped (numerics differ at the
    # border — throughput probe only)
    from nerfool_tpu.models import layers as L
    import flax.linen as nn

    orig = L.ConvReflect.__call__

    def zeropad_call(self, x):
        pad = self.padding if self.padding is not None else (self.kernel_size - 1) // 2
        return nn.Conv(self.features, kernel_size=(self.kernel_size,) * 2,
                       strides=(self.stride,) * 2, padding=pad,
                       use_bias=self.use_bias, dtype=self.dtype,
                       name="conv")(x)

    L.ConvReflect.__call__ = zeropad_call
    try:
        # the patched method takes effect at trace time; params are identical
        fwd_z = jax.jit(lambda x: net.apply({"params": params}, x)[0])
        x = jnp.asarray(rng.rand(4, H, W, 3).astype(np.float32))
        best, med = timed(fwd_z, x)
        print(f"fwd V=4 ZERO-PAD: best {best*1e3:.1f} ms, median {med*1e3:.1f} ms",
              flush=True)
    finally:
        L.ConvReflect.__call__ = orig


if __name__ == "__main__":
    main()
