"""Single-conv formulation shootout (on-chip, scan-amortized).

The feature net spends ~86% of its on-chip time in XLA 'data formatting'
copies around conv_general_dilated (see BENCH_NOTES round-3 feature-net
section). This probe times one representative conv under different
formulations to find one XLA lays out without copies:

  a) nn.Conv NHWC (what ConvReflect uses today)
  b) lax.conv NCHW
  c) shifted-dot: 3x3 conv as 9 offset [R,Cin]x[Cin,Cout] matmuls
  d) NHWC conv with channels zero-padded to 128 lanes

Each variant runs K reps inside one jit (lax.scan) so relay dispatch cannot
pollute the reading. Shapes: layer1 (189x252x64) and layer2 (95x126x128).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = int(os.environ.get("PROBE_K", 20))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    rng = np.random.RandomState(0)

    def bench(fn, x, label):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(4):
            t1 = time.perf_counter()
            jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t1)
        print(f"{label}: {min(ts)/K*1e3:.2f} ms/rep "
              f"(compile {compile_s:.0f}s)", flush=True)

    for (h, w, c) in ((189, 252, 64), (95, 126, 128)):
        n = 4
        x = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
        wk = jnp.asarray((rng.rand(3, 3, c, c) * 0.1).astype(np.float32))

        def scan_of(step):
            def outer(xx):
                def body(cst, _):
                    y = step(cst)
                    return cst + 1e-12 * jnp.mean(y), jnp.mean(y)
                cst, outs = lax.scan(body, xx, None, length=K)
                return jnp.sum(outs) + jnp.sum(cst[0, 0, 0])
            return outer

        def conv_nhwc(xx):
            return lax.conv_general_dilated(
                xx, wk, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        bench(scan_of(conv_nhwc), x, f"a nhwc-conv {h}x{w}x{c}")

        xc = jnp.transpose(x, (0, 3, 1, 2))
        wkc = jnp.transpose(wk, (3, 2, 0, 1))

        def conv_nchw(xx):
            return lax.conv_general_dilated(
                xx, wkc, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        bench(scan_of(conv_nchw), xc, f"b nchw-conv {h}x{w}x{c}")

        def conv_dots(xx):
            xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = jnp.zeros_like(xx)
            for dy in range(3):
                for dx in range(3):
                    y = y + jnp.einsum(
                        "nhwc,cd->nhwd",
                        lax.slice(xp, (0, dy, dx, 0),
                                  (n, dy + h, dx + w, c)),
                        wk[dy, dx])
            return y

        bench(scan_of(conv_dots), x, f"c shifted-dot {h}x{w}x{c}")

        if c < 128:
            x128 = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - c)))
            wk128 = jnp.pad(wk, ((0, 0), (0, 0), (0, 128 - c), (0, 128 - c)))

            def conv_pad128(xx):
                return lax.conv_general_dilated(
                    xx, wk128, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            bench(scan_of(conv_pad128), x128, f"d c128-conv {h}x{w}x{c}->128")


if __name__ == "__main__":
    main()
