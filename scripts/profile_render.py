"""Capture a jax.profiler trace of the flagship render + attack step and print
the top self-time ops (xprof op-profile), answering "where does the time go"
at op granularity — the reference has nothing beyond wall-clock prints
(SURVEY.md §5 tracing).

Usage:  python scripts/profile_render.py [out_dir]
Env:    same BENCH_* knobs as bench.py (scale, dtypes, backbone).
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def top_ops_from_xplane(logdir, k=25):
    """Parse the captured xplane.pb with xprof and return [(op, self_us)]."""
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        return None
    import gzip
    import json

    data, _ = rtd.xspace_to_tool_data([paths[-1]], "op_profile", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    prof = json.loads(data)

    rows = []

    def walk(node, path):
        m = node.get("metrics", {})
        name = node.get("name", "?")
        kids = node.get("children", [])
        if not kids and m.get("rawTime"):
            rows.append((path + "/" + name, m.get("rawTime", 0)))
        for c in kids:
            walk(c, path + "/" + name)

    walk(prof.get("byProgram", prof), "")
    rows.sort(key=lambda r: -r[1])
    return rows[:k]


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nerfool_trace"
    os.environ.setdefault("BENCH_ATTACK_ITERS", "3")
    os.environ.setdefault("BENCH_MAX_SEG", "131072")

    import jax
    import jax.numpy as jnp

    # reuse bench.py's model/scene setup by importing its main pieces inline
    import bench as B

    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.render.render_image import _render_blocked_jit
    from nerfool_tpu.render.render_rays import RenderConfig
    from nerfool_tpu.utils.cameras import get_rays

    rng = np.random.RandomState(0)
    H, W, N_SRC = B.H, B.W, B.N_SRC
    cams, depth_range = B.build_scene()
    src_rgbs = jnp.asarray(rng.rand(N_SRC, H, W, 3).astype(np.float32))
    src_cams = jnp.asarray(cams[1:])
    target_cam = cams[0]

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    bundle = create_model(backbone=B.BACKBONE, rng_key=jax.random.PRNGKey(0),
                          trans_depth=8, single_net=True,
                          feature_dtype=B.FEATURE_DTYPE)
    cfg = RenderConfig(
        n_samples=B.N_SAMPLES, n_importance=B.N_IMPORTANCE, det=True,
        inv_uniform=B.BACKBONE == "ibrnet", backbone=B.BACKBONE,
        single_net=B.BACKBONE == "gnt", ret_alpha=B.BACKBONE == "gnt",
        stop_camera_grad=B.BACKBONE == "ibrnet", compute_dtype=B.DTYPE,
        reuse_fine_taps=B.REUSE_TAPS,
    )
    feats = bundle.extract_features(src_rgbs)
    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
    if B.USE_BSPG:
        import dataclasses as _dc

        from nerfool_tpu.ops.bspg import plan_render_specs

        specs = plan_render_specs(
            target_cam[None], cams[1:], depth_range.reshape(-1),
            (H, W), feats[0].shape[1:3], block=(8, 8),
        )
        if specs is not None:
            cfg = _dc.replace(cfg, bspg_specs=specs,
                              bspg_pallas=B.BSPG_PALLAS)
            bh, bw = specs[0].block
            hp, wp = -(-H // bh) * bh, -(-W // bw) * bw
            yy, xx = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
            sidx = np.minimum(yy, H - 1) * W + np.minimum(xx, W - 1)
            perm = (sidx.reshape(hp // bh, bh, wp // bw, bw)
                    .transpose(0, 2, 1, 3).reshape(-1))
            rays_o = rays_o[jnp.asarray(perm)]
            rays_d = rays_d[jnp.asarray(perm)]
    seg = int(os.environ.get("BENCH_MAX_SEG", 131072))
    batch = {
        "ray_o": rays_o[:seg], "ray_d": rays_d[:seg],
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }

    def run():
        ret = _render_blocked_jit(bundle.render_params, bundle.modules, batch,
                                  feats, cfg, src_rgbs, src_cams, B.CHUNK,
                                  None, None)
        lvl = ret["outputs_fine"] or ret["outputs_coarse"]
        return float(jnp.sum(lvl["rgb"]))

    run()  # compile outside the trace
    with jax.profiler.trace(out):
        for _ in range(2):
            run()
    print(f"render trace written to {out}", file=sys.stderr)

    def report(logdir, title):
        rows = top_ops_from_xplane(logdir)
        if rows is None:
            print(f"{title}: no xplane captured (relay backend may not "
                  f"support profiling)", file=sys.stderr)
            return
        total = sum(t for _, t in rows)
        print(f"{title}: top ops by self time:")
        for name, t in rows:
            print(f"  {t:12.0f}  {name[-110:]}")
        print(f"  (top-{len(rows)} raw-time sum {total:.0f} over 2 runs)")

    report(out, "render")

    # ---- attack step
    import dataclasses

    from nerfool_tpu.attack.attack import (
        AttackConfig, init_attack_state, make_attack_step,
    )

    acfg = AttackConfig(h=H, w=W, n_rand=int(os.environ.get("BENCH_NRAND", 512)),
                        use_adam=True, adam_lr=1e-3, epsilon=8.0)
    attack_cfg = dataclasses.replace(cfg, compute_dtype=B.ATTACK_DTYPE,
                                     bspg_specs=None)
    target = {
        "camera": jnp.asarray(target_cam),
        "rgb": jnp.asarray(rng.rand(H * W, 3).astype(np.float32)),
        "depth": None,
        "depth_range": jnp.asarray(np.array([[2.0, 6.0]], np.float32)),
    }
    src = {"rgbs": src_rgbs, "cameras": src_cams, "featmaps_clean": None}
    step = jax.jit(make_attack_step(bundle, attack_cfg, acfg))
    state = init_attack_state(jax.random.PRNGKey(1), acfg, src_rgbs)
    state, _ = step(state, target, src, jax.random.PRNGKey(2))  # compile
    float(jnp.sum(state["delta"]))
    out2 = out + "_attack"
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    with jax.profiler.trace(out2):
        for i in range(2):
            state, _ = step(state, target, src, keys[i])
        float(jnp.sum(state["delta"]))
    print(f"attack trace written to {out2}", file=sys.stderr)
    report(out2, "attack step")


if __name__ == "__main__":
    main()
