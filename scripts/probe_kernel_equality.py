"""On-hardware equality battery for every shipped Pallas kernel (VERDICT r4
item 4): each row runs the kernel AND the XLA path at flagship shapes on the
real device and records max-abs-diff. CPU-tier tests run the kernels in
interpret mode, which does not certify the Mosaic lowering (the round-2 MXU
bf16-rounding incident is the precedent); this battery does.

Rows:
  ra_fwd      fused_ray_attention via RayAttention(fused=True)  [R,192,64]
  ra_attn0    the ret_attn compositing row of the same call
  ra_vjp      fused_ray_attention_ad grads (x + params) vs XLA grads
  vt          fused_view_attention via ViewAttention(fused=True) [10,R,192,64]
  vt_lp       the lane-packed variant of the same call
  bspg_render whole-segment flagship render, BSPG+Pallas selection vs the
              per-tap XLA gather (covers bspg_kernel end to end)
  spg_attack  one differentiated attack step, SPG gather vs per-tap (loss +
              delta-update agreement; covers ops/spg in the grad path)

Results: one line per row + scripts/battery_results/kernel_equality_<kind>.json
(pass/fail vs the same tolerances the CPU tests use: f32 2e-5 rel, bf16 3e-2
rel on attention modules; 3/255 abs on bf16 rendered RGB).

Usage: python scripts/probe_kernel_equality.py   (BENCH_* env knobs)
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H = int(os.environ.get("BENCH_H", 756))
W = int(os.environ.get("BENCH_W", 1008))
N_SRC = int(os.environ.get("BENCH_SRC", 10))
S = int(os.environ.get("BENCH_NSAMPLES", 192))
CHUNK = int(os.environ.get("BENCH_CHUNK", 4096))
SEG = int(os.environ.get("BENCH_MAX_SEG", 131072))
OUTDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "battery_results")

ROWS = {}


def record(name, err, scale, tol, extra=None):
    rel = err / (scale + 1e-12)
    ok = rel < tol
    ROWS[name] = dict(max_abs_diff=float(err), ref_scale=float(scale),
                      rel=float(rel), tol=tol, passed=bool(ok),
                      **(extra or {}))
    print(f"{name:12s} max|d|={err:.3e} scale={scale:.3e} rel={rel:.2e} "
          f"tol={tol:.0e} {'PASS' if ok else 'FAIL'}", flush=True)


def main():
    from nerfool_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    from nerfool_tpu.models.gnt import RayAttention, ViewAttention

    kind = jax.devices()[0].device_kind
    on_tpu = jax.default_backend() == "tpu"
    print(f"devices: {jax.devices()}  (Pallas "
          f"{'NATIVE Mosaic' if on_tpu else 'INTERPRET mode'})", flush=True)
    rng = np.random.RandomState(0)

    def diff(a, b):
        a32 = jnp.asarray(a, jnp.float32)
        b32 = jnp.asarray(b, jnp.float32)
        return (float(jnp.max(jnp.abs(a32 - b32))),
                float(jnp.max(jnp.abs(a32))))

    # f32 comparisons pin matmuls to HIGHEST on BOTH sides: the kernels
    # already force it internally (ops/vt_kernel._prec — the round-2 MXU
    # bf16-rounding incident), while the XLA module path defaults to the
    # MXU's bf16-input rounding on TPU; without the pin the ~7e-3 rel
    # difference measures XLA's precision choice, not the Mosaic lowering
    import contextlib

    def prec_ctx(dt):
        return (jax.default_matmul_precision("highest")
                if dt == jnp.float32 else contextlib.nullcontext())

    # ---- ray attention forward (+ attn0 row), flagship block shape
    for dt, tol, r in ((jnp.bfloat16, 3e-2, 4096), (jnp.float32, 2e-5, 1024)):
        x = jnp.asarray(rng.randn(r, S, 64), dt)
        mod = RayAttention(64)
        params = jax.tree.map(
            lambda p: p.astype(dt),
            mod.init(jax.random.PRNGKey(1), x, ret_attn=True)["params"])
        with prec_ctx(dt):
            ref, aref = jax.jit(lambda p, x: mod.apply(
                {"params": p}, x, ret_attn=True))(params, x)
            got, agot = jax.jit(lambda p, x: mod.clone(fused=True).apply(
                {"params": p}, x, ret_attn=True))(params, x)
        sfx = "bf16" if dt == jnp.bfloat16 else "f32"
        record(f"ra_fwd_{sfx}", *diff(got, ref), tol, {"shape": [r, S, 64]})
        # the kernel emits the head-mean FIRST-query-row map [R, S]; the
        # plain module returns the full [R, H, S, S] scores — reduce them
        # the way the consumer (RayTransformer) does
        record(f"ra_attn0_{sfx}",
               *diff(agot, jnp.mean(aref, axis=1)[:, 0]), tol)

    # ---- ray attention VJP (the --gnt_fused_attack path)
    r = 512
    x = jnp.asarray(rng.randn(r, S, 64), jnp.float32)
    mod = RayAttention(64)
    params = mod.init(jax.random.PRNGKey(1), x, ret_attn=True)["params"]

    def loss(p, x, fused):
        out, attn = mod.clone(fused=fused).apply({"params": p}, x,
                                                 ret_attn=True)
        return jnp.mean(out ** 2) + jnp.mean(attn ** 2)

    with prec_ctx(jnp.float32):
        g_ref = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(
            params, x, False)
        g_fus = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(
            params, x, True)
    errs = [diff(a, b) for a, b in zip(jax.tree.leaves(g_fus),
                                       jax.tree.leaves(g_ref))]
    err = max(e for e, _ in errs)
    scale = max(s for _, s in errs)
    # gate on ABSOLUTE grad error (the CPU test's atol=2e-4,
    # tests/test_ra_vjp.py): per-leaf grad scales vary by orders of
    # magnitude, so a joint err/scale ratio misgates tiny-scale leaves
    record("ra_vjp_f32", err, 1.0, 2e-4,
           {"shape": [r, S, 64], "metric": "abs grad err",
            "max_grad_scale": scale})

    # ---- view attention (fused + lane-packed), flagship per-chunk shape
    for dt, tol, r in ((jnp.bfloat16, 3e-2, 1024), (jnp.float32, 2e-5, 256)):
        q = jnp.asarray(rng.randn(r, S, 64), dt)
        k = jnp.asarray(rng.randn(N_SRC, r, S, 64), dt)
        pos = jnp.asarray(rng.randn(N_SRC, r, S, 4), dt)
        mask = jnp.asarray(rng.rand(N_SRC, r, S, 1) > 0.2, dt)
        mod = ViewAttention(64)
        params = jax.tree.map(
            lambda p: p.astype(dt),
            mod.init(jax.random.PRNGKey(1), q, k, pos, mask)["params"])
        with prec_ctx(dt):
            ref = jax.jit(mod.apply)({"params": params}, q, k, pos, mask)
            sfx = "bf16" if dt == jnp.bfloat16 else "f32"
            for lp in (False, True):
                got = jax.jit(lambda p, *a: mod.clone(
                    fused=True, lane_pack=lp).apply({"params": p}, *a))(
                    params, q, k, pos, mask)
                record(f"vt{'_lp' if lp else ''}_{sfx}", *diff(got, ref),
                       tol, {"shape": [N_SRC, r, S, 64]})

    # ---- whole-chain GNT aggregation kernel at flagship depth/shapes
    from nerfool_tpu.models.gnt import GNTAggregator
    from nerfool_tpu.ops.chain_kernel import fused_chain_aggregate

    # bf16 row at flagship S (the production dtype); the f32 lowering row
    # runs at S/2 — f32 doubles the kernel's VMEM residency past the scoped
    # limit at S=192 (bf16-only in production; render_rays gates on dtype)
    for dt, tol, r, s_row in ((jnp.bfloat16, 3e-2, 512, S),
                              (jnp.float32, 2e-5, 128, S // 2)):
        rf = jnp.asarray(rng.randn(N_SRC, r, s_row, 35), dt)
        rd = jnp.asarray(rng.randn(N_SRC, r, s_row, 4), dt)
        mk = jnp.asarray(rng.rand(N_SRC, r, s_row, 1) > 0.2, dt)
        pts = jnp.asarray(rng.randn(r, s_row, 3), dt)
        rayd = jnp.asarray(rng.randn(r, 3), dt)
        mod = GNTAggregator(in_feat_ch=32, netwidth=64, trans_depth=8,
                            ret_alpha=True)
        params = jax.tree.map(
            lambda p: p.astype(dt),
            mod.init(jax.random.PRNGKey(1), rf[:, :2, :8], rd[:, :2, :8],
                     mk[:, :2, :8], pts[:2, :8], rayd[:2])["params"])
        with prec_ctx(dt):
            ref = jax.jit(mod.apply)({"params": params}, rf, rd, mk, pts,
                                     rayd)
            got = jax.jit(functools.partial(
                fused_chain_aggregate, depth=8))(params, rf, rd, mk, pts,
                                                 rayd)
        sfx = "bf16" if dt == jnp.bfloat16 else "f32"
        record(f"chain_{sfx}", *diff(got, ref), tol,
               {"shape": [N_SRC, r, s_row, 64], "depth": 8})
    del rf, rd, mk, pts, rayd, ref, got, params  # free HBM for the renders

    # ---- BSPG selection kernel: whole-segment flagship render vs per-tap
    import dataclasses

    from bench import build_scene, cached_plan_render_specs as plan_render_specs

    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.render.render_image import _render_blocked_jit
    from nerfool_tpu.render.render_rays import RenderConfig
    from nerfool_tpu.utils.cameras import get_rays

    cams, depth_range = build_scene()
    target_cam, src_cams = cams[0], cams[1:]
    src_rgbs = jnp.asarray(rng.rand(N_SRC, H, W, 3).astype(np.float32))
    src_cams_j = jnp.asarray(src_cams)
    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(0))
    base = RenderConfig(n_samples=64, n_importance=64, det=True,
                        inv_uniform=True, backbone="ibrnet",
                        stop_camera_grad=True, compute_dtype="bfloat16")
    feats = jax.jit(lambda p, x: bundle.feature_net.apply({"params": p}, x))(
        bundle.params["feature_net"], src_rgbs)
    specs = plan_render_specs(target_cam[None], src_cams,
                              depth_range.reshape(-1), (H, W),
                              feats[0].shape[1:3], block=(8, 8),
                              n_samples=64, n_importance=64, inv_uniform=True)
    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
    # block-major ray order (bench.py does the same remap)
    bh = bw = 8
    hp, wp = -(-H // bh) * bh, -(-W // bw) * bw
    yy, xx = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    sidx = np.minimum(yy, H - 1) * W + np.minimum(xx, W - 1)
    perm = (sidx.reshape(hp // bh, bh, wp // bw, bw)
            .transpose(0, 2, 1, 3).reshape(-1))
    seg = min(SEG, len(perm) // CHUNK * CHUNK)
    sub = {
        "ray_o": rays_o[jnp.asarray(perm[:seg])],
        "ray_d": rays_d[jnp.asarray(perm[:seg])],
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }
    # Gate on the COARSE level: given identical stratified z's it is a
    # deterministic function of the taps, so it isolates the selection
    # kernel. The FINE level is report-only — inverse-CDF importance
    # resampling flips searchsorted bins on ~1e-7 coarse-weight differences
    # (gather accumulation order), and on this white-noise scene a one-bin
    # z-shift is an O(1) color change on a few rays (diagnosed round 5:
    # coarse agrees 1.8e-7 f32 while fine shows 0.07-0.9 outliers on CPU
    # AND TPU — scene chaos, not a lowering bug). The f32 row certifies the
    # selection exactly (measured 7.7e-5 on TPU); the bf16 row's wider gate
    # bounds bf16 tap/compositing rounding, which differs between engines
    # by accumulation order.
    for rdt, rtol in (("bfloat16", 2e-2), ("float32", 1e-3)):
        outs = {}
        # f32 at a quarter of the rays (still 512 pixel blocks): the f32
        # fine pass at larger segments exhausts HBM in this many-section
        # process
        rsub = sub if rdt == "bfloat16" else {
            k: (v[:seg // 4] if k in ("ray_o", "ray_d") else v)
            for k, v in sub.items()}
        for name, cfg in (("pertap", base),
                          ("bspg", dataclasses.replace(
                              base, bspg_specs=specs, bspg_pallas=True))):
            cfg = dataclasses.replace(cfg, compute_dtype=rdt)
            t0 = time.perf_counter()
            ret = _render_blocked_jit(bundle.render_params, bundle.modules,
                                      rsub, feats, cfg, src_rgbs,
                                      src_cams_j, CHUNK, None, None)
            outs[name] = np.asarray(jnp.asarray(
                ret["outputs_coarse"]["rgb"], jnp.float32))
            outs[name + "_fine"] = np.asarray(jnp.asarray(
                ret["outputs_fine"]["rgb"], jnp.float32))
            print(f"  bspg_render/{name}/{rdt}: "
                  f"{time.perf_counter()-t0:.1f}s ({seg} rays)", flush=True)
        err = float(np.max(np.abs(outs["pertap"] - outs["bspg"])))
        fine_err = float(np.max(np.abs(outs["pertap_fine"]
                                       - outs["bspg_fine"])))
        record(f"bspg_render_{'bf16' if rdt == 'bfloat16' else 'f32'}",
               err, 1.0, rtol,
               {"rays": int(seg), "metric": "abs RGB diff (coarse level)",
                "fine_level_max_diff_chaos_expected": fine_err})

    # ---- SPG gather in the differentiated attack step vs per-tap
    from nerfool_tpu.attack.attack import (AttackConfig, init_attack_state,
                                           make_attack_step)
    from nerfool_tpu.ops.spg import plan_attack_specs

    a_src = 4
    acfg = AttackConfig(h=H, w=W, n_rand=512, use_adam=True, adam_lr=1e-3,
                        epsilon=8.0)
    target = {
        "camera": jnp.asarray(target_cam),
        "rgb": jnp.asarray(rng.rand(H * W, 3).astype(np.float32)),
        "depth": None,
        "depth_range": jnp.asarray(depth_range),
    }
    src = {"rgbs": src_rgbs[:a_src], "cameras": src_cams_j[:a_src],
           "featmaps_clean": None}
    att_base = dataclasses.replace(base, compute_dtype="float32",
                                   bspg_specs=None)
    spg_specs = plan_attack_specs(target_cam[None], src_cams[:a_src],
                                  depth_range.reshape(-1), (H, W),
                                  feats[0].shape[1:3])
    outs = {}
    for name, cfg in (("pertap", att_base),
                      ("spg", dataclasses.replace(att_base,
                                                  spg_specs=spg_specs))):
        step = jax.jit(make_attack_step(bundle, cfg, acfg))
        state = init_attack_state(jax.random.PRNGKey(1), acfg, src["rgbs"])
        t0 = time.perf_counter()
        state, aux = step(state, target, src, jax.random.PRNGKey(2))
        outs[name] = (float(aux["loss"]), np.asarray(state["delta"],
                                                     np.float32))
        print(f"  spg_attack/{name}: {time.perf_counter()-t0:.1f}s "
              f"loss={outs[name][0]:.6f}", flush=True)
    derr = float(np.max(np.abs(outs["pertap"][1] - outs["spg"][1])))
    lerr = abs(outs["pertap"][0] - outs["spg"][0])
    # gate on the loss (rel 1e-3); the delta update (sign/Adam of a tiny
    # grad) is recorded for inspection — eps-scale agreement expected
    record("spg_attack_f32", lerr, max(abs(outs["pertap"][0]), 1e-9), 1e-3,
           {"delta_update_max_diff": derr, "loss_pertap": outs["pertap"][0],
            "loss_spg": outs["spg"][0]})

    os.makedirs(OUTDIR, exist_ok=True)
    out_path = os.path.join(
        OUTDIR, f"kernel_equality_{kind.replace(' ', '_')}.json")
    with open(out_path, "w") as f:
        json.dump({"device_kind": kind, "native_mosaic": on_tpu,
                   "rows": ROWS}, f, indent=1)
    print(f"wrote {out_path}", flush=True)
    bad = [k for k, v in ROWS.items() if not v["passed"]]
    print(f"VERDICT: {'ALL PASS' if not bad else 'FAIL: ' + ','.join(bad)}",
          flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
