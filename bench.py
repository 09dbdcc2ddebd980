"""Benchmark: clean-render throughput + attack-step throughput on the flagship
IBRNet configuration (LLFF eval settings: 10 source views, N_samples=64,
N_importance=64, factor-4 LLFF resolution 756x1008 — configs/ibrnet/eval_llff.txt).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline anchors against a single-GPU reference estimate for the same
pipeline (IBRNet-class renderers measure ~25k rays/s on a V100-class GPU at
these settings; the reference repo publishes no numbers — BASELINE.md).
Secondary numbers go to stderr.
"""
import json
import os
import sys
import time

import numpy as np

REF_RAYS_PER_SEC = 25_000.0  # single-GPU reference anchor (see module docstring)

BACKBONE = os.environ.get("BENCH_BACKBONE", "ibrnet")
H = int(os.environ.get("BENCH_H", 756))
W = int(os.environ.get("BENCH_W", 1008))
N_SRC = int(os.environ.get("BENCH_SRC", 10))
N_SAMPLES = int(os.environ.get("BENCH_NSAMPLES", 64))
N_IMPORTANCE = int(os.environ.get("BENCH_NIMPORTANCE", 64))
CHUNK = int(os.environ.get("BENCH_CHUNK", 4096))
N_RAND = int(os.environ.get("BENCH_NRAND", 512))
# the reference's headline attack command runs --num_source_views 4
# (/root/reference/README.md:64,70) — fewer views than the 10-view render
# config; the attack benchmark measures that flagship command's workload
ATTACK_SRC = int(os.environ.get("BENCH_ATTACK_SRC", 4))
ATTACK_ITERS = int(os.environ.get("BENCH_ATTACK_ITERS", 10))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")  # rendering path
ATTACK_DTYPE = os.environ.get("BENCH_ATTACK_DTYPE", "float32")  # parity default
# ResUNet convs: bfloat16 is the benchmarked production fast path since
# round 5 — it cleared the 5-seed attack-efficacy gate
# (scripts/probe_bf16_efficacy.py, battery_results/bf16_gate.json:
# final-loss ratios 0.97-1.03 vs f32) and buys ~-10% attack ms/iter
# (BENCH_NOTES r4: 182.6 vs 202.4). The CLI/engine default stays float32
# for reference-parity protocol runs (--feature_dtype).
FEATURE_DTYPE = os.environ.get("BENCH_FEATURE_DTYPE", "bfloat16")
REMAT = os.environ.get("BENCH_REMAT", "1") == "1"  # feature-net remat in bwd
REUSE_TAPS = os.environ.get("BENCH_REUSE_TAPS", "1") == "1"  # fine-pass tap reuse
SCENE = os.environ.get("BENCH_SCENE", "llff")  # llff (nearest-view rig) | arc
USE_BSPG = os.environ.get("BENCH_BSPG", "1") == "1"  # block segment-patch gather
BSPG_PALLAS = os.environ.get("BENCH_BSPG_PALLAS", "1") == "1"  # Pallas selection
BSPG_BLOCK = int(os.environ.get("BENCH_BSPG_BLOCK", "8"))  # pixel block edge


def log(*a):
    print(f"[t={time.perf_counter()-T_START:5.0f}s]", *a,
          file=sys.stderr, flush=True)


def build_scene():
    """Synthetic flagship-scale camera rig: (cams [N_SRC+1, 34], depth_range).

    Default geometry mirrors the reference's actual LLFF eval workload
    (llff_test picks the 10 NEAREST views of a forward-facing rig -> small
    baselines, llff_test.py:137-142); the round-1 45-degree arc
    (BENCH_SCENE=arc) had several-fold longer epipolar segments than any real
    LLFF source set and is kept for comparison only.
    """
    from nerfool_tpu.utils.cameras import make_camera_vector

    if SCENE == "arc":
        cams = []
        for i in range(N_SRC + 1):
            theta = 0.5 * np.pi * i / (N_SRC + 1)
            eye = np.array([4 * np.sin(theta), 1.4, -4 * np.cos(theta)],
                           dtype=np.float32)
            fwd = -eye / np.linalg.norm(eye)
            up = np.array([0.0, -1.0, 0.0])
            right = np.cross(up, fwd); right /= np.linalg.norm(right)
            down = np.cross(fwd, right)
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
            k = np.eye(4, dtype=np.float32)
            k[0, 0] = k[1, 1] = 0.8 * W
            k[0, 2], k[1, 2] = W / 2, H / 2
            cams.append(make_camera_vector(H, W, k, c2w))
        cams = np.stack(cams).astype(np.float32)
        depth_range = np.array([[2.0, 6.0]], dtype=np.float32)
    else:  # llff-like forward-facing rig (fern-style depth range)
        rigrs = np.random.RandomState(7)
        cams = []
        for _ in range(N_SRC + 1):
            eye = np.array([rigrs.uniform(-0.25, 0.25),
                            rigrs.uniform(-0.12, 0.12),
                            rigrs.uniform(-0.08, 0.08)])
            tgt = np.array([rigrs.uniform(-0.2, 0.2),
                            rigrs.uniform(-0.2, 0.2), 3.5])
            fwd = tgt - eye; fwd = fwd / np.linalg.norm(fwd)
            up = np.array([0.0, -1.0, 0.0])
            right = np.cross(up, fwd); right /= np.linalg.norm(right)
            down = np.cross(fwd, right)
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
            k = np.eye(4, dtype=np.float32)
            k[0, 0] = k[1, 1] = 0.8 * W
            k[0, 2], k[1, 2] = W / 2, H / 2
            cams.append(make_camera_vector(H, W, k.astype(np.float32),
                                           c2w.astype(np.float32)))
        cams = np.stack(cams).astype(np.float32)
        depth_range = np.array([[1.08, 7.6]], dtype=np.float32)
    return cams, depth_range


T_START = time.perf_counter()
# Driver budget guard (VERDICT r4 item 1): BENCH_r04 hit the driver's
# timeout (rc=124) before the GNT secondary ever ran. The budget below is
# a conservative estimate of the driver's allowance; sections are ordered
# by importance (IBRNet render -> GNT secondary -> attack -> scan A/B) and
# the later ones are skipped when the remaining budget is short. The
# persistent compilation cache (jax_compilation_cache_dir below, verified
# working across processes on the axon relay) makes warm-cache runs fit
# comfortably.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "840"))


def t_rem() -> float:
    return BUDGET_S - (time.perf_counter() - T_START)


def cached_plan_render_specs(target_cams, src_cams, depth_range, rgb_hw,
                             feat_hw, **kw):
    """plan_render_specs with a disk cache: the host-side planner is pure in
    its inputs but costs ~100s at flagship scale — too much of the driver
    budget to redo every run on an unchanged synthetic rig."""
    import hashlib
    import pickle

    from nerfool_tpu.ops.bspg import plan_render_specs

    key = hashlib.sha256(repr((
        np.asarray(target_cams).tolist(), np.asarray(src_cams).tolist(),
        np.asarray(depth_range).tolist(), tuple(rgb_hw), tuple(feat_hw),
        sorted(kw.items()))).encode()).hexdigest()[:20]
    cdir = os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache")
    path = os.path.join(cdir, f"bspgplan_{key}.pkl")
    if os.path.isfile(path):
        try:
            with open(path, "rb") as f:
                return pickle.load(f)
        except Exception:
            pass
    specs = plan_render_specs(target_cams, src_cams, depth_range, rgb_hw,
                              feat_hw, **kw)
    try:
        os.makedirs(cdir, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(specs, f)
    except Exception:
        pass
    return specs


def _probe_backend(timeout_s: int) -> bool:
    """Device init in a SUBPROCESS with a timeout: a down TPU relay makes
    jax.devices() hang indefinitely, which would hang the whole benchmark
    (and its driver). Probing out-of-process keeps this process clean."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "from nerfool_tpu.utils.platform import apply_platform_env; "
             "apply_platform_env(); import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    probe_s = int(os.environ.get("BENCH_PROBE_TIMEOUT", "300"))
    if probe_s > 0 and not _probe_backend(probe_s):
        log(f"FATAL: jax backend init did not complete within {probe_s}s "
            "(TPU relay down?) — aborting instead of hanging")
        sys.exit(2)

    from nerfool_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from nerfool_tpu.attack.attack import (
        AttackConfig, init_attack_state, make_attack_step,
    )
    from nerfool_tpu.models.bundle import create_model
    from nerfool_tpu.render.render_rays import RenderConfig
    from nerfool_tpu.utils.cameras import get_rays

    log(f"devices: {jax.devices()}")  # t shows probe+init cost
    rng = np.random.RandomState(0)
    cams, depth_range = build_scene()
    target_cam, src_cams = cams[0], cams[1:]

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    from nerfool_tpu.utils.platform import host_key

    log("scene built; creating model")
    bundle = create_model(backbone=BACKBONE, rng_key=host_key(0),
                          trans_depth=8, single_net=BACKBONE == "gnt",
                          gnt_sample_fold=int(os.environ.get("BENCH_GNT_FOLD", "1")),
                          gnt_ray_fold=int(os.environ.get("BENCH_GNT_RAYFOLD", "1")),
                          ibrnet_sample_fold=int(os.environ.get("BENCH_IBR_FOLD", "1")),
                          feature_dtype=FEATURE_DTYPE, remat_features=REMAT)
    cfg = RenderConfig(
        # both flagship configs sample in inverse depth (inv_uniform=True in
        # configs/ibrnet/eval_llff.txt AND configs/gnt/gnt_full.txt)
        n_samples=N_SAMPLES, n_importance=N_IMPORTANCE, det=True,
        inv_uniform=True, backbone=BACKBONE,
        single_net=BACKBONE == "gnt", ret_alpha=BACKBONE == "gnt",
        stop_camera_grad=BACKBONE == "ibrnet", compute_dtype=DTYPE,
        reuse_fine_taps=REUSE_TAPS,
        # default OFF since battery5: the fused ra kernel loses -19% e2e
        # (10,407 -> 8,420 rays/s whole-frame interleaved A/B)
        gnt_fused_attn=(BACKBONE == "gnt"
                        and os.environ.get("BENCH_GNT_FUSED", "0") == "1"),
        # whole-chain kernel: default ON (battery5: +3% e2e, the only fused
        # variant that wins; one-time ~90s Mosaic compile, cached)
        gnt_fused_chain=(BACKBONE == "gnt"
                         and os.environ.get("BENCH_GNT_CHAIN", "1") == "1"),
        gnt_fused_vt=(BACKBONE == "gnt"
                      and os.environ.get("BENCH_GNT_FUSED_VT", "0") == "1"),
        gnt_fused_vt_lp=(BACKBONE == "gnt"
                         and os.environ.get("NERFOOL_VT_LANEPACK", "0") == "1"),
    )

    log("model created; materializing source views on device")
    # random source views generated ON the device: a host rand of this size
    # (91 MB at flagship scale) would cross the relay tunnel; the content
    # is measurement-irrelevant
    src_rgbs_j = jax.jit(
        lambda k: jax.random.uniform(k, (N_SRC, H, W, 3), jnp.float32)
    )(jax.random.PRNGKey(42))
    src_rgbs_j.block_until_ready()
    src_cams_j = jnp.asarray(src_cams)
    log("source views ready")

    # ---- clean render benchmark
    t0 = time.perf_counter()
    extract = jax.jit(lambda p, x: bundle.feature_net.apply({"params": p}, x))
    feats = extract(bundle.params["feature_net"], src_rgbs_j)
    _ = float(jnp.sum(feats[0]))
    log(f"featmap extraction (compile+run): {time.perf_counter()-t0:.2f}s, "
        f"shape {feats[0].shape}")

    intr = target_cam[2:18].reshape(4, 4)
    c2w = target_cam[18:34].reshape(4, 4)
    rays_o, rays_d = get_rays(H, W, jnp.asarray(intr), jnp.asarray(c2w))
    n_rays = rays_o.shape[0]

    if USE_BSPG:
        import dataclasses as _dc

        specs = cached_plan_render_specs(
            target_cam[None], src_cams, depth_range.reshape(-1),
            (H, W), feats[0].shape[1:3], block=(BSPG_BLOCK, BSPG_BLOCK),
            n_samples=N_SAMPLES, n_importance=N_IMPORTANCE,
            inv_uniform=cfg.inv_uniform,
        )
        if specs is None:
            log("BSPG planner found no admissible patch size; per-tap path")
        else:
            cfg = _dc.replace(cfg, bspg_specs=specs, bspg_pallas=BSPG_PALLAS)
            log(f"BSPG: feat p={specs[0].p} groups={specs[0].groups} "
                f"kwin={specs[0].kwin} | rgb p={specs[1].p} "
                f"groups={specs[1].groups} kwin={specs[1].kwin}")
            # block-major ray order (render_image does this internally; the
            # bench drives _render_blocked_jit directly)
            bh, bw = specs[0].block
            hp, wp = -(-H // bh) * bh, -(-W // bw) * bw
            yy, xx = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
            sidx = np.minimum(yy, H - 1) * W + np.minimum(xx, W - 1)
            perm = (sidx.reshape(hp // bh, bh, wp // bw, bw)
                    .transpose(0, 2, 1, 3).reshape(-1))
            rays_o = rays_o[jnp.asarray(perm)]
            rays_d = rays_d[jnp.asarray(perm)]
            n_rays = rays_o.shape[0]

    # BENCH_RENDER_RAYS>0 caps the measured ray count (block-major prefix —
    # a representative sub-frame): the GNT secondary uses this to fit the
    # driver budget; rays/s is per-ray so the metric stays comparable
    rays_cap = int(os.environ.get("BENCH_RENDER_RAYS", "0"))
    if rays_cap > 0 and rays_cap < n_rays:
        rays_cap = max(CHUNK, rays_cap // CHUNK * CHUNK)
        rays_o, rays_d = rays_o[:rays_cap], rays_d[:rays_cap]
        n_rays = rays_cap
        log(f"render ray cap: {n_rays} rays")
    batch = {
        "ray_o": rays_o, "ray_d": rays_d,
        "depth_range": jnp.asarray(depth_range),
        "camera": jnp.asarray(target_cam[None]),
    }

    from nerfool_tpu.render.render_image import _render_blocked_jit

    max_seg = int(os.environ.get("BENCH_MAX_SEG", 131072))

    def render(p, b, sr, sc, f):
        # pad once OUTSIDE the per-segment executions (an in-graph pad+slice
        # showed up as ~6% of render time in the op profile)
        n = b["ray_o"].shape[0]
        seg = max(CHUNK, (max_seg // CHUNK) * CHUNK)
        ro = jnp.pad(b["ray_o"], ((0, (-n) % seg), (0, 0)), mode="edge")
        rd = jnp.pad(b["ray_d"], ((0, (-n) % seg), (0, 0)), mode="edge")
        outs = []
        for i in range(0, ro.shape[0], seg):
            sub = dict(b)
            sub["ray_o"] = ro[i:i + seg]
            sub["ray_d"] = rd[i:i + seg]
            ret = _render_blocked_jit(
                p, bundle.modules, sub, f, cfg, sr, sc, CHUNK, None, None
            )
            lvl = "outputs_fine" if ret["outputs_fine"] is not None else "outputs_coarse"
            outs.append(ret[lvl]["rgb"])
        return jnp.concatenate(outs, axis=0)[:n]
    def force(x):
        # on the axon relay platform block_until_ready does not wait for remote
        # execution; fetching a device-reduced scalar does
        return float(jnp.sum(x))

    t0 = time.perf_counter()
    out = render(bundle.render_params, batch, src_rgbs_j, src_cams_j, feats)
    force(out)
    compile_s = time.perf_counter() - t0
    log(f"render compile+first run: {compile_s:.2f}s")

    times = []
    for _ in range(int(os.environ.get("BENCH_REPEATS", "3"))):
        t0 = time.perf_counter()
        feats2 = extract(bundle.params["feature_net"], src_rgbs_j)
        out = render(bundle.render_params, batch, src_rgbs_j, src_cams_j, feats2)
        force(out)
        times.append(time.perf_counter() - t0)
    render_s = min(times)
    rays_per_sec = n_rays / render_s
    log(f"clean render: {n_rays} rays in {render_s:.3f}s -> {rays_per_sec:,.0f} rays/s")

    # ---- roofline / MFU accounting (VERDICT r3 item 2): place each phase
    # against the chip's bf16 matmul peak and HBM bandwidth, and the gather
    # demand against the measured ~47M rows/s issue-rate wall
    from nerfool_tpu.utils.roofline import (
        chip_specs, gather_report, phase_report, program_costs,
    )

    roofline = {"chip": chip_specs()[0]}
    try:
        # feature-net phase: conv FLOPs over the N_SRC source views
        t0 = time.perf_counter()
        for _ in range(3):
            force(extract(bundle.params["feature_net"], src_rgbs_j)[0])
        feat_s = (time.perf_counter() - t0) / 3
        f_fl, f_by = program_costs(
            extract.lower(bundle.params["feature_net"], src_rgbs_j))
        log("roofline: featmap costs done")
        roofline["feature_net"] = dict(
            phase_report(feat_s, f_fl, f_by),
            ms=round(feat_s * 1e3, 1),
            note=f"f32 convs reach at most ~1/3 of bf16 peak"
            if FEATURE_DTYPE == "float32" else None,
        )
        # render phase (aggregation + gathers), net of feature extraction
        rend_s = max(render_s - feat_s, 1e-9)
        seg = max(CHUNK, (max_seg // CHUNK) * CHUNK)
        n_pad = -(-n_rays // seg) * seg
        sub = dict(batch)
        sub["ray_o"] = batch["ray_o"][:seg]
        sub["ray_d"] = batch["ray_d"][:seg]
        from nerfool_tpu.render.render_image import _blocked_fn
        fn = _blocked_fn(tuple(sorted(bundle.modules.items(),
                                      key=lambda kv: kv[0])), cfg, CHUNK, None)
        r_fl, r_by = program_costs(fn.lower(
            bundle.render_params, sub, feats, src_rgbs_j, src_cams_j,
            None, None))
        log("roofline: render costs done")
        roofline["render"] = dict(
            phase_report(rend_s, r_fl, r_by, executions=n_pad // seg),
            ms=round(rend_s * 1e3, 1),
        )
        s_total = N_SAMPLES + (N_SAMPLES + N_IMPORTANCE if N_IMPORTANCE else 0)
        roofline["gather"] = gather_report(n_rays, N_SRC, s_total, rend_s)
        if BACKBONE == "gnt":
            # analytic HBM floor of the aggregation chain: how much of the
            # render time is explained by unavoidable operand traffic
            from nerfool_tpu.utils.roofline import gnt_aggregation_traffic

            agg = gnt_aggregation_traffic(N_SRC, n_rays, N_SAMPLES,
                                          fused_ra=cfg.gnt_fused_attn,
                                          fused_vt=cfg.gnt_fused_vt,
                                          fused_chain=cfg.gnt_fused_chain)
            if agg["floor_s"]:
                agg["pct_of_floor"] = round(100.0 * agg["floor_s"] / rend_s, 1)
            roofline["gnt_aggregation"] = agg
        log("roofline: " + json.dumps(roofline))
    except Exception as e:  # pragma: no cover - accounting must never kill bench
        log(f"roofline accounting failed: {type(e).__name__}: {e}")

    headline = {
        "metric": "clean_render_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REF_RAYS_PER_SEC, 3),
        "backbone": BACKBONE,
        "roofline": roofline,
    }
    # emit the headline metric NOW: a relay flake during the attack sections
    # below must not lose the already-measured render number (the driver
    # parses this JSON line from stdout)
    print(json.dumps(headline), flush=True)

    if os.environ.get("BENCH_RENDER_ONLY", "0") == "1":
        return  # sweep mode: skip the attack sections (and their compiles)

    # ---- secondary backbone (GNT-full render, fused attention on, with its
    # roofline row) IMMEDIATELY after the IBRNet headline and BEFORE the
    # attack sections (VERDICT r4 item 1: BENCH_r01-r04 never captured a GNT
    # number because this ran last and the driver budget expired first).
    # Subprocess = own device-memory lifetime; merges into our headline.
    if (os.environ.get("BENCH_SECONDARY", "gnt") == "gnt"
            and BACKBONE == "ibrnet" and t_rem() > 120):
        import subprocess
        env = dict(os.environ, BENCH_BACKBONE="gnt", BENCH_NSAMPLES="192",
                   BENCH_NIMPORTANCE="0", BENCH_RENDER_ONLY="1",
                   BENCH_SECONDARY="0", BENCH_PROBE_TIMEOUT="0",
                   # the subprocess self-limits via RENDER_ONLY; give it the
                   # whole remaining window rather than a second guard
                   BENCH_BUDGET_S="100000",
                   # sub-frame + fewer repeats: fits the driver budget at
                   # GNT-full throughput (~10-15k rays/s)
                   BENCH_RENDER_RAYS=os.environ.get(
                       "BENCH_GNT_RAYS", "262144"),
                   BENCH_REPEATS=os.environ.get("BENCH_GNT_REPEATS", "2"))
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True,
                timeout=max(120, min(1800, t_rem() - 45)),
                cwd=os.path.dirname(os.path.abspath(__file__)))
            log(r.stderr[-2000:])
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")][-1]
            headline["secondary_gnt"] = json.loads(line)
        except Exception as e:
            log(f"secondary gnt bench failed: {type(e).__name__}: {e}")
            headline["secondary_gnt"] = None
        print(json.dumps(headline), flush=True)
    elif BACKBONE == "ibrnet":
        log(f"secondary gnt bench skipped (budget: {t_rem():.0f}s left)")

    if t_rem() < 75:
        log(f"budget: {t_rem():.0f}s left — skipping attack sections")
        return

    # ---- attack step benchmark (f32 render config: the parity path)
    import dataclasses
    # f32 is the parity default; the BSPG selection kernel is forward-only
    # (no VJP) and needs block-major rays, so the attack's differentiated
    # render keeps the per-tap XLA gather path
    attack_render_cfg = dataclasses.replace(
        cfg, compute_dtype=ATTACK_DTYPE, bspg_specs=None,
        # BENCH_GNT_FUSED_ATTACK=1: the ray-attention kernel's custom VJP
        # (fused_ray_attention_ad) in the differentiated step
        gnt_fused_attn=(BACKBONE == "gnt" and os.environ.get(
            "BENCH_GNT_FUSED_ATTACK", "0") == "1"),
        gnt_fused_vt=False)
    if os.environ.get("BENCH_ATTACK_SPG", "0") == "1":
        # per-RAY segment-patch gather for the random-pixel attack batches
        from nerfool_tpu.ops.spg import plan_attack_specs

        spg_specs = plan_attack_specs(
            target_cam[None], src_cams[:ATTACK_SRC],
            depth_range.reshape(-1), (H, W), feats[0].shape[1:3],
        )
        attack_render_cfg = dataclasses.replace(
            attack_render_cfg, spg_specs=spg_specs)
        log(f"attack SPG: feat p={spg_specs[0].p} groups={spg_specs[0].groups}"
            f" | rgb p={spg_specs[1].p} groups={spg_specs[1].groups}")
    acfg = AttackConfig(h=H, w=W, n_rand=N_RAND, use_adam=True, adam_lr=1e-3,
                        epsilon=8.0)
    target = {
        "camera": jnp.asarray(target_cam),
        "rgb": jnp.asarray(rng.rand(H * W, 3).astype(np.float32)),
        "depth": None,
        "depth_range": jnp.asarray(depth_range),
    }
    a_rgbs, a_cams = src_rgbs_j[:ATTACK_SRC], src_cams_j[:ATTACK_SRC]
    log(f"attack workload: {ATTACK_SRC} source views (reference README.md:64), "
        f"n_rand={N_RAND}")
    src = {"rgbs": a_rgbs, "cameras": a_cams, "featmaps_clean": None}
    # donate the carried attack state (engine.py does): in-place buffer
    # reuse instead of a fresh delta+moments allocation per step
    donate = (0,) if os.environ.get("BENCH_DONATE", "1") == "1" else ()
    step = jax.jit(make_attack_step(bundle, attack_render_cfg, acfg),
                   donate_argnums=donate)
    state = init_attack_state(jax.random.PRNGKey(1), acfg, a_rgbs)
    t0 = time.perf_counter()
    state, aux = step(state, target, src, jax.random.PRNGKey(2))
    log(f"attack step compile+first run: {time.perf_counter()-t0:.2f}s "
        f"loss={float(aux['loss']):.4f}")
    # median of 3 timed batches: relay wall clocks swing +-15-20% run to run
    batch_times = []
    keys = jax.random.split(jax.random.PRNGKey(3), 3 * ATTACK_ITERS)
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(ATTACK_ITERS):
            state, aux = step(state, target, src,
                              keys[rep * ATTACK_ITERS + i])
        force(state["delta"])
        batch_times.append((time.perf_counter() - t0) / ATTACK_ITERS)
    attack_s = sorted(batch_times)[1]
    attack_ips = 1.0 / attack_s
    log(f"attack (per-iter dispatch, median of 3x{ATTACK_ITERS}): "
        f"{attack_s*1e3:.1f} ms/iter -> "
        f"{attack_ips:.2f} iters/s (1000-iter attack in {1000*attack_s:.0f}s)")

    # attack-step roofline (fwd+bwd through feature net + renderer)
    try:
        a_fl, a_by = program_costs(step.lower(
            init_attack_state(jax.random.PRNGKey(1), acfg, a_rgbs),
            target, src, jax.random.PRNGKey(2)))
        roofline["attack_step"] = dict(
            phase_report(attack_s, a_fl, a_by),
            ms=round(attack_s * 1e3, 1),
            note="f32 parity path: at most ~1/3 of bf16 peak"
            if ATTACK_DTYPE == "float32" else None,
        )
        log("roofline/attack: " + json.dumps(roofline["attack_step"]))
    except Exception as e:
        log(f"attack roofline accounting failed: {type(e).__name__}: {e}")

    headline["attack_ms_per_iter"] = round(attack_s * 1e3, 1)
    # merged line: drivers taking the last JSON line get the attack +
    # secondary picture even if the scan A/B below is skipped/killed
    print(json.dumps(headline), flush=True)

    # ---- grouped scan A/B: the engine's production path (one device
    # execution per scan_group iterations; removes per-iter dispatch idle).
    # Known slower on the single-chip relay (BENCH_NOTES r3/r4) — lowest
    # priority, so it is the section the budget guard sacrifices first.
    if t_rem() < 75:
        log(f"budget: {t_rem():.0f}s left — skipping attack scan A/B")
        return
    from nerfool_tpu.attack.attack import run_attack_scan

    group = int(os.environ.get("BENCH_SCAN_GROUP", 10))
    step_raw = make_attack_step(bundle, attack_render_cfg, acfg)
    scan = jax.jit(lambda st, t, s, k: run_attack_scan(step_raw, st, t, s, k, group),
                   donate_argnums=donate)
    state = init_attack_state(jax.random.PRNGKey(1), acfg, a_rgbs)
    t0 = time.perf_counter()
    state, aux = scan(state, target, src, jax.random.PRNGKey(5))
    force(state["delta"])
    log(f"attack scan compile+first group: {time.perf_counter()-t0:.2f}s")
    # median of 3 single-group timings (the round-2 battery caught a 6x
    # outlier on a single-sample scan measurement during a degraded relay
    # window; the dispatch path above was already a median)
    gkeys = jax.random.split(jax.random.PRNGKey(6), 3)
    group_times = []
    for i in range(3):
        t0 = time.perf_counter()
        state, aux = scan(state, target, src, gkeys[i])
        force(state["delta"])
        group_times.append((time.perf_counter() - t0) / group)
    scan_s = sorted(group_times)[1]
    log(f"attack (scan group={group}): {scan_s*1e3:.1f} ms/iter -> "
        f"{1.0/scan_s:.2f} iters/s (1000-iter attack in {1000*scan_s:.0f}s)")

    headline["attack_scan_ms_per_iter"] = round(scan_s * 1e3, 1)

    # final merged line LAST on stdout: drivers taking the last JSON line get
    # the full roofline + secondary picture; ones taking the first still got
    # the identical headline metric fields
    print(json.dumps(headline), flush=True)

    if os.environ.get("BENCH_BREAKDOWN", "0") == "1":
        # isolate the attack step's cost components (all timings best-of-3)
        def timeit(fn, *a):
            fn(*a)  # compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(*a)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        feat_p = bundle.params["feature_net"]
        fwd = jax.jit(lambda p, x: jnp.sum(
            bundle.feature_net.apply({"params": p}, x)[0]))
        log(f"breakdown below: feature net over the attack's {ATTACK_SRC} views")
        log(f"breakdown/feature fwd: "
            f"{timeit(lambda *_: force(fwd(feat_p, a_rgbs)))*1e3:.0f} ms")
        fwdbwd = jax.jit(jax.grad(
            lambda x: jnp.sum(jax.checkpoint(
                lambda xx: bundle.feature_net.apply({"params": feat_p}, xx)[0]
            )(x))))
        log(f"breakdown/feature fwd+bwd (remat): "
            f"{timeit(lambda *_: force(fwdbwd(a_rgbs)))*1e3:.0f} ms")
        fwdbwd_nr = jax.jit(jax.grad(
            lambda x: jnp.sum(
                bundle.feature_net.apply({"params": feat_p}, x)[0])))
        try:
            log(f"breakdown/feature fwd+bwd (no remat): "
                f"{timeit(lambda *_: force(fwdbwd_nr(a_rgbs)))*1e3:.0f} ms")
        except Exception as e:  # OOM at full scale is informative, not fatal
            log(f"breakdown/feature fwd+bwd (no remat): failed ({type(e).__name__})")

        # render N_RAND rays fwd+bwd w.r.t. featmaps (attack render share)
        feats_f32 = jax.jit(lambda p, x: bundle.feature_net.apply(
            {"params": p}, x))(bundle.params["feature_net"], a_rgbs)
        sel = jnp.arange(N_RAND) * (n_rays // N_RAND)
        def render_loss(f):
            b = {"ray_o": batch["ray_o"][sel], "ray_d": batch["ray_d"][sel],
                 "depth_range": batch["depth_range"], "camera": batch["camera"]}
            from nerfool_tpu.render.render_rays import render_rays
            ret = render_rays(bundle.render_params, bundle.modules, b, f,
                              attack_render_cfg, src_rgbs=a_rgbs,
                              src_cameras=a_cams, key=None)
            lvl = ret["outputs_fine"] or ret["outputs_coarse"]
            return jnp.mean(lvl["rgb"] ** 2)
        rgrad = jax.jit(jax.grad(render_loss))
        log(f"breakdown/render {N_RAND} rays fwd+bwd (vs featmaps): "
            f"{timeit(lambda *_: force(rgrad(feats_f32)[0]))*1e3:.0f} ms")


if __name__ == "__main__":
    main()
