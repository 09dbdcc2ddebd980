"""End-to-end engine integration on the synthetic dataset: view-specific and
universal attacks through the full evaluate() loop (attack -> render ->
metrics -> artifacts), exercising the real CLI parser."""
import os

import numpy as np
import pytest

from nerfool_tpu.config import config_parser

pytestmark = pytest.mark.slow  # end-to-end evaluator drives (~9 min total)


def _engine_args(tmp_path, **overrides):
    argv = [
        "--eval_dataset", "synthetic",
        "--backbone", "ibrnet",
        "--N_samples", "12", "--N_importance", "0",
        "--N_rand", "32", "--chunk_size", "256",
        "--adv_iters", "3", "--epsilon", "8", "--adv_lr", "2",
        "--num_source_views", "4",
        "--workers", "0",
        "--rootdir", str(tmp_path),
    ]
    for k, v in overrides.items():
        if v is True:
            argv.append(f"--{k}")
        else:
            argv.extend([f"--{k}", str(v)])
    return config_parser().parse_args(argv)


@pytest.fixture(scope="module")
def small_kwargs():
    return {"n_views": 8, "h": 24, "w": 32}


def test_config_file_merging(tmp_path):
    cfg = tmp_path / "cfg.txt"
    cfg.write_text("N_samples = 48\nuse_adam = True\neval_scenes = [fern]\n")
    args = config_parser().parse_args(["--config", str(cfg), "--N_samples", "24"])
    assert args.N_samples == 24  # CLI wins
    assert args.use_adam is True
    assert args.eval_scenes == ["fern"]
    args2 = config_parser().parse_args(["--config", str(cfg)])
    assert args2.N_samples == 48


def test_all_shipped_configs_parse():
    """Every canonical config under configs/ must parse (incl. bool-typed and
    store_true flags written configargparse-style as `flag = True`)."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    files = sorted(glob.glob(os.path.join(root, "*", "*.txt")))
    assert len(files) >= 11
    for f in files:
        args = config_parser().parse_args(["--config", f])
        assert args.backbone in ("ibrnet", "gnt")
        assert isinstance(args.single_net, bool)
    # file value for a non-store_true bool flag
    args = config_parser().parse_args(
        ["--config", os.path.join(root, "gnt", "gnt_full.txt"), "--single_net", "False"]
    )
    assert args.single_net is False


def test_view_specific_end_to_end(tmp_path, small_kwargs):
    from nerfool_tpu.attack.engine import AdvEvaluator

    args = _engine_args(tmp_path, view_specific=True)
    ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
    out = str(tmp_path / "out_vs")
    results = ev.evaluate(out_dir=out, verbose=False, max_views=1)
    scene = args.eval_dataset
    assert results[scene]["coarse_mean_psnr"] > 0
    files = os.listdir(out)
    assert any("pred_coarse" in f for f in files)
    assert any("gt_rgb" in f for f in files)
    assert any("err_map" in f for f in files)
    assert any(f.startswith("psnr_") for f in files)


def test_universal_attack_end_to_end(tmp_path, small_kwargs):
    from nerfool_tpu.attack.engine import AdvEvaluator

    args = _engine_args(tmp_path, use_adam=True, adam_lr="1e-2",
                        use_pseudo_gt=True)
    args.view_specific = False
    ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
    results = ev.evaluate(out_dir=None, save_images=False, verbose=False, max_views=1)
    assert np.isfinite(results[args.eval_dataset]["coarse_mean_psnr"])


def test_attack_moves_render_more_than_random_delta(tmp_path, small_kwargs):
    """The optimized delta must push the render further from the clean render
    than a random delta with the same L-inf budget (random weights make
    absolute PSNR meaningless, so we test the optimization itself)."""
    import jax
    import jax.numpy as jnp

    from nerfool_tpu.attack.engine import AdvEvaluator
    from nerfool_tpu.attack.perturb import init_delta

    args = _engine_args(tmp_path, view_specific=True, adv_iters=12,
                        use_pseudo_gt=True)
    ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
    data = ev.test_dataset[0]

    src0 = ev._make_src(data)
    zero = jnp.zeros_like(src0["rgbs"])
    img_clean = np.asarray(
        ev.render_view(data, zero, src0, src0["cameras"])["outputs_coarse"]["rgb"]
    )

    d_adv, src, cams = ev.attack_view_specific(data)
    img_adv = np.asarray(
        ev.render_view(data, d_adv, src, cams)["outputs_coarse"]["rgb"]
    )
    d_rand = init_delta(jax.random.PRNGKey(9), src0["rgbs"], 8.0 / 255)
    img_rand = np.asarray(
        ev.render_view(data, d_rand, src0, src0["cameras"])["outputs_coarse"]["rgb"]
    )
    dev_adv = float(np.mean((img_adv - img_clean) ** 2))
    dev_rand = float(np.mean((img_rand - img_clean) ** 2))
    assert dev_adv > dev_rand, (dev_adv, dev_rand)


def test_transfer_attack_reuses_view0_delta(tmp_path, small_kwargs):
    """--use_trans_attack optimizes delta on view 0 ONLY and reapplies it to
    every later view's own source set (/root/reference/eval/ibrnet/
    eval_adv.py:762: optimize iff `not use_trans_attack or i == 0`): the
    view-specific attack must run exactly once over 2 views, view 1 must be
    rendered with view 0's delta on view 1's sources, and the transferred
    delta must still move view 1's render away from its clean render."""
    import jax.numpy as jnp

    from nerfool_tpu.attack.engine import AdvEvaluator

    args = _engine_args(tmp_path, view_specific=True, use_trans_attack=True,
                        adv_iters=12, use_pseudo_gt=True)
    ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)

    calls = []
    orig_attack = AdvEvaluator.attack_view_specific
    rendered = []  # (delta, src) pairs reaching render_view, per view
    orig_render = AdvEvaluator.render_view

    def spy_attack(self, data, verbose=False):
        calls.append(1)
        return orig_attack(self, data, verbose=verbose)

    def spy_render(self, data, delta, src, src_cameras):
        rendered.append((np.asarray(delta), np.asarray(src["rgbs"])))
        return orig_render(self, data, delta, src, src_cameras)

    ev.attack_view_specific = spy_attack.__get__(ev)
    ev.render_view = spy_render.__get__(ev)
    results = ev.evaluate(out_dir=None, save_images=False, verbose=False,
                          max_views=2)
    assert len(calls) == 1, "view 1 must skip optimization"
    assert len(rendered) == 2
    d0, s0 = rendered[0]
    d1, s1 = rendered[1]
    np.testing.assert_array_equal(d1, d0)  # view 0's delta, verbatim
    assert np.max(np.abs(s1 - s0)) > 1e-6  # ...on view 1's OWN sources
    assert np.max(np.abs(d0)) > 0

    # the transferred delta still perturbs view 1's render vs clean
    data1 = ev.test_dataset[1]
    src1 = ev._make_src(data1)
    clean = np.asarray(orig_render(
        ev, data1, jnp.zeros_like(src1["rgbs"]), src1, src1["cameras"]
    )["outputs_coarse"]["rgb"])
    adv = np.asarray(orig_render(
        ev, data1, jnp.asarray(d1), src1, src1["cameras"]
    )["outputs_coarse"]["rgb"])
    assert float(np.mean((adv - clean) ** 2)) > 0

    scene = args.eval_dataset
    rows = [v for k, v in results[scene].items() if isinstance(v, dict)]
    assert len(rows) == 2 and all(np.isfinite(r["coarse_psnr"]) for r in rows)


def test_hybrid_render_routes_clean_features(tmp_path, small_kwargs):
    """--use_clean_color/--use_clean_density must route the CLEAN featmaps
    into render_view: with both flags on, a perturbed-source render equals
    the zero-delta render exactly (color and density both come from the
    clean branch, /root/reference/ibrnet/render_ray.py:311-322); with only
    one flag on it matches neither branch."""
    import jax
    import jax.numpy as jnp

    from nerfool_tpu.attack.engine import AdvEvaluator
    from nerfool_tpu.attack.perturb import init_delta

    renders = {}
    for flags in ((), ("use_clean_color",), ("use_clean_color", "use_clean_density")):
        args = _engine_args(tmp_path, view_specific=True,
                            **{f: True for f in flags})
        ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
        data = ev.test_dataset[0]
        src = ev._make_src(data)
        delta = init_delta(jax.random.PRNGKey(3), src["rgbs"], 8.0 / 255)
        renders[flags] = {
            "adv": np.asarray(ev.render_view(
                data, delta, src, src["cameras"])["outputs_coarse"]["rgb"]),
            "clean": np.asarray(ev.render_view(
                data, jnp.zeros_like(delta), src,
                src["cameras"])["outputs_coarse"]["rgb"]),
        }
    both = renders[("use_clean_color", "use_clean_density")]
    np.testing.assert_allclose(both["adv"], both["clean"], atol=1e-5)
    color_only = renders[("use_clean_color",)]
    assert np.max(np.abs(color_only["adv"] - color_only["clean"])) > 1e-4
    assert np.max(np.abs(color_only["adv"] - renders[()]["adv"])) > 1e-4


def test_gnt_view_specific_end_to_end(tmp_path, small_kwargs):
    from nerfool_tpu.attack.engine import AdvEvaluator

    args = _engine_args(tmp_path, view_specific=True, backbone="gnt",
                        trans_depth="2", ret_alpha=True)
    args.N_importance = 0
    ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
    results = ev.evaluate(out_dir=None, save_images=False, verbose=False,
                          max_views=1)
    assert np.isfinite(results[args.eval_dataset]["coarse_mean_psnr"])


def test_gnt_rayfold_engine_clean_eval_matches(tmp_path, small_kwargs):
    """Clean GNT eval through the real evaluator with gnt_ray_fold=2 (gather
    emits the ray-packed layout natively) reproduces the ray_fold=1 PSNR —
    the production-path guard for the round-4 packed-gather ray fold."""
    from nerfool_tpu.attack.engine import AdvEvaluator

    psnr = {}
    for fold in (1, 2):
        args = _engine_args(tmp_path, backbone="gnt", trans_depth="2",
                            ret_alpha=True, gnt_ray_fold=str(fold))
        args.N_importance = 0
        args.view_specific = False
        args.no_attack = True
        ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
        results = ev.evaluate(out_dir=None, save_images=False, verbose=False,
                              max_views=1)
        psnr[fold] = results[args.eval_dataset]["coarse_mean_psnr"]
    assert np.isfinite(psnr[1])
    np.testing.assert_allclose(psnr[2], psnr[1], rtol=0, atol=5e-3)


def test_gnt_fused_attn_engine_clean_eval_matches(tmp_path, small_kwargs):
    """Clean GNT eval through the real evaluator with --gnt_fused_attn on
    (fused Pallas view/ray attention, interpret mode on CPU) reproduces the
    XLA-path PSNR — the production-path guard for the fused render kernels."""
    from nerfool_tpu.attack.engine import AdvEvaluator

    psnr = {}
    for mode in ("off", "on"):
        args = _engine_args(tmp_path, backbone="gnt", trans_depth="2",
                            ret_alpha=True, gnt_fused_attn=mode)
        args.N_importance = 0
        args.view_specific = False
        args.no_attack = True
        ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
        results = ev.evaluate(out_dir=None, save_images=False, verbose=False,
                              max_views=1)
        psnr[mode] = results[args.eval_dataset]["coarse_mean_psnr"]
    assert np.isfinite(psnr["off"])
    np.testing.assert_allclose(psnr["on"], psnr["off"], rtol=0, atol=5e-3)


def test_engine_lpips_full_path(tmp_path, small_kwargs):
    """The FULL engine LPIPS path with a committed-at-test-time tiny random
    weights file: weights .npz -> _build_lpips -> per-backbone normalization
    convention -> recorded per-view value. The recorded LPIPS must equal a
    direct recompute under the backbone's own convention (IBRNet: [0,1]
    scaled to [-1,1] inside the net, reference lpips_tf.py:58-59; GNT: raw
    [0,1], pip-lpips normalize=False default, gnt/utils.py:286-297) and
    differ from the OTHER backbone's convention on the same images."""
    import jax
    import jax.numpy as jnp

    from nerfool_tpu.attack.engine import AdvEvaluator
    from nerfool_tpu.metrics.lpips import LPIPS, load_lpips_weights, save_lpips_weights

    dummy = jnp.zeros((1, 8, 8, 3))
    params = LPIPS().init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    wpath = str(tmp_path / "lpips_rand.npz")
    save_lpips_weights(params, wpath)
    loaded = load_lpips_weights(wpath)

    for backbone in ("ibrnet", "gnt"):
        kw = dict(view_specific=True, lpips_weights=wpath)
        if backbone == "gnt":
            kw.update(backbone="gnt", trans_depth="2", ret_alpha=True)
        args = _engine_args(tmp_path, **kw)
        args.no_attack = True  # clean per-view render: fully deterministic
        if backbone == "gnt":
            args.N_importance = 0
        ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
        results = ev.evaluate(out_dir=None, save_images=False, verbose=False,
                              max_views=1)
        data = ev.test_dataset[0]
        file_id = os.path.splitext(os.path.basename(data["rgb_path"]))[0]
        recorded = results[args.eval_dataset][file_id]["coarse_lpips"]
        assert np.isfinite(recorded)

        src = ev._make_src(data)
        pred = np.clip(np.asarray(ev.render_view(
            data, jnp.zeros_like(src["rgbs"]), src, src["cameras"]
        )["outputs_coarse"]["rgb"]), 0, 1)
        gt = np.asarray(data["rgb"])
        expect = {
            conv: float(LPIPS(normalize=conv).apply(
                {"params": loaded}, jnp.asarray(pred[None]), jnp.asarray(gt[None])
            )[0])
            for conv in (True, False)
        }
        right = expect[backbone != "gnt"]
        wrong = expect[backbone == "gnt"]
        np.testing.assert_allclose(recorded, right, rtol=1e-4, err_msg=backbone)
        assert abs(recorded - wrong) > 1e-6, (backbone, recorded, wrong)


def test_render_video_script_smoke(tmp_path):
    """scripts/render_video.py end-to-end over a generated LLFF scene:
    spiral poses -> whole-frame renders -> frame PNGs (mp4 gated on ffmpeg)."""
    import subprocess
    import sys as _sys

    from test_data import _write_llff_scene

    _write_llff_scene(str(tmp_path))
    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "render_video.py"),
         "--rootdir", str(tmp_path), "--llff_factor", "1",
         "--eval_scenes", "testscene", "--eval_dataset", "llff_test",
         "--N_samples", "4", "--N_importance", "0", "--chunk_size", "1920",
         "--num_source_views", "3", "--video_frames", "1",
         "--expname", "vidsmoke"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = tmp_path / "llff_test" / "vidsmoke_video" / "testscene"
    assert (out / "000.png").exists(), proc.stdout[-2000:]


def test_scan_group_sharded_equivalence(tmp_path, small_kwargs):
    """The pod-default path (scan groups once rays shard over a mesh,
    engine._scan_group -> 25) must be numerically equivalent to per-iteration
    dispatch: with iteration keys pre-split once and sliced per group, the
    view-specific attack over the 8-virtual-device mesh with --scan_group 5
    produces the same final delta as --scan_group 1."""
    import jax

    from nerfool_tpu.attack.engine import AdvEvaluator

    assert len(jax.devices()) == 8  # conftest forces the 8-device CPU mesh
    deltas = {}
    bundle = None
    for group in (1, 5):
        args = _engine_args(tmp_path, view_specific=True, adv_iters=5,
                            use_pseudo_gt=True)
        args.scan_group = group
        ev = AdvEvaluator(args, bundle=bundle, dataset_kwargs=small_kwargs)
        assert ev.ray_sharding is not None  # rays really shard over the mesh
        bundle = ev.bundle
        data = ev.test_dataset[0]
        delta, _, _ = ev.attack_view_specific(data)
        deltas[group] = np.asarray(delta)
    np.testing.assert_allclose(deltas[5], deltas[1], atol=1e-6)


def test_code_snapshot(tmp_path):
    """save_code_snapshot zips the framework source into the run dir
    (reference save_current_code, utils.py:38-45)."""
    import zipfile

    from nerfool_tpu.utils.logging import save_code_snapshot

    dst = save_code_snapshot(str(tmp_path))
    with zipfile.ZipFile(dst) as z:
        names = z.namelist()
    assert any(n == "nerfool_tpu/attack/attack.py" for n in names)
    assert any(n.startswith("scripts/") for n in names)
    assert any(n.startswith("configs/") and n.endswith(".txt") for n in names)


def test_universal_attack_checkpoint_resume(tmp_path, small_kwargs):
    """Universal attack saves its state every i_attack_ckpt iterations and a
    restarted run resumes from the saved iteration (SURVEY §5: the reference
    keeps attack state only in memory)."""
    from nerfool_tpu.attack.engine import AdvEvaluator, load_attack_state

    args = _engine_args(tmp_path, use_adam=True, adam_lr="1e-2")
    args.view_specific = False
    args.adv_iters = 4
    args.i_attack_ckpt = 2
    args.scan_group = 2
    ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
    ckpt = str(tmp_path / "attack_state.pkl")
    delta1, _, _ = ev.attack_universal(ckpt_path=ckpt)
    state, meta = load_attack_state(ckpt)
    assert meta["iters_done"] == 4
    assert state["step"] == 4
    np.testing.assert_allclose(np.asarray(delta1), state["delta"], atol=1e-6)

    # a fresh evaluator resumes instead of restarting: with iters_done ==
    # adv_iters the loop body is skipped and the checkpointed delta returns
    ev2 = AdvEvaluator(args, bundle=ev.bundle, dataset_kwargs=small_kwargs)
    delta2, _, _ = ev2.attack_universal(ckpt_path=ckpt)
    np.testing.assert_allclose(np.asarray(delta2), np.asarray(delta1), atol=1e-6)


def test_clean_eval_beats_attacked(tmp_path, small_kwargs):
    """no_attack (scripts/eval.py path) renders clean frames; its PSNR must
    beat the attacked run's on the same scene/model."""
    from nerfool_tpu.attack.engine import AdvEvaluator

    args = _engine_args(tmp_path, use_adam=True, adam_lr="1e-2")
    args.view_specific = False
    args.no_attack = True
    ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
    clean = ev.evaluate(out_dir=None, save_images=False, verbose=False,
                        max_views=1)
    args2 = _engine_args(tmp_path, use_adam=True, adam_lr="1e-2",
                         use_pseudo_gt=True)
    args2.view_specific = False
    ev2 = AdvEvaluator(args2, bundle=ev.bundle, dataset_kwargs=small_kwargs)
    attacked = ev2.evaluate(out_dir=None, save_images=False, verbose=False,
                            max_views=1)
    ds = args.eval_dataset
    assert clean[ds]["coarse_mean_psnr"] > attacked[ds]["coarse_mean_psnr"], (
        clean[ds]["coarse_mean_psnr"], attacked[ds]["coarse_mean_psnr"])


def test_sweep_retarget_reuses_compiled_steps(tmp_path, small_kwargs):
    """retarget() must not grow the compiled-step cache for identical shapes:
    an 8-scene sweep pays jit compilation once (relay compiles are 80-480s)."""
    from nerfool_tpu.attack.engine import AdvEvaluator

    args = _engine_args(tmp_path, view_specific=True, use_adam=True,
                        adam_lr="1e-2", adv_iters=2)
    ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
    ev.evaluate(out_dir=None, verbose=False, max_views=1, save_images=False)
    n_compiled = len(ev._step_cache)
    assert n_compiled >= 1

    args2 = _engine_args(tmp_path, view_specific=True, use_adam=True,
                         adam_lr="1e-2", adv_iters=2)
    ev2 = ev.retarget(args2)
    assert ev2 is ev
    ev.evaluate(out_dir=None, verbose=False, max_views=1, save_images=False)
    assert len(ev._step_cache) == n_compiled, (
        "retarget recompiled attack steps for identical shapes"
    )


def test_attack_gather_auto_select(tmp_path):
    """--attack_gather auto (default): per-tap below --attack_spg_min_views
    source views, SPG at/above it; 'tap' forces per-tap even at high V;
    'spg' forces SPG at low V (BENCH_NOTES attack-gather crossover)."""
    from nerfool_tpu.attack.engine import AdvEvaluator

    kwargs = {"n_views": 14, "h": 24, "w": 32}

    def cfg_for(n_src, bundle=None, **ov):
        args = _engine_args(tmp_path, view_specific=True,
                            num_source_views=n_src, **ov)
        ev = AdvEvaluator(args, bundle=bundle, dataset_kwargs=kwargs)
        return ev, ev._attack_render_cfg()

    ev, cfg = cfg_for(4)
    assert cfg.spg_specs is None  # V=4 flagship: per-tap
    _, cfg = cfg_for(10, bundle=ev.bundle)
    assert cfg.spg_specs is not None  # V>=10: SPG auto-selected
    _, cfg = cfg_for(10, bundle=ev.bundle, attack_gather="tap")
    assert cfg.spg_specs is None
    _, cfg = cfg_for(4, bundle=ev.bundle, attack_gather="spg")
    assert cfg.spg_specs is not None
    _, cfg = cfg_for(4, bundle=ev.bundle, attack_spg_min_views=4)
    assert cfg.spg_specs is not None  # threshold is a flag, not a constant


def test_view_specific_attack_spg(tmp_path, small_kwargs):
    """--attack_spg plans a per-ray segment-patch gather over the dataset's
    cameras and runs the view-specific attack end-to-end through it."""
    from nerfool_tpu.attack.engine import AdvEvaluator

    args = _engine_args(tmp_path, view_specific=True)
    args.attack_spg = True
    ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
    rcfg = ev._attack_render_cfg()
    assert rcfg.spg_specs is not None  # planned, not fallen back
    assert len(rcfg.spg_specs[0].groups) == 1  # uniform-K single view group
    assert rcfg.spg_specs[0].groups[0][0] == tuple(
        range(args.num_source_views))
    out = str(tmp_path / "out_spg")
    results = ev.evaluate(out_dir=out, verbose=False, max_views=1)
    assert results[args.eval_dataset]["coarse_mean_psnr"] > 0


def test_gnt_fused_chain_engine_clean_eval_matches(tmp_path, small_kwargs):
    """Clean GNT eval through the real evaluator with --gnt_fused_chain on
    (whole-chain Pallas kernel, interpret mode on CPU) reproduces the
    XLA-path PSNR — the production-path guard for the chain kernel."""
    from nerfool_tpu.attack.engine import AdvEvaluator

    psnr = {}
    for mode in ("off", "on"):
        # bf16 compute: the chain kernel is bf16-only (VMEM budget); both
        # modes compare at the same dtype
        args = _engine_args(tmp_path, backbone="gnt", trans_depth="2",
                            ret_alpha=True, gnt_fused_chain=mode,
                            compute_dtype="bfloat16")
        args.N_importance = 0
        args.view_specific = False
        args.no_attack = True
        ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
        results = ev.evaluate(out_dir=None, save_images=False, verbose=False,
                              max_views=1)
        psnr[mode] = results[args.eval_dataset]["coarse_mean_psnr"]
    assert np.isfinite(psnr["off"])
    np.testing.assert_allclose(psnr["on"], psnr["off"], rtol=0, atol=5e-3)
