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
