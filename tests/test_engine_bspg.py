"""Engine-level BSPG wiring: _view_render_cfg plans block segment-patch
specs once per evaluator (TPU path; forced here via NERFOOL_FORCE_BSPG) and
the BSPG whole-image render of a view matches the per-tap render.

BSPG numerical exactness at the render layer is covered by tests/test_bspg.py;
this covers the evaluator's planning/fallback plumbing.
"""
import dataclasses
import os

import numpy as np
import pytest

from tests.test_engine import _engine_args  # reuse the CLI fixture builder


@pytest.fixture(scope="module")
def small_kwargs():
    # big enough for the BSPG planner to find an admissible patch size
    # (24x32 featmaps are smaller than the minimum patch and must fall back)
    return {"n_views": 6, "h": 48, "w": 64}


def test_view_render_cfg_plans_and_matches(tmp_path, small_kwargs, monkeypatch):
    import jax.numpy as jnp

    from nerfool_tpu.attack.engine import AdvEvaluator

    blk = 8
    monkeypatch.setenv("NERFOOL_FORCE_BSPG", "1")
    args = _engine_args(tmp_path, view_specific=True, N_samples=8)
    args.bspg_block = blk
    ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
    n_src = ev._make_src(ev.test_dataset[0])["cameras"].shape[0]
    cfg = ev._view_render_cfg(int(n_src))
    assert cfg.bspg_specs is not None
    assert cfg.bspg_specs[0].block == (blk, blk)
    assert ev._view_render_cfg(int(n_src)) is cfg  # planned once, cached
    (grp,) = cfg.bspg_specs[0].groups
    assert grp[0] == tuple(range(int(n_src)))  # remapped onto runtime slots

    data = ev.test_dataset[0]
    src = ev._make_src(data)
    zero = jnp.zeros_like(src["rgbs"])
    # the Pallas selection kernel interprets off-TPU (too slow for CI):
    # exercise the planned specs through the plain-XLA selection
    ev._bspg_cfg[int(n_src)] = dataclasses.replace(cfg, bspg_pallas=False)
    img_b = np.asarray(
        ev.render_view(data, zero, src, src["cameras"])["outputs_coarse"]["rgb"])
    ev._bspg_cfg[int(n_src)] = ev.render_cfg  # per-tap baseline
    img_t = np.asarray(
        ev.render_view(data, zero, src, src["cameras"])["outputs_coarse"]["rgb"])
    np.testing.assert_allclose(img_b, img_t, rtol=0, atol=2e-5)


def test_view_render_cfg_honors_bspg_block(tmp_path, small_kwargs, monkeypatch):
    """--bspg_block reaches the planner (block-16 exactness is covered at the
    ops layer, tests/test_bspg.py::test_bspg_block16_matches_per_tap; this
    scene's featmaps are too small for a 16-block tube to plan for real)."""
    from nerfool_tpu.attack import engine as eng

    seen = {}

    def capture(*a, **kw):
        seen["block"] = kw.get("block")
        return None  # planner finds nothing -> clean fallback

    import nerfool_tpu.ops.bspg as bspg_mod

    monkeypatch.setenv("NERFOOL_FORCE_BSPG", "1")
    monkeypatch.setattr(bspg_mod, "plan_render_specs", capture)
    args = _engine_args(tmp_path, view_specific=True, N_samples=8)
    args.bspg_block = 16
    ev = eng.AdvEvaluator(args, dataset_kwargs=small_kwargs)
    n_src = ev._make_src(ev.test_dataset[0])["cameras"].shape[0]
    with pytest.warns(UserWarning, match="no admissible patch size"):
        assert ev._view_render_cfg(int(n_src)) is ev.render_cfg
    assert seen["block"] == (16, 16)


def test_view_render_cfg_fallback_off_tpu(tmp_path, small_kwargs, monkeypatch):
    from nerfool_tpu.attack.engine import AdvEvaluator

    monkeypatch.delenv("NERFOOL_FORCE_BSPG", raising=False)
    args = _engine_args(tmp_path, view_specific=True)
    ev = AdvEvaluator(args, dataset_kwargs=small_kwargs)
    assert ev._view_render_cfg(4) is ev.render_cfg  # CPU backend: per-tap path
