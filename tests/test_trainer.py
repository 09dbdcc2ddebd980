"""Trainer tests: loss decreases on a fixed synthetic view, adversarial
training compiles and runs, checkpoint save/resume roundtrip."""
import itertools

import numpy as np
import jax
import pytest

from nerfool_tpu.data.synthetic import SyntheticDataset
from nerfool_tpu.models.bundle import create_model
from nerfool_tpu.render.render_rays import RenderConfig
from nerfool_tpu.train.trainer import TrainConfig, Trainer

pytestmark = pytest.mark.slow  # trainer smoke runs

H, W = 24, 32


def _trainer(tmp_path, **cfg_kw):
    ds = SyntheticDataset(mode="train", n_views=8, h=H, w=W)
    bundle = create_model(backbone="ibrnet", rng_key=jax.random.PRNGKey(0))
    render_cfg = RenderConfig(n_samples=12, n_importance=0, det=True, backbone="ibrnet")
    cfg = TrainConfig(h=H, w=W, n_rand=64, **cfg_kw)
    tr = Trainer(bundle, render_cfg, cfg, out_dir=str(tmp_path / "out"))
    # fixed view -> deterministic objective
    data = ds[0]
    it = itertools.repeat(data)
    return tr, it


def test_training_reduces_loss(tmp_path):
    tr, it = _trainer(tmp_path)
    losses = []
    tr.train(it, 12, key=jax.random.PRNGKey(1), i_print=4,
             log_fn=lambda s: losses.append(s))
    key = jax.random.PRNGKey(2)
    data = next(it)
    import jax.numpy as jnp

    batch = {
        "camera": jnp.asarray(data["camera"]),
        "rgb": jnp.asarray(data["rgb"].reshape(-1, 3)),
        "depth_range": jnp.asarray(data["depth_range"].reshape(1, 2)),
        "src_rgbs": jnp.asarray(data["src_rgbs"]),
        "src_cameras": jnp.asarray(data["src_cameras"]),
    }
    # loss from printed logs must go down over training
    import re

    vals = [float(re.search(r"loss=([\d.]+)", s).group(1)) for s in losses]
    assert vals[-1] < vals[0], vals


def test_adv_training_runs(tmp_path):
    tr, it = _trainer(tmp_path, use_adv_train=True, adv_iters=2)
    tr.train(it, 2, key=jax.random.PRNGKey(1), i_print=1, log_fn=lambda s: None)


def test_checkpoint_roundtrip(tmp_path):
    tr, it = _trainer(tmp_path)
    tr.train(it, 3, key=jax.random.PRNGKey(1), i_print=10, log_fn=lambda s: None)
    path = tr.save(3)
    tr2, _ = _trainer(tmp_path)
    step = tr2.load_latest()
    assert step == 3
    a = jax.tree.leaves(tr.params)[0]
    b = jax.tree.leaves(tr2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_i_img_validation_panels(tmp_path):
    """i_img renders a validation view and writes GT/pred/depth panels
    (reference log_view_to_tb, train.py:248-314)."""
    import os

    from nerfool_tpu.utils.logging import ScalarLogger

    tr, it = _trainer(tmp_path)
    logger = ScalarLogger(str(tmp_path), "t")
    tr.train(it, 2, key=jax.random.PRNGKey(1), i_print=1,
             log_fn=lambda s: None, i_img=2, val_iter=it, logger=logger)
    files = os.listdir(os.path.join(str(tmp_path), "images"))
    assert any(f.startswith("val_pred_coarse") for f in files), files
    assert any(f.startswith("val_depth_coarse") for f in files), files
    assert any(f.startswith("val_gt_rgb") for f in files), files
