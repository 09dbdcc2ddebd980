"""Per-backbone metric-protocol selection in the attack engine.

The reference reports IBRNet results with the TF ops "to match the NeRF paper
setup" (/root/reference/eval/ibrnet/eval_adv.py:573-581: tf.image.psnr,
tf.image.ssim with VALID padding, TF-graph LPIPS that scales [0,1]->[-1,1])
and GNT results with img2psnr + the torch SAME-padding windowed SSIM +
pip-lpips fed raw [0,1] inputs (/root/reference/eval/gnt/eval_adv.py:1193-1196,
eval/gnt/utils.py:264-297). AdvEvaluator must pick the matching protocol from
args.backbone; these tests feed one fixture image pair through the engine's
metric functions for each backbone and assert the reference-protocol value.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfool_tpu.config import config_parser

from test_metrics import _torch_ssim_tf_protocol, torch_ssim_gnt_protocol


def _evaluator(tmp_path, backbone, **overrides):
    from nerfool_tpu.attack.engine import AdvEvaluator

    argv = [
        "--eval_dataset", "synthetic",
        "--backbone", backbone,
        "--N_samples", "8", "--N_importance", "0",
        "--N_rand", "16", "--chunk_size", "128",
        "--num_source_views", "3",
        "--workers", "0",
        "--rootdir", str(tmp_path),
    ]
    for k, v in overrides.items():
        argv.extend([f"--{k}", str(v)])
    args = config_parser().parse_args(argv)
    return AdvEvaluator(args, dataset_kwargs={"n_views": 4, "h": 12, "w": 16})


@pytest.fixture(scope="module")
def image_pair():
    r = np.random.RandomState(7)
    a = r.rand(20, 24, 3).astype(np.float32)
    b = np.clip(a + r.randn(20, 24, 3).astype(np.float32) * 0.08, 0, 1)
    return a, b


def test_ibrnet_protocol(tmp_path, image_pair):
    a, b = image_pair
    ev = _evaluator(tmp_path, "ibrnet")
    psnr_fn, ssim_fn = ev._metric_fns()
    # tf.image.psnr: 10 log10(1/mse)
    assert abs(float(psnr_fn(jnp.asarray(a), jnp.asarray(b)))
               - 10 * np.log10(1.0 / np.mean((a - b) ** 2))) < 1e-3
    assert abs(float(ssim_fn(jnp.asarray(a), jnp.asarray(b)))
               - _torch_ssim_tf_protocol(a, b)) < 1e-4


def test_gnt_protocol(tmp_path, image_pair):
    a, b = image_pair
    ev = _evaluator(tmp_path, "gnt")
    psnr_fn, ssim_fn = ev._metric_fns()
    # img2psnr: -10 ln(mse + 1e-6)/ln 10 (eval/gnt/utils.py:29,56-72)
    mse = np.mean((a - b) ** 2)
    assert abs(float(psnr_fn(jnp.asarray(a), jnp.asarray(b)))
               - (-10 * np.log(mse + 1e-6) / np.log(10))) < 1e-3
    assert abs(float(ssim_fn(jnp.asarray(a), jnp.asarray(b)))
               - torch_ssim_gnt_protocol(a, b)) < 1e-4


def test_lpips_convention_per_backbone(tmp_path, image_pair):
    """_build_lpips must select normalize=True for ibrnet (the TF graph's
    internal *2-1) and normalize=False for gnt (pip-lpips default)."""
    from nerfool_tpu.metrics.lpips import LPIPS, save_lpips_weights

    a, b = image_pair
    model = LPIPS()
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(a[None]), jnp.asarray(b[None])
    )["params"]
    wpath = tmp_path / "lpips.npz"
    save_lpips_weights(params, wpath)

    for backbone, normalize in (("ibrnet", True), ("gnt", False)):
        ev = _evaluator(tmp_path, backbone, lpips_weights=str(wpath))
        fn = ev._build_lpips()
        got = float(fn(a[None], b[None])[0])
        want = float(
            LPIPS(normalize=normalize).apply(
                {"params": params}, jnp.asarray(a[None]), jnp.asarray(b[None])
            )[0]
        )
        assert abs(got - want) < 1e-6, backbone
