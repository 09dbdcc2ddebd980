"""Metric protocol tests: PSNR/SSIM vs independent torch/numpy derivations,
LPIPS computation vs an in-test torch re-derivation of the formula (random
weights — the protocol, not the pretrained values, is what's under test)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from nerfool_tpu.metrics.image import psnr, ssim, ssim_windowed, img2psnr
from nerfool_tpu.metrics.lpips import LPIPS, save_lpips_weights, load_lpips_weights


def test_psnr(rng):
    a = rng.rand(16, 20, 3).astype(np.float32)
    b = np.clip(a + rng.randn(16, 20, 3).astype(np.float32) * 0.05, 0, 1)
    ours = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    mse = np.mean((a - b) ** 2)
    ref = 10 * np.log10(1.0 / mse)
    assert abs(ours - ref) < 1e-4


def _torch_ssim_tf_protocol(a, b, max_val=1.0):
    """tf.image.ssim re-derivation: gaussian 11x11 sigma 1.5, VALID padding."""
    size, sigma = 11, 1.5
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    k = torch.from_numpy(np.outer(g, g).astype(np.float32))[None, None]
    c = a.shape[-1]
    k = k.repeat(c, 1, 1, 1)

    def filt(img):
        t = torch.from_numpy(img).permute(2, 0, 1)[None]
        return F.conv2d(t, k, groups=c)

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mx, my = filt(a), filt(b)
    sxx = filt(a * a) - mx * mx
    syy = filt(b * b) - my * my
    sxy = filt(a * b) - mx * my
    smap = ((2 * mx * my + c1) / (mx * mx + my * my + c1)) * (
        (2 * sxy + c2) / (sxx + syy + c2)
    )
    return float(smap.mean())


def test_ssim_tf_protocol(rng):
    a = rng.rand(24, 28, 3).astype(np.float32)
    b = np.clip(a + rng.randn(24, 28, 3).astype(np.float32) * 0.1, 0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _torch_ssim_tf_protocol(a, b)
    assert abs(ours - ref) < 1e-4
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.999


def torch_ssim_gnt_protocol(a, b, window_size=11):
    """Re-derivation of the reference GNT SSIM
    (/root/reference/eval/gnt/utils.py:199-235): normalized Gaussian(1.5)
    window, zero-padded SAME conv (padding=window_size//2), C1=0.01^2,
    C2=0.03^2, mean over the full map."""
    sigma = 1.5
    x = np.arange(window_size, dtype=np.float64) - window_size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    c = a.shape[-1]
    k = torch.from_numpy(np.outer(g, g).astype(np.float32))[None, None]
    k = k.repeat(c, 1, 1, 1)

    def filt(img):
        t = torch.from_numpy(img).permute(2, 0, 1)[None]
        return F.conv2d(t, k, padding=window_size // 2, groups=c)

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mx, my = filt(a), filt(b)
    sxx = filt(a * a) - mx * mx
    syy = filt(b * b) - my * my
    sxy = filt(a * b) - mx * my
    smap = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
        (mx * mx + my * my + c1) * (sxx + syy + c2)
    )
    return float(smap.mean())


def test_ssim_windowed_matches_gnt_protocol(rng):
    a = rng.rand(24, 28, 3).astype(np.float32)
    b = np.clip(a + rng.randn(24, 28, 3).astype(np.float32) * 0.1, 0, 1)
    ours = float(ssim_windowed(jnp.asarray(a), jnp.asarray(b)))
    ref = torch_ssim_gnt_protocol(a, b)
    assert abs(ours - ref) < 1e-4
    assert float(ssim_windowed(jnp.asarray(a), jnp.asarray(a))) > 0.999
    # the two protocols genuinely differ (VALID vs SAME padding): guard
    # against one silently aliasing the other
    assert abs(float(ssim(jnp.asarray(a), jnp.asarray(b))) - ours) > 1e-5


def test_img2psnr_mask(rng):
    a = rng.rand(50, 3).astype(np.float32)
    b = rng.rand(50, 3).astype(np.float32)
    m = (rng.rand(50) > 0.5).astype(np.float32)
    ours = float(img2psnr(jnp.asarray(a), jnp.asarray(b), jnp.asarray(m)))
    mse = np.sum((a - b) ** 2 * m[:, None]) / (m.sum() * 3 + 1e-6)
    ref = -10 * np.log(mse + 1e-6) / np.log(10)
    assert abs(ours - ref) < 1e-3


def test_lpips_formula(rng):
    """Our flax LPIPS with random weights == torch re-derivation of the formula."""
    model = LPIPS()
    a = rng.rand(1, 32, 32, 3).astype(np.float32)
    b = rng.rand(1, 32, 32, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(a), jnp.asarray(b))["params"]
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(a), jnp.asarray(b)))

    shift = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
    scale = np.array([0.458, 0.448, 0.450], dtype=np.float32)

    def prep(im):
        im = 2 * im - 1
        return torch.from_numpy((im - shift) / scale).permute(0, 3, 1, 2)

    def vgg_taps(x):
        taps = []
        blocks = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
        for bi, (ch, n) in enumerate(blocks):
            for ci in range(n):
                w = torch.from_numpy(
                    np.asarray(params["vgg"][f"conv{bi}_{ci}"]["kernel"]).transpose(3, 2, 0, 1)
                )
                bias = torch.from_numpy(np.asarray(params["vgg"][f"conv{bi}_{ci}"]["bias"]))
                x = F.relu(F.conv2d(x, w, bias, padding=1))
            taps.append(x)
            if bi < 4:
                x = F.max_pool2d(x, 2)
        return taps

    ta, tb = vgg_taps(prep(a)), vgg_taps(prep(b))
    total = 0.0
    for i, (fa, fb) in enumerate(zip(ta, tb)):
        fa = fa / torch.sqrt((fa ** 2).sum(1, keepdim=True) + 1e-10)
        fb = fb / torch.sqrt((fb ** 2).sum(1, keepdim=True) + 1e-10)
        diff = (fa - fb) ** 2
        lw = torch.from_numpy(
            np.asarray(params[f"lin{i}"]["kernel"]).transpose(3, 2, 0, 1)
        )
        total = total + F.conv2d(diff, lw).mean(dim=(1, 2, 3))
    np.testing.assert_allclose(ours, total.numpy(), rtol=1e-3, atol=1e-5)
    # identical images -> 0
    same = np.asarray(model.apply({"params": params}, jnp.asarray(a), jnp.asarray(a)))
    assert abs(float(same[0])) < 1e-6


def test_lpips_normalize_false(rng):
    """LPIPS(normalize=False) — the GNT convention (pip-lpips default: inputs
    fed raw, /root/reference/eval/gnt/utils.py:286-297) — must equal the
    normalize=True path evaluated on pre-scaled inputs, and differ from
    normalize=True on the same [0,1] inputs."""
    a = rng.rand(1, 16, 16, 3).astype(np.float32)
    b = rng.rand(1, 16, 16, 3).astype(np.float32)
    model_t = LPIPS(normalize=True)
    params = model_t.init(jax.random.PRNGKey(2), jnp.asarray(a), jnp.asarray(b))["params"]
    model_f = LPIPS(normalize=False)
    raw = np.asarray(model_f.apply({"params": params}, jnp.asarray(a), jnp.asarray(b)))
    # normalize=True on (x+1)/2 re-creates the raw inputs internally
    pre = np.asarray(
        model_t.apply({"params": params}, jnp.asarray((a + 1) / 2), jnp.asarray((b + 1) / 2))
    )
    np.testing.assert_allclose(raw, pre, rtol=1e-4, atol=1e-6)
    scaled = np.asarray(model_t.apply({"params": params}, jnp.asarray(a), jnp.asarray(b)))
    assert abs(float(raw[0]) - float(scaled[0])) > 1e-6


def test_lpips_weight_roundtrip(tmp_path, rng):
    model = LPIPS()
    a = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), a, a)["params"]
    p = tmp_path / "lpips.npz"
    save_lpips_weights(params, p)
    loaded = load_lpips_weights(p)
    v1 = model.apply({"params": params}, a, a * 0.5)
    v2 = model.apply({"params": loaded}, a, a * 0.5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_lpips_matches_pip_package(rng):
    """Numerical parity vs the pip ``lpips`` package (the GNT reference
    metric, /root/reference/eval/gnt/utils.py:286-297). Skips where the
    package (and its downloaded VGG weights) is unavailable — zero-egress
    environments cannot fetch them."""
    lpips_pkg = pytest.importorskip("lpips")
    if getattr(lpips_pkg, "_NERFOOL_STUB", False):
        pytest.skip("only the ref_stubs lpips placeholder is installed")
    from nerfool_tpu.metrics.lpips import convert_lpips_torch_state

    net = lpips_pkg.LPIPS(net="vgg", verbose=False)
    sd = net.state_dict()
    feats_sd = {}
    lins_sd = {}
    for k, v in sd.items():
        if k.startswith("net.slice"):
            # pip-lpips wraps torchvision vgg16.features layers in slice
            # modules but keeps the original layer indices: net.slice1.0.*
            # -> features '0.*'
            parts = k.split(".")
            feats_sd[".".join(parts[2:])] = v
        elif k.startswith("lin"):
            lins_sd[k] = v
    params = convert_lpips_torch_state(feats_sd, lins_sd)

    a = rng.rand(1, 64, 64, 3).astype(np.float32)
    b = rng.rand(1, 64, 64, 3).astype(np.float32)
    ours = float(LPIPS().apply({"params": params}, jnp.asarray(a),
                               jnp.asarray(b))[0])
    with torch.no_grad():
        ref = float(net(torch.from_numpy(a).permute(0, 3, 1, 2),
                        torch.from_numpy(b).permute(0, 3, 1, 2),
                        normalize=True).item())
    assert abs(ours - ref) < 1e-4
    # GNT convention: inputs fed raw (pip-lpips normalize default False,
    # exactly how /root/reference/eval/gnt/utils.py:286-297 calls it)
    ours_raw = float(LPIPS(normalize=False).apply(
        {"params": params}, jnp.asarray(a), jnp.asarray(b))[0])
    with torch.no_grad():
        ref_raw = float(net(torch.from_numpy(a).permute(0, 3, 1, 2),
                            torch.from_numpy(b).permute(0, 3, 1, 2)).item())
    assert abs(ours_raw - ref_raw) < 1e-4
