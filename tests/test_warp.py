"""forward_warp / project_with_depth parity with the reference torch loop
implementation, and geo_interp parity with the reference scipy slerp."""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REFERENCE = "/root/reference"
if os.path.isdir(REFERENCE):
    import ref_stubs

    ref_stubs.install()
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, os.path.join(REFERENCE, "eval", "ibrnet"))

from helpers import orbit_cameras  # noqa: E402

from nerfool_tpu.attack.warp import forward_warp, project_with_depth  # noqa: E402
from nerfool_tpu.attack.geo_interp import interp3, slerp  # noqa: E402

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)


def _two_cams(rng, h, w):
    cams = orbit_cameras(2, h, w)
    k_ref = cams[0][2:18].reshape(4, 4)[:3, :3].copy()
    e_ref = cams[0][18:34].reshape(4, 4).copy()
    k_src = cams[1][2:18].reshape(4, 4)[:3, :3].copy()
    e_src = cams[1][18:34].reshape(4, 4).copy()
    depth = (rng.rand(h, w).astype(np.float32) * 2 + 3.0)
    rgb = rng.rand(h, w, 3).astype(np.float32)
    return k_ref, e_ref, k_src, e_src, depth, rgb


@needs_ref
def test_project_with_depth_parity(rng):
    import torch
    import eval_adv as ref_mod

    h, w = 12, 16
    k_ref, e_ref, k_src, e_src, depth, _ = _two_cams(rng, h, w)
    xr, yr, dr = ref_mod.project_with_depth(
        torch.from_numpy(depth)[None], torch.from_numpy(k_ref), torch.from_numpy(e_ref),
        torch.from_numpy(k_src), torch.from_numpy(e_src),
    )
    xs, ys, ds = project_with_depth(
        jnp.asarray(depth), jnp.asarray(k_ref), jnp.asarray(e_ref),
        jnp.asarray(k_src), jnp.asarray(e_src),
    )
    np.testing.assert_allclose(np.asarray(xs), xr[0].numpy().reshape(-1), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ys), yr[0].numpy().reshape(-1), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ds), dr[0, 0].numpy(), rtol=1e-4, atol=1e-4)


@needs_ref
@pytest.mark.parametrize("src2tar", [True, False])
def test_forward_warp_parity(rng, src2tar):
    import torch
    import eval_adv as ref_mod

    h, w = 12, 16
    k_ref, e_ref, k_src, e_src, depth, rgb = _two_cams(rng, h, w)
    sel = np.sort(rng.choice(h * w, 20, replace=False))

    ref_out = ref_mod.forward_warp(
        sel.tolist() if not src2tar else sel,
        torch.from_numpy(rgb), torch.from_numpy(depth)[None],
        torch.from_numpy(k_ref), torch.from_numpy(e_ref),
        torch.from_numpy(k_src), torch.from_numpy(e_src),
        src2tar=src2tar, derive_full_image=False, cpu_speedup=False,
    )
    ours = forward_warp(
        jnp.asarray(sel), jnp.asarray(rgb), jnp.asarray(depth),
        jnp.asarray(k_ref), jnp.asarray(e_ref),
        jnp.asarray(k_src), jnp.asarray(e_src), src2tar=src2tar,
    )
    if src2tar:
        r_new, r_depth, r_rgbp, r_depthp = ref_out
        o_new, o_depth, o_rgbp, o_depthp = ours
    else:
        r_new, r_depth, r_rgbp, r_depthp, r_inds = ref_out
        o_new, o_depth, o_rgbp, o_depthp, o_inds = ours
        np.testing.assert_array_equal(np.asarray(o_inds), np.asarray(r_inds))
    np.testing.assert_allclose(np.asarray(o_depth), r_depth.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_new), r_new.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_depthp), r_depthp.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_rgbp), r_rgbp.numpy(), rtol=1e-4, atol=1e-5)


@needs_ref
def test_interp3_parity(rng):
    import geo_interp as ref_gi

    cams = orbit_cameras(3, 8, 8)
    poses = [c[18:34].reshape(4, 4).astype(np.float64) for c in cams]
    for s12, s3 in [(0.3, 0.7), (0.0, 1.0), (0.5, 0.5)]:
        ref = ref_gi.interp3(poses[0], poses[1], poses[2], s12, s3).numpy()
        ours = interp3(poses[0], poses[1], poses[2], s12, s3)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_slerp_endpoints():
    q0 = np.array([0, 0, 0, 1.0])
    q1 = np.array([0, np.sin(0.3), 0, np.cos(0.3)])
    np.testing.assert_allclose(slerp(q0, q1, 0.0), q0, atol=1e-9)
    np.testing.assert_allclose(slerp(q0, q1, 1.0), q1, atol=1e-9)
