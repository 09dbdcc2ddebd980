"""Data-layer tests: generated on-disk LLFF / Blender / DeepVoxels fixtures
through our loaders, LLFF pose-pipeline parity vs the reference, view-selection
parity, epipolar verifier, and the synthetic fixture dataset contract."""
import json
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

REFERENCE = "/root/reference"
if os.path.isdir(REFERENCE):
    import ref_stubs

    ref_stubs.install()
    sys.path.insert(0, REFERENCE)

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)


# ---------- fixtures on disk ----------

def _write_llff_scene(root, n=10, h=40, w=48):
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    scene = os.path.join(root, "data/nerf_llff_data/testscene")
    os.makedirs(os.path.join(scene, "images"))
    poses = []
    for i in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(scene, "images", f"image{i:03d}.png"), img)
        # LLFF pose: [down right back] 3x4 + hwf column
        theta = (i / n - 0.5) * 0.4
        c2w = np.eye(4)
        c2w[:3, 3] = [np.sin(theta) * 2, 0.1 * np.sin(i), -0.2 * np.cos(theta)]
        m = np.concatenate([c2w[:3, :4], np.array([[h], [w], [60.0]])], axis=1)
        poses.append(m.reshape(-1))
    bounds = np.stack([np.full(n, 2.0), np.full(n, 12.0)], -1)
    arr = np.concatenate([np.stack(poses), bounds], axis=1)
    np.save(os.path.join(scene, "poses_bounds.npy"), arr)
    return scene


def _write_blender_scene(root, n=8, h=32, w=32):
    import imageio.v2 as imageio

    rng = np.random.RandomState(1)
    scene = os.path.join(root, "data/nerf_synthetic/lego")
    os.makedirs(os.path.join(scene, "test"))
    frames = []
    for i in range(n):
        rgba = (rng.rand(h, w, 4) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(scene, "test", f"r_{i}.png"), rgba)
        depth = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(scene, "test", f"r_{i}_depth_0000.png"), depth)
        theta = 2 * np.pi * i / n
        c2w = np.eye(4)
        c2w[:3, 3] = [3 * np.sin(theta), -3 * np.cos(theta), 1.0]
        c2w[:3, :3] = np.array(
            [[np.cos(theta), 0, np.sin(theta)], [0, 1, 0], [-np.sin(theta), 0, np.cos(theta)]]
        )
        frames.append({"file_path": f"./test/r_{i}", "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": 0.8, "frames": frames}
    with open(os.path.join(scene, "transforms_test.json"), "w") as f:
        json.dump(meta, f)
    return scene


def _write_deepvoxels_scene(root, n=6, hw=64):
    import imageio.v2 as imageio

    rng = np.random.RandomState(2)
    for subset in ("train", "test"):
        scene = os.path.join(root, "data/deepvoxels", subset, "vase")
        os.makedirs(os.path.join(scene, "rgb"))
        os.makedirs(os.path.join(scene, "pose"))
        with open(os.path.join(scene, "intrinsics.txt"), "w") as f:
            f.write("100.0 32.0 32.0\n0 0 0\n0.5\n1.0\n64 64\n0\n")
        for i in range(n):
            img = (rng.rand(hw, hw, 3) * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(scene, "rgb", f"{i:05d}.png"), img)
            theta = 2 * np.pi * i / n
            pose = np.eye(4)
            pose[:3, 3] = [2 * np.sin(theta), 0.3, -2 * np.cos(theta)]
            np.savetxt(os.path.join(scene, "pose", f"{i:05d}.txt"), pose.reshape(1, -1))


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dataroot"))
    _write_llff_scene(root)
    _write_blender_scene(root)
    _write_deepvoxels_scene(root)
    return root


def _args(root, **kw):
    base = dict(
        rootdir=root, num_source_views=3, llffhold=4, llff_factor=1, testskip=2,
        rectify_inplane_rotation=False, random_crop=False, gt_depth_path="",
        total_view_limit=None,
    )
    base.update(kw)
    return SimpleNamespace(**base)


# ---------- LLFF pipeline parity vs reference ----------

@needs_ref
def test_llff_pipeline_parity(data_root, monkeypatch):
    import imageio
    from ibrnet.data_loaders import llff_data_utils as ref_mod

    # the reference calls imageio.imread(..., ignoregamma=True), a v2-era kwarg
    monkeypatch.setattr(
        ref_mod, "imageio",
        SimpleNamespace(imread=lambda f, **kw: imageio.v2.imread(f)),
    )
    ref_load = ref_mod.load_llff_data

    from nerfool_tpu.data.llff_utils import load_llff_data

    scene = os.path.join(data_root, "data/nerf_llff_data/testscene")
    imgs, poses, bds, render_poses, i_test, files = load_llff_data(scene, factor=1)
    r_imgs, r_poses, r_bds, r_render, r_itest, r_files = ref_load(scene, factor=1)
    np.testing.assert_allclose(poses, r_poses, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(bds, r_bds, rtol=1e-6)
    np.testing.assert_allclose(render_poses, r_render, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(imgs, r_imgs, atol=1e-6)
    assert i_test == r_itest
    assert [os.path.basename(f) for f in files] == [os.path.basename(f) for f in r_files]


@needs_ref
def test_nearest_pose_ids_parity(rng):
    from ibrnet.data_loaders.data_utils import get_nearest_pose_ids as ref_fn

    from nerfool_tpu.data.view_selection import get_nearest_pose_ids

    poses = np.stack([np.eye(4) for _ in range(12)])
    poses[:, :3, 3] = rng.randn(12, 3)
    tar = poses[0]
    for method in ("matrix", "vector", "dist"):
        ours = get_nearest_pose_ids(tar, poses, 5, tar_id=0, angular_dist_method=method)
        ref = ref_fn(tar, poses, 5, tar_id=0, angular_dist_method=method)
        np.testing.assert_array_equal(ours, ref)


# ---------- loaders over fixtures ----------

def _check_sample(data, v):
    assert data["rgb"].ndim == 3 and data["rgb"].shape[-1] == 3
    assert data["camera"].shape == (34,)
    assert data["src_rgbs"].shape[0] == v and data["src_rgbs"].shape[-1] == 3
    assert data["src_cameras"].shape == (v, 34)
    assert data["depth_range"].shape == (2,)
    assert data["depth_range"][1] > data["depth_range"][0] > 0


def test_llff_test_dataset(data_root):
    from nerfool_tpu.data.llff_test import LLFFTestDataset

    args = _args(data_root)
    ds = LLFFTestDataset(args, "test", scenes="testscene")
    assert len(ds) == 3  # 10 views, llffhold 4 -> test ids 0,4,8
    _check_sample(ds[0], 3)
    ds_train = LLFFTestDataset(args, "train", scenes="testscene")
    assert len(ds_train) == 7 * 100000
    d = ds_train[2]
    # train mode jitters the source count by -2..+1 (reference llff_test.py:125)
    assert 1 <= d["src_rgbs"].shape[0] <= 4
    assert d["src_cameras"].shape[0] == d["src_rgbs"].shape[0]
    # universal attack's global source set is deterministic
    ds_glb = LLFFTestDataset(args, "test", scenes="testscene", use_glb_src=True)
    a = ds_glb[0]["src_cameras"]
    b = ds_glb[1]["src_cameras"]
    np.testing.assert_allclose(a, b)


def test_nerf_synthetic_dataset(data_root):
    from nerfool_tpu.data.nerf_synthetic import NerfSyntheticDataset

    ds = NerfSyntheticDataset(_args(data_root), "test", scenes="lego")
    assert len(ds) == 4  # 8 views, testskip 2
    data = ds[0]
    _check_sample(data, 3)
    assert "depth" in data and "src_depths" in data
    np.testing.assert_allclose(data["depth_range"], [2.0, 6.0])


def test_deepvoxels_dataset(data_root):
    from nerfool_tpu.data.deepvoxels import DeepVoxelsDataset

    ds = DeepVoxelsDataset(_args(data_root), "test", scenes="vase")
    assert len(ds) == 3
    _check_sample(ds[0], 3)


def test_synthetic_dataset_and_verifier():
    from nerfool_tpu.data.synthetic import SyntheticDataset
    from nerfool_tpu.data.verifier import verify_data

    ds = SyntheticDataset(mode="test", n_views=8)
    data = ds[0]
    _check_sample(data, 4)
    assert "depth" in data and "src_depths" in data
    ok, residual = verify_data(data)
    assert ok, f"epipolar residual {residual}"


def test_loader_prefetch(data_root):
    from nerfool_tpu.data import dataset_dict
    from nerfool_tpu.data.base import Loader

    ds = dataset_dict["synthetic"](None, mode="test", n_views=8)
    items = list(Loader(ds, shuffle=True, seed=1, num_workers=2))
    assert len(items) == len(ds)


def test_registry_and_mix():
    from nerfool_tpu.data import MixDataset, dataset_dict

    d1 = dataset_dict["synthetic"](None, mode="train", n_views=8, seed=0)
    d2 = dataset_dict["synthetic"](None, mode="train", n_views=8, seed=1)
    mix = MixDataset([d1, d2], [0.5, 0.5], seed=0)
    _ = mix[0]
    assert len(mix) > 0
