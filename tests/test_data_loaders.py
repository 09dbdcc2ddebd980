"""Contract tests for the six loaders not covered by test_data.py:
llff (real_iconic_noface), llff_render, google_scanned, ibrnet_collected,
realestate, spaces, shiny — each over a generated on-disk fixture in its
dataset's native layout, checking the canonical sample dict contract
(reference layouts: /root/reference/ibrnet/data_loaders/{llff,google_scanned_
objects,ibrnet_collected,realestate,spaces_dataset}.py, /root/reference/gnt/
data_loaders/{shiny,llff_render}.py)."""
import json
import os
from types import SimpleNamespace

import numpy as np
import pytest


# ---------- fixture writers ----------

def _write_llff_scene(scene, n=12, h=64, w=64, focal=80.0, seed=0):
    import imageio.v2 as imageio

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(scene, "images"))
    poses = []
    for i in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(scene, "images", f"image{i:03d}.png"), img)
        theta = (i / n - 0.5) * 0.4
        c2w = np.eye(4)
        c2w[:3, 3] = [np.sin(theta) * 2, 0.1 * np.sin(i), -0.2 * np.cos(theta)]
        m = np.concatenate([c2w[:3, :4], np.array([[h], [w], [focal]])], axis=1)
        poses.append(m.reshape(-1))
    bounds = np.stack([np.full(n, 2.0), np.full(n, 12.0)], -1)
    np.save(os.path.join(scene, "poses_bounds.npy"),
            np.concatenate([np.stack(poses), bounds], axis=1))


def _write_google_scanned(root, n=250, hw=8):
    import imageio.v2 as imageio

    rng = np.random.RandomState(3)
    obj = os.path.join(root, "data/google_scanned_objects/object0")
    for sub in ("rgb", "pose", "intrinsics"):
        os.makedirs(os.path.join(obj, sub))
    intr = np.eye(4)
    intr[0, 0] = intr[1, 1] = 12.0
    intr[0, 2] = intr[1, 2] = hw / 2.0
    for i in range(n):
        img = (rng.rand(hw, hw, 3) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(obj, "rgb", f"{i:05d}.png"), img)
        pose = np.eye(4)
        # cluster of cameras in front of the object: origin depth stays positive
        pose[:3, 3] = [0.1 * np.sin(i), 0.1 * np.cos(i), -2.0 - 0.001 * i]
        np.savetxt(os.path.join(obj, "pose", f"{i:05d}.txt"), pose.reshape(1, -1))
        np.savetxt(os.path.join(obj, "intrinsics", f"{i:05d}.txt"),
                   intr.reshape(1, -1))


def _write_realestate(root, mode="train", n=14, h=18, w=32):
    import imageio.v2 as imageio

    rng = np.random.RandomState(4)
    frames = os.path.join(root, "data/RealEstate10K-subset", mode, "frames", "video0")
    cams = os.path.join(root, "data/RealEstate10K-subset", mode, "cameras")
    os.makedirs(frames)
    os.makedirs(cams, exist_ok=True)
    lines = ["https://example.invalid/video0"]
    for i in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(frames, f"{i:06d}.png"), img)
        w2c = np.eye(4)
        w2c[:3, 3] = [0.01 * i, 0.0, 0.05 * i]
        vals = [i, 0.9, 1.6, 0.5, 0.5, 0.0, 0.0] + w2c[:3, :4].reshape(-1).tolist()
        lines.append(" ".join(str(v) for v in vals))
    with open(os.path.join(cams, "video0.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _write_spaces(root, n_scenes=100, n_views=16, h=12, w=16):
    import imageio.v2 as imageio

    rng = np.random.RandomState(5)
    base = os.path.join(root, "data/spaces_dataset/data/800")
    views = []
    for i in range(n_views):
        views.append({
            "position": [0.2 * np.sin(i), 0.2 * np.cos(i), -1.0 - 0.01 * i],
            "orientation": [0.0, 0.01 * i, 0.0],
            "focal_length": 20.0,
            "pixel_aspect_ratio": 1.0,
            "principal_point": [w / 2.0, h / 2.0],
            "height": h,
            "width": w,
            "relative_path": f"images/cam_{i:02d}.png",
        })
    model_json = json.dumps([views])
    for s in range(n_scenes):
        sd = os.path.join(base, f"scene_{s:03d}")
        os.makedirs(sd)
        with open(os.path.join(sd, "models.json"), "w") as f:
            f.write(model_json)
    # images only for scene_000 (the one the test reads)
    imgdir = os.path.join(base, "scene_000", "images")
    os.makedirs(imgdir)
    for i in range(n_views):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(imgdir, f"cam_{i:02d}.png"), img)


@pytest.fixture(scope="module")
def loaders_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("loadersroot"))
    _write_llff_scene(os.path.join(root, "data/real_iconic_noface/scene0"))
    _write_llff_scene(os.path.join(root, "data/nerf_llff_data/fern"), n=10, h=40,
                      w=48, focal=60.0, seed=1)
    _write_llff_scene(os.path.join(root, "data/ibrnet_collected_1/sceneA"),
                      n=12, h=32, w=32, focal=40.0, seed=2)
    _write_llff_scene(os.path.join(root, "data/ibrnet_collected_2/sceneB"),
                      n=12, h=64, w=64, focal=80.0, seed=3)
    shiny = os.path.join(root, "data/shiny/cd")
    _write_llff_scene(shiny, n=10, h=32, w=32, focal=40.0, seed=4)
    np.save(os.path.join(shiny, "hwf_cxcy.npy"),
            np.array([[32.0], [32.0], [40.0], [40.0], [16.0], [16.0]]))
    _write_google_scanned(root)
    _write_realestate(root)
    _write_spaces(root)
    return root


def _args(root, **kw):
    base = dict(rootdir=root, num_source_views=3, llffhold=4, llff_factor=1,
                rectify_inplane_rotation=False, random_crop=False)
    base.update(kw)
    return SimpleNamespace(**base)


def _check_sample(data, v_min=1, v_max=10):
    assert data["rgb"].ndim == 3 and data["rgb"].shape[-1] == 3
    assert data["rgb"].dtype == np.float32
    assert data["camera"].shape == (34,)
    v = data["src_rgbs"].shape[0]
    assert v_min <= v <= v_max and data["src_rgbs"].shape[-1] == 3
    assert data["src_cameras"].shape == (v, 34)
    assert data["src_cameras"][:, 0] == pytest.approx(data["src_rgbs"].shape[1])
    assert data["src_cameras"][:, 1] == pytest.approx(data["src_rgbs"].shape[2])
    assert data["depth_range"].shape == (2,)
    assert data["depth_range"][1] > data["depth_range"][0] > 0


# ---------- loaders over fixtures ----------

def test_llff_dataset(loaders_root):
    from nerfool_tpu.data.llff import LLFFDataset

    ds = LLFFDataset(_args(loaders_root), "test")
    assert len(ds) == 3  # 12 views, llffhold 4
    _check_sample(ds[0], v_min=3, v_max=3)
    ds_train = LLFFDataset(_args(loaders_root), "train")
    assert len(ds_train) == 12
    _check_sample(ds_train[5], v_min=1, v_max=5)


def test_llff_render_dataset(loaders_root):
    from nerfool_tpu.data.llff_render import LLFFRenderDataset

    ds = LLFFRenderDataset(_args(loaders_root), scenes="fern")
    assert len(ds) == 120  # spiral path
    d = ds[0]
    assert "rgb" not in d  # no GT for spiral frames
    assert d["camera"].shape == (34,)
    assert d["src_rgbs"].shape[0] == 3 and d["src_cameras"].shape == (3, 34)
    assert d["depth_range"][1] > d["depth_range"][0] > 0
    # consecutive spiral frames move the camera
    assert not np.allclose(ds[1]["camera"][-16:], d["camera"][-16:])


def test_google_scanned_dataset(loaders_root):
    from nerfool_tpu.data.google_scanned import GoogleScannedDataset

    ds = GoogleScannedDataset(_args(loaders_root), "train")
    assert len(ds) == 1
    _check_sample(ds[0], v_min=3, v_max=3)


def test_ibrnet_collected_dataset(loaders_root):
    from nerfool_tpu.data.ibrnet_collected import IBRNetCollectedDataset

    ds = IBRNetCollectedDataset(_args(loaders_root), "test")
    assert len(ds) == 6  # two scenes x 3 test views each
    d0, d5 = ds[0], ds[5]
    _check_sample(d0, v_min=3, v_max=3)
    _check_sample(d5, v_min=3, v_max=3)
    # collected_1 loads at factor 2, collected_2 at factor 8
    assert d0["rgb"].shape[:2] == (16, 16)
    assert d5["rgb"].shape[:2] == (8, 8)
    ds_train = IBRNetCollectedDataset(_args(loaders_root), "train",
                                      random_crop=False)
    assert len(ds_train) == 24
    _check_sample(ds_train[3], v_min=1, v_max=5)


def test_realestate_dataset(loaders_root):
    from nerfool_tpu.data.realestate import RealEstateDataset

    ds = RealEstateDataset(_args(loaders_root), "train")
    assert len(ds) == 1
    d = ds[0]
    _check_sample(d, v_min=3, v_max=3)
    assert d["rgb"].shape == (450, 800, 3)  # reference resizes to 450x800
    np.testing.assert_allclose(d["depth_range"], [1.0, 100.0])
    # normalized intrinsics unnormalized by the target size
    assert d["camera"][2] == pytest.approx(0.9 * 800)
    assert d["camera"][7] == pytest.approx(1.6 * 450)


def test_spaces_dataset(loaders_root):
    from nerfool_tpu.data.spaces import SpacesFreeDataset

    ds = SpacesFreeDataset(_args(loaders_root), "train")
    assert len(ds) == 100
    d = ds[0]
    _check_sample(d, v_min=3, v_max=3)
    np.testing.assert_allclose(d["depth_range"], [0.7, 100.0])


def test_shiny_dataset(loaders_root):
    from nerfool_tpu.data.shiny import ShinyDataset

    ds = ShinyDataset(_args(loaders_root), "test", scenes="cd")
    assert len(ds) == 3  # 10 views, llffhold 4
    d = ds[0]
    _check_sample(d, v_min=3, v_max=3)
    # hwf_cxcy intrinsics with the dataset's sign convention (shiny.py:46-50)
    assert d["camera"][2] == pytest.approx(40.0)
    assert d["camera"][7] == pytest.approx(-40.0)
    ds_train = ShinyDataset(_args(loaders_root), "train", scenes="cd",
                            random_crop=False)
    assert len(ds_train) == 7 * 100000  # infinite-repeat train split
    _check_sample(ds_train[2], v_min=1, v_max=4)


def test_registry_covers_reference_datasets():
    from nerfool_tpu.data import dataset_dict

    # ibrnet registry (ibrnet/data_loaders/__init__.py:27-36) + the gnt
    # additions (gnt/data_loaders/__init__.py:14-25)
    expected = {"llff", "llff_test", "nerf_synthetic", "deepvoxels",
                "ibrnet_collected", "google_scanned", "realestate", "spaces",
                "shiny", "llff_render"}
    assert expected <= set(dataset_dict)
