"""Shared synthetic-scene fixtures: procedural cameras on an orbit looking at
the origin plus smooth random source images — lets renderer/attack tests run
end-to-end with no dataset downloads."""
import numpy as np

from nerfool_tpu.utils.cameras import make_camera_vector


def look_at(eye, target=np.zeros(3), up=np.array([0.0, -1.0, 0.0])):
    """OpenCV-convention c2w (z forward into the scene)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = down
    c2w[:3, 2] = fwd
    c2w[:3, 3] = eye
    return c2w


def orbit_cameras(n, h, w, radius=4.0, focal=None, elevation=0.35):
    focal = focal or 0.8 * w
    cams = []
    for i in range(n):
        theta = 2 * np.pi * i / max(n, 1) * 0.25  # quarter arc: overlapping views
        eye = np.array(
            [radius * np.sin(theta), radius * elevation, -radius * np.cos(theta)],
            dtype=np.float32,
        )
        k = np.eye(4, dtype=np.float32)
        k[0, 0] = k[1, 1] = focal
        k[0, 2], k[1, 2] = w / 2.0, h / 2.0
        cams.append(make_camera_vector(h, w, k, look_at(eye)))
    return np.stack(cams).astype(np.float32)


def smooth_images(rng, v, h, w, c=3):
    """Random images that are spatially smooth (so bilinear taps are meaningful)."""
    small = rng.rand(v, max(h // 4, 2), max(w // 4, 2), c).astype(np.float32)
    import jax.image

    return np.asarray(
        jax.image.resize(small, (v, h, w, c), method="linear")
    ).astype(np.float32)


def synthetic_scene(rng, n_src=4, h=32, w=40, feat_ch=32):
    """Returns (target_camera [34], src_rgbs [V,H,W,3], src_cameras [V,34],
    featmaps (coarse, fine) each [V,H/2,W/2,feat_ch], depth_range [1,2])."""
    cams = orbit_cameras(n_src + 1, h, w)
    target_cam, src_cams = cams[0], cams[1:]
    src_rgbs = smooth_images(rng, n_src, h, w)
    feat_c = smooth_images(rng, n_src, h // 2, w // 2, feat_ch) - 0.5
    feat_f = smooth_images(rng, n_src, h // 2, w // 2, feat_ch) - 0.5
    depth_range = np.array([[2.0, 6.0]], dtype=np.float32)
    return target_cam, src_rgbs, src_cams, (feat_c, feat_f), depth_range


def llff_rig_cameras(n, h, w, seed=7, focal=None):
    """Forward-facing LLFF-style rig: cameras jittered in a shallow box,
    looking roughly down +z at a scene a few units away — the geometry the
    reference's llff_test nearest-view selection produces (small baselines,
    strongly overlapping views)."""
    rs = np.random.RandomState(seed)
    focal = focal or 0.8 * w
    cams = []
    for _ in range(n):
        eye = np.array([
            rs.uniform(-0.25, 0.25), rs.uniform(-0.12, 0.12),
            rs.uniform(-0.08, 0.08),
        ])
        tgt = np.array([rs.uniform(-0.2, 0.2), rs.uniform(-0.2, 0.2), 3.5])
        k = np.eye(4, dtype=np.float32)
        k[0, 0] = k[1, 1] = focal
        k[0, 2], k[1, 2] = w / 2.0, h / 2.0
        cams.append(make_camera_vector(h, w, k.astype(np.float32),
                                       look_at(eye, tgt)))
    return np.stack(cams).astype(np.float32)


def llff_rig_scene(rng, n_src=4, h=32, w=40, feat_ch=32, seed=7):
    """Forward-facing twin of synthetic_scene (depth range ~ LLFF fern)."""
    cams = llff_rig_cameras(n_src + 1, h, w, seed=seed)
    target_cam, src_cams = cams[0], cams[1:]
    src_rgbs = smooth_images(rng, n_src, h, w)
    feat_c = smooth_images(rng, n_src, h // 2, w // 2, feat_ch) - 0.5
    feat_f = smooth_images(rng, n_src, h // 2, w // 2, feat_ch) - 0.5
    depth_range = np.array([[1.08, 7.6]], dtype=np.float32)
    return target_cam, src_rgbs, src_cams, (feat_c, feat_f), depth_range
