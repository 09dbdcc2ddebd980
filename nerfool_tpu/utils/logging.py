"""Scalar/image experiment logging.

The reference logs through tensorboardX (/root/reference/train.py:93-241);
this environment has no tensorboard, so scalars go to a JSONL stream that
tensorboard-compatible tooling (or pandas) can ingest, and image panels are
written as PNGs. Same cadence flags (i_print / i_img / i_weights).
"""
from __future__ import annotations

import json
import os
import time


class ScalarLogger:
    def __init__(self, log_dir, name="train"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}_scalars.jsonl")
        self._f = open(self.path, "a")
        self.t0 = time.time()

    def add_scalar(self, tag, value, step):
        self._f.write(
            json.dumps({"step": int(step), "tag": tag, "value": float(value),
                        "wall": time.time() - self.t0}) + "\n"
        )
        self._f.flush()

    def add_scalars(self, scalars: dict, step):
        for k, v in scalars.items():
            self.add_scalar(k, v, step)

    def add_image(self, tag, image, step):
        """image: [H, W, 3] float in [0,1] or uint8."""
        import imageio.v2 as imageio
        import numpy as np

        img_dir = os.path.join(os.path.dirname(self.path), "images")
        os.makedirs(img_dir, exist_ok=True)
        if image.dtype != "uint8":
            image = (255 * np.clip(image, 0, 1)).astype("uint8")
        imageio.imwrite(os.path.join(img_dir, f"{tag.replace('/', '_')}_{step:08d}.png"),
                        image)

    def close(self):
        self._f.close()


def save_run_config(out_dir, args):
    """Snapshot the resolved flags and the config file
    (reference train.py:55-65: args.txt + config.txt)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "args.txt"), "w") as f:
        for k in sorted(vars(args)):
            f.write(f"{k} = {getattr(args, k)}\n")
    cfg = getattr(args, "config", None)
    if cfg and os.path.isfile(cfg):
        import shutil

        dst = os.path.join(out_dir, "config.txt")
        if not os.path.exists(dst):
            shutil.copy(cfg, dst)


def save_code_snapshot(out_dir):
    """Zip the framework source into the run directory so results stay
    reproducible (reference save_current_code, utils.py:38-45, which copies
    the source tree into out/<expname>/code/)."""
    import zipfile

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    dst = os.path.join(out_dir, "code_snapshot.zip")
    os.makedirs(out_dir, exist_ok=True)
    with zipfile.ZipFile(dst, "w", zipfile.ZIP_DEFLATED) as z:
        for sub in ("nerfool_tpu", "scripts", "configs"):
            top = os.path.join(root, sub)
            for dirpath, dirnames, filenames in os.walk(top):
                dirnames[:] = [d for d in dirnames if d != "__pycache__"]
                for fn in filenames:
                    if fn.endswith((".py", ".txt", ".sh")):
                        p = os.path.join(dirpath, fn)
                        z.write(p, os.path.relpath(p, root))
    return dst
