#!/usr/bin/env python
"""Spiral-path video renderer (equivalent of
/root/reference/eval/ibrnet/render_llff_video.py and eval/gnt/render.py):
renders 120 spiral poses per scene and writes an mp4 at --video_fps."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nerfool_tpu.config import config_parser
from nerfool_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    args = config_parser().parse_args()
    from nerfool_tpu.utils.platform import apply_precision

    apply_precision(args)
    args.det = True  # deterministic sampling, as the reference video renderer
    # (render_llff_video.py:172) hard-codes

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from nerfool_tpu.data import dataset_dict
    from nerfool_tpu.models.bundle import create_model, default_render_config
    from nerfool_tpu.render.render_image import render_single_image
    from nerfool_tpu.utils.cameras import get_rays
    from nerfool_tpu.utils.vis import to8b

    scene = args.eval_scenes[0] if args.eval_scenes else "fern"
    dataset = dataset_dict["llff_render"](args, scenes=scene)
    bundle = create_model(args=args, backbone=args.backbone,
                          ckpt_path=args.ckpt_path or None)
    render_cfg = default_render_config(args, backbone=args.backbone)
    fmode = getattr(args, "gnt_fused_attn", "auto")
    if args.backbone == "gnt" and fmode == "on":
        # battery5: the fused ray-attention kernel loses -19% end to end
        # (see engine._view_render_cfg) — 'auto' resolves to off, 'on'
        # forces it
        import dataclasses

        render_cfg = dataclasses.replace(render_cfg, gnt_fused_attn=True)
    cmode = getattr(args, "gnt_fused_chain", "auto")
    if (args.backbone == "gnt" and cmode != "off"
            and (cmode == "on" or jax.default_backend() == "tpu")):
        # whole-chain kernel: the fused variant that wins e2e (battery5)
        import dataclasses

        render_cfg = dataclasses.replace(render_cfg, gnt_fused_chain=True)

    out_dir = os.path.join(args.eval_dataset, args.expname + "_video", scene)
    os.makedirs(out_dir, exist_ok=True)
    frames = []
    crop = 32  # boundary crop as in the reference (render_llff_video.py)
    n_frames = min(len(dataset), args.video_frames)
    for i in range(n_frames):
        t0 = time.time()
        data = dataset[i]
        h, w = int(data["camera"][0]), int(data["camera"][1])
        cam = np.asarray(data["camera"]).reshape(-1)[:34]
        rays_o, rays_d = get_rays(
            h, w, jnp.asarray(cam[2:18].reshape(4, 4)),
            jnp.asarray(cam[18:34].reshape(4, 4)),
        )
        batch = {
            "ray_o": rays_o, "ray_d": rays_d,
            "depth_range": jnp.asarray(np.asarray(data["depth_range"]).reshape(1, 2)),
            "camera": jnp.asarray(cam[None]),
        }
        src_rgbs = jnp.asarray(np.asarray(data["src_rgbs"]))
        src_cams = jnp.asarray(np.asarray(data["src_cameras"]).reshape(-1, 34))
        feats = bundle.extract_features(src_rgbs)
        ret = render_single_image(
            bundle.render_params, bundle.modules, batch, feats, render_cfg,
            h, w, src_rgbs, src_cams, chunk_size=args.chunk_size,
        )
        level = "outputs_fine" if ret["outputs_fine"] is not None else "outputs_coarse"
        frame = to8b(np.asarray(ret[level]["rgb"]))
        if frame.shape[0] > 2 * crop and frame.shape[1] > 2 * crop:
            frame = frame[crop:-crop, crop:-crop]
        frames.append(frame)
        print(f"frame {i+1}/{n_frames}: {time.time()-t0:.2f}s", flush=True)
        imageio.imwrite(os.path.join(out_dir, f"{i:03d}.png"), frame)

    try:
        imageio.mimwrite(
            os.path.join(out_dir, f"{scene}.mp4"), frames, fps=args.video_fps,
            quality=8,
        )
        print(f"wrote {out_dir}/{scene}.mp4")
    except Exception as e:  # no ffmpeg backend: the PNG sequence is the output
        print(f"mp4 write unavailable ({e}); kept PNG frame sequence in {out_dir}")


if __name__ == "__main__":
    main()
