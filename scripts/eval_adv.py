#!/usr/bin/env python
"""Adversarial evaluation entry point.

TPU-native equivalent of the reference's flagship
``python eval/ibrnet/eval_adv.py --config ... --view_specific --adv_iters 1000
--epsilon 8 --use_adam ...`` (and the GNT twin) — same CLI semantics, one
binary for both backbones (--backbone ibrnet|gnt).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerfool_tpu.config import config_parser
from nerfool_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    args = config_parser().parse_args()
    from nerfool_tpu.utils.platform import apply_precision

    apply_precision(args)
    args.distributed = False
    args.det = True  # always deterministic sampling for attacks (reference :530)

    from nerfool_tpu.attack.engine import AdvEvaluator

    assert len(args.eval_scenes) <= 1, "only accept single scene"
    scene = args.eval_scenes[0] if args.eval_scenes else args.eval_dataset
    out_dir = os.path.join(args.eval_dataset, args.expname, scene)
    print(f"saving results to {out_dir}...")

    evaluator = AdvEvaluator(args)
    results = evaluator.evaluate(out_dir=out_dir, verbose=True)
    scene_res = results[scene]
    print(
        f"------{scene}-------\n"
        f"final coarse psnr: {scene_res['coarse_mean_psnr']}, "
        f"final fine psnr: {scene_res['fine_mean_psnr']}\n"
        f"final coarse ssim: {scene_res['coarse_mean_ssim']}, "
        f"final fine ssim: {scene_res['fine_mean_ssim']}\n"
        f"final coarse lpips: {scene_res['coarse_mean_lpips']}, "
        f"final fine lpips: {scene_res['fine_mean_lpips']}"
    )


if __name__ == "__main__":
    main()
