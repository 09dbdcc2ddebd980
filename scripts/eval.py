#!/usr/bin/env python
"""Clean (no-attack) evaluation: render every test view and measure
PSNR/SSIM/LPIPS. Equivalent of /root/reference/eval/ibrnet/eval.py."""
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
    args.no_attack = True
    args.view_specific = True  # per-view source sets, as in clean eval

    from nerfool_tpu.attack.engine import AdvEvaluator

    scene = args.eval_scenes[0] if args.eval_scenes else args.eval_dataset
    out_dir = os.path.join(args.eval_dataset, args.expname + "_clean", scene)
    evaluator = AdvEvaluator(args)
    results = evaluator.evaluate(out_dir=out_dir, verbose=True)
    print(results[scene])


if __name__ == "__main__":
    main()
