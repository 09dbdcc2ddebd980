#!/usr/bin/env python
"""Multi-scene / multi-dataset attack sweep (BASELINE config 5): runs the
universal or view-specific attack over every scene of one or more eval
datasets and aggregates the results into one JSON report."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerfool_tpu.config import config_parser
from nerfool_tpu.utils.platform import apply_platform_env

apply_platform_env()

LLFF_SCENES = ["fern", "flower", "fortress", "horns", "leaves", "orchids",
               "room", "trex"]
SYNTHETIC_SCENES = ["chair", "drums", "lego", "hotdog", "materials", "mic", "ship"]
DEEPVOXELS_SCENES = ["armchair", "cube", "greek", "vase"]

SCENES = {
    "llff_test": LLFF_SCENES,
    "nerf_synthetic": SYNTHETIC_SCENES,
    "deepvoxels": DEEPVOXELS_SCENES,
    "synthetic": [""],
}


def main():
    args = config_parser().parse_args()
    from nerfool_tpu.utils.platform import apply_precision

    apply_precision(args)
    from nerfool_tpu.attack.engine import AdvEvaluator

    datasets = args.eval_dataset.split("+")
    report = {}
    ev = None
    for ds in datasets:
        for scene in SCENES.get(ds, [""]):
            a = config_parser().parse_args(sys.argv[1:])  # fresh per scene
            a.eval_dataset = ds
            a.eval_scenes = [scene] if scene else []
            out_dir = os.path.join(ds, args.expname, scene or ds)
            print(f"=== {ds}/{scene} ===", flush=True)
            # ONE evaluator for the whole sweep: step shapes don't depend on
            # the scene, so compiled attack/render programs are reused
            ev = AdvEvaluator(a) if ev is None else ev.retarget(a)
            res = ev.evaluate(out_dir=out_dir, verbose=True)
            report[f"{ds}/{scene}"] = res[scene or ds]
    out = os.path.join(args.eval_dataset.replace("+", "_"),
                       args.expname, "sweep_report.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
