#!/bin/bash
# Fan-out: clean eval over the 4 DeepVoxels scenes
# (equivalent of /root/reference/eval/ibrnet/eval_deepvoxels.sh)
set -e
cd "$(dirname "$0")/.."
for scene in cube vase greek armchair; do
  python scripts/eval.py --config configs/ibrnet/eval_deepvoxels.txt \
    --eval_scenes $scene --expname eval_$scene "$@"
done
