#!/bin/bash
# Fan-out: clean eval over all 8 NeRF Synthetic scenes
# (equivalent of /root/reference/eval/ibrnet/eval_nerf_synthetic_all.sh; the
# reference spreads scenes over CUDA_VISIBLE_DEVICES — here each run owns the
# TPU and rays shard over its chips, so scenes run back to back)
set -e
cd "$(dirname "$0")/.."
for scene in mic chair lego ficus materials hotdog ship drums; do
  python scripts/eval.py --config configs/ibrnet/eval_nerf_synthetic.txt \
    --eval_scenes $scene --expname eval_$scene "$@"
done
