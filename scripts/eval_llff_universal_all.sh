#!/bin/bash
# Fan-out: universal (view-generalizable) attack over all 8 LLFF scenes
set -e
cd "$(dirname "$0")/.."
for scene in fern flower fortress horns leaves orchids room trex; do
  python scripts/eval_adv.py --config configs/ibrnet/eval_llff.txt \
    --eval_scenes $scene --expname universal_$scene \
    --adv_iters 1000 --epsilon 8 --use_adam --adam_lr 1e-3 --adv_lr 1 \
    --lr_gamma 1 --num_source_views 4 --use_pseudo_gt --use_center_view "$@"
done
