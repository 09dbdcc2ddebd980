#!/bin/bash
# Fan-out: per-scene finetuning over all 8 LLFF scenes
# (equivalent of /root/reference/eval/ibrnet/finetune_llff.sh)
set -e
cd "$(dirname "$0")/.."
SFX=${SFX:-1}
for scene in orchids horns trex room flower leaves fern fortress; do
  python scripts/train.py --config configs/ibrnet/finetune_llff.txt \
    --train_scenes $scene --eval_scenes $scene \
    --expname finetune_${scene}_$SFX "$@"
done
