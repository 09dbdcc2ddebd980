#!/bin/bash
# Fan-out: spiral-path video render over all 8 LLFF scenes
# (equivalent of /root/reference/eval/ibrnet/render_llff.sh)
set -e
cd "$(dirname "$0")/.."
for scene in orchids horns trex room flower leaves fern fortress; do
  python scripts/render_video.py --config configs/ibrnet/eval_llff.txt \
    --train_scenes $scene --eval_scenes $scene --expname video_$scene "$@"
done
