#!/usr/bin/env bash
# Download the evaluation datasets (LLFF, NeRF Synthetic, DeepVoxels) into the
# layout the configs expect (same sources and layout as the reference,
# /root/reference/data/download_eval_data.sh):
#   data/nerf_llff_data/   data/nerf_synthetic/   data/deepvoxels/
# Requires `gdown` (pip install gdown) and network access.
set -e
cd "$(dirname "$0")"

# deepvoxels [synthetic_scenes.zip]
gdown https://drive.google.com/uc?id=1lUvJWB6oFtT8EQ_NzBrXnmi25BufxRfl
unzip -n synthetic_scenes.zip -d deepvoxels

# nerf synthetic [nerf_synthetic.zip]
gdown https://drive.google.com/uc?id=18JxhpWD-4ZmuFKLzKlAw-w5PpzZxXOcG
unzip -n nerf_synthetic.zip

# real forward-facing [nerf_llff_data.zip]
gdown https://drive.google.com/uc?id=16VnMcF1KJYxN9QId6TClMsZRahHNMW5g
unzip -n nerf_llff_data.zip
