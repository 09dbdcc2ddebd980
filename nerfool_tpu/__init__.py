"""nerfool-tpu: TPU-native adversarial robustness evaluation for generalizable NeRFs.

A from-scratch JAX / XLA / Pallas / pjit framework with the capabilities of
GATECH-EIC/NeRFool (ICML 2023): IBRNet and GNT generalizable-NeRF inference and
the NeRFool adversarial attack suite, redesigned TPU-first.

Layout:
  utils/     camera codecs, pose math, image utilities
  data/      numpy dataset loaders (LLFF, Blender, DeepVoxels, ...) + synthetic fixtures
  models/    Flax networks (ResUNet, IBRNet aggregator, GNT aggregator) + torch-ckpt port
  render/    functional renderer: projection, sampling, compositing, whole-image render
  ops/       Pallas TPU kernels for the hot per-ray aggregation path
  attack/    L-inf perturbation attack engine (PGD / Adam / PCGrad / pose attack / defenses)
  metrics/   PSNR / SSIM / LPIPS
  parallel/  device mesh + sharding helpers
"""

__version__ = "0.1.0"
