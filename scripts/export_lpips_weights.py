#!/usr/bin/env python
"""Export LPIPS (net-lin, VGG16) weights into the framework's .npz format.

Counterpart of the reference's eval/ibrnet/lpips_tensorflow/export_to_tensorflow.py
(the reference self-downloads its frozen TF graph at import,
/root/reference/eval/ibrnet/lpips_tensorflow/lpips_tf.py:32-93 — impossible in a
zero-egress environment, so this framework takes weights as an explicit file).

Two ways to produce the .npz, both OFFLINE once the two .pth files exist:

* local files (no packages, no network — works in this image):
      python scripts/export_lpips_weights.py \
          --vgg_pth vgg16-397923af.pth --lpips_pth vgg.pth
  where
    - ``vgg16-397923af.pth`` is the torchvision VGG16 IMAGENET1K_V1 state_dict
      (hand-carry from https://download.pytorch.org/models/vgg16-397923af.pth
      or any torchvision cache: ~/.cache/torch/hub/checkpoints/)
    - ``vgg.pth`` is the pip-lpips v0.1 lin-head checkpoint (hand-carry from
      the lpips package: lpips/weights/v0.1/vgg.pth inside its install dir, or
      https://github.com/richzhang/PerceptualSimilarity/raw/master/lpips/weights/v0.1/vgg.pth)

* installed packages (environments with torchvision + lpips + egress):
      python scripts/export_lpips_weights.py

Then pass the output to the evaluators / parity runbook as
``--lpips_weights lpips_vgg.npz``.
"""
import argparse
import sys


def _params_from_local(vgg_pth, lpips_pth):
    import torch

    from nerfool_tpu.metrics.lpips import convert_lpips_torch_state

    vgg_sd = torch.load(vgg_pth, map_location="cpu", weights_only=True)
    if not any(k.startswith("features.") for k in vgg_sd):
        sys.exit(f"{vgg_pth} does not look like a torchvision VGG16 "
                 f"state_dict (no 'features.*' keys)")
    feats = {k[len("features."):]: v for k, v in vgg_sd.items()
             if k.startswith("features.")}
    lins = torch.load(lpips_pth, map_location="cpu", weights_only=True)
    missing = [f"lin{i}.model.1.weight" for i in range(5)
               if f"lin{i}.model.1.weight" not in lins]
    if missing:
        sys.exit(f"{lpips_pth} does not look like a pip-lpips v0.1 'vgg' "
                 f"checkpoint (missing {missing})")
    return convert_lpips_torch_state(feats, lins)


def _params_from_packages():
    try:
        import lpips as lpips_pkg
        import torchvision
    except ImportError as e:
        sys.exit(f"needs torchvision + lpips installed (or pass local files "
                 f"via --vgg_pth/--lpips_pth): {e}")

    from nerfool_tpu.metrics.lpips import convert_lpips_torch_state

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1")
    net = lpips_pkg.LPIPS(net="vgg")
    lins_sd = {
        f"lin{i}.model.1.weight": lin.model[1].weight.detach()
        for i, lin in enumerate(net.lins)
    }
    return convert_lpips_torch_state(vgg.features.state_dict(), lins_sd)


def main():
    ap = argparse.ArgumentParser(
        description=__doc__.split("\n")[0],
        formatter_class=argparse.RawDescriptionHelpFormatter, epilog=__doc__)
    ap.add_argument("--out", default="lpips_vgg.npz")
    ap.add_argument("--vgg_pth", default="",
                    help="local torchvision vgg16 state_dict "
                         "(vgg16-397923af.pth); no network/packages needed")
    ap.add_argument("--lpips_pth", default="",
                    help="local pip-lpips v0.1 vgg lin checkpoint (vgg.pth)")
    args = ap.parse_args()

    if bool(args.vgg_pth) != bool(args.lpips_pth):
        sys.exit("--vgg_pth and --lpips_pth must be given together")
    params = (_params_from_local(args.vgg_pth, args.lpips_pth)
              if args.vgg_pth else _params_from_packages())

    from nerfool_tpu.metrics.lpips import save_lpips_weights

    save_lpips_weights(params, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
