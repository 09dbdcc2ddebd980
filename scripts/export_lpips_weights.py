#!/usr/bin/env python
"""Export LPIPS (net-lin, VGG16) weights into the framework's .npz format.

Run this once in any environment that has torchvision + the pip ``lpips``
package (this zero-egress image has neither); copy the resulting .npz here and
pass it as --lpips_weights. Counterpart of the reference's
eval/ibrnet/lpips_tensorflow/export_to_tensorflow.py.
"""
import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    try:
        import lpips as lpips_pkg
        import torchvision
    except ImportError as e:
        sys.exit(f"needs torchvision + lpips installed: {e}")

    import numpy as np  # noqa: F401

    from nerfool_tpu.metrics.lpips import convert_lpips_torch_state, save_lpips_weights

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1")
    net = lpips_pkg.LPIPS(net="vgg")
    lins_sd = {
        f"lin{i}.model.1.weight": lin.model[1].weight.detach()
        for i, lin in enumerate(net.lins)
    }
    params = convert_lpips_torch_state(vgg.features.state_dict(), lins_sd)
    save_lpips_weights(params, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
