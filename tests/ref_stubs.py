"""Minimal module stubs so the reference's entry modules import without the
missing-in-this-image deps (configargparse, tensorboardX). Used only by tests
that treat the reference as an oracle."""
import argparse
import sys
import types


class _ConfigArgumentParser(argparse.ArgumentParser):
    def add_argument(self, *args, **kwargs):
        kwargs.pop("is_config_file", None)
        return super().add_argument(*args, **kwargs)


def install():
    if "configargparse" not in sys.modules:
        m = types.ModuleType("configargparse")
        m.ArgumentParser = _ConfigArgumentParser
        sys.modules["configargparse"] = m
    if "tensorboardX" not in sys.modules:
        m = types.ModuleType("tensorboardX")
        m.SummaryWriter = object
        sys.modules["tensorboardX"] = m
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")

        def _getattr(name):
            if name.startswith("__"):
                raise AttributeError(name)
            return object

        tr.__getattr__ = _getattr  # any transform class
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    if "lpips" not in sys.modules:
        # eval/gnt/utils.py instantiates lpips.LPIPS at import time; the GNT
        # oracle tests never evaluate LPIPS, a no-op class suffices
        m = types.ModuleType("lpips")

        class _LPIPS:
            def __init__(self, *a, **k):
                pass

            def cuda(self, *a, **k):
                return self

            def __call__(self, *a, **k):
                raise RuntimeError("lpips stub: not computable in tests")

        m.LPIPS = _LPIPS
        m._NERFOOL_STUB = True
        sys.modules["lpips"] = m
