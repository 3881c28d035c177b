"""Stub out heavy/unavailable deps so the reference package imports on CPU.

Used only by parity harnesses; never shipped.
"""
import sys
import types


def install() -> None:
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")
        tv_utils.make_grid = lambda *a, **k: None
        tv.utils = tv_utils
        tv_transforms = types.ModuleType("torchvision.transforms")
        tv.transforms = tv_transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
        sys.modules["torchvision.transforms"] = tv_transforms
