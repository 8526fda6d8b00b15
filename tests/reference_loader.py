"""Import helper for the reference PyTorch repo at /root/reference.

Used only by parity tests: stubs the reference's unused heavy imports
(timm DropPath, torchvision — both imported but never exercised by the
forward paths under test) and puts the reference on sys.path. Tests that
use this skip gracefully when the reference isn't present.
"""
import sys
import types

REFERENCE_PATH = "/root/reference"


def load_reference():
    import os

    if not os.path.isdir(REFERENCE_PATH):
        return None
    try:
        import torch.nn as nn
    except ImportError:
        return None
    for name in [
        "timm",
        "timm.models",
        "timm.models.layers",
        "torchvision",
        "torchvision.transforms",
        "torchvision.transforms.functional",
    ]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["timm.models.layers"].DropPath = nn.Identity
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import models.step1 as ref_step1  # noqa: F401
    import models.step2 as ref_step2  # noqa: F401

    return ref_step1, ref_step2
