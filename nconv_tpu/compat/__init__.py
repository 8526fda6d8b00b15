"""Interop with the reference PyTorch stack (checkpoint conversion)."""
from .torch_convert import (
    convert_guided_state_dict,
    convert_unguided_state_dict,
    load_pth_tar,
    strip_data_parallel_prefix,
)

__all__ = [
    "convert_guided_state_dict",
    "convert_unguided_state_dict",
    "load_pth_tar",
    "strip_data_parallel_prefix",
]
