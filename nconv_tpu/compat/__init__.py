"""Interop with the reference PyTorch stack: checkpoint conversion (both
directions: reference .pth.tar -> flax variables and back) and deployment
ONNX emission (`.onnx_export`; the torch mirror itself lives in
`.torch_mirror` and is imported lazily since it needs torch)."""
from .onnx_export import (
    export_guided_onnx,
    read_onnx_summary,
    selftest_guided_onnx,
)
from .torch_convert import (
    convert_guided_state_dict,
    convert_unguided_state_dict,
    load_pth_tar,
    save_pth_tar,
    strip_data_parallel_prefix,
    to_guided_state_dict,
    to_unguided_state_dict,
)

__all__ = [
    "convert_guided_state_dict",
    "export_guided_onnx",
    "read_onnx_summary",
    "selftest_guided_onnx",
    "convert_unguided_state_dict",
    "load_pth_tar",
    "save_pth_tar",
    "strip_data_parallel_prefix",
    "to_guided_state_dict",
    "to_unguided_state_dict",
]
