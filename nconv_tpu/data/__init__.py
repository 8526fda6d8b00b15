"""Data layer: dataset readers (NYU/KITTI/VOID), sparsifiers, loaders."""
from . import io, sparsify
from .datasets import (
    NYU_K,
    NYU_TEST_K,
    KITTIDataset,
    KITTISelValDataset,
    KITTITestDataset,
    NYUDataset,
    NYUTestDataset,
    VOIDDataset,
    crop_top_center,
)
from .pipeline import Loader, collate, prefetch_to_device

__all__ = [
    "io",
    "sparsify",
    "NYU_K",
    "NYU_TEST_K",
    "KITTIDataset",
    "KITTISelValDataset",
    "KITTITestDataset",
    "NYUDataset",
    "NYUTestDataset",
    "VOIDDataset",
    "crop_top_center",
    "Loader",
    "collate",
    "prefetch_to_device",
]
