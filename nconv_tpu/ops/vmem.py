"""Scoped-VMEM budget knob for the Pallas kernels.

Mosaic's default scoped-VMEM budget on this target is 16 MB — the limit the
round-2/3 kernels were tuned against (pack gates, tile-height fit models).
The physical VMEM on a v5e core is ~128 MB, and Pallas exposes the budget via
``CompilerParams(vmem_limit_bytes=...)``. ``NCONV_VMEM_LIMIT_MB`` raises it,
scaling the fit models accordingly; unset keeps the tuned 16 MB behavior.
"""
from __future__ import annotations

import os

from jax.experimental.pallas import tpu as pltpu

# Default 96 MB (v5e has ~128 MB physical): raising the budget above the
# 16 MB default enables 4-way row-group packing in the conv kernels —
# measured 5.98 -> 5.89 ms on the full KITTI b=1 inference graph. Set to 16
# to reproduce the default-budget behavior (or 0 to leave Mosaic's default).
LIMIT_MB = int(os.environ.get("NCONV_VMEM_LIMIT_MB", "96") or 0)

# Fit-model multiplier. The kernels' scoped-VMEM fit models are calibrated
# at the 16 MB default and drift a few % at large tiles, so the budgets they
# enforce must sit WELL below the raised limit — default one notch under.
# NOTE the env read must use get() with NO default: a default string "0" is
# truthy, which silently pinned the scale to 0 (disabling every
# budget-scaled feature — row-group packing, filter-grad tile budgets)
# until round 5 caught it.
_BUDGET_SCALE = int(
    os.environ.get("NCONV_VMEM_BUDGET_SCALE")
    or (max(1, LIMIT_MB // 16 - 2) if LIMIT_MB else 1)
)


def compiler_params() -> pltpu.CompilerParams | None:
    """CompilerParams carrying the raised scoped-VMEM limit (or None)."""
    if LIMIT_MB:
        return pltpu.CompilerParams(vmem_limit_bytes=LIMIT_MB << 20)
    return None


def scale() -> int:
    """Budget multiplier relative to the 16 MB default (>= 1)."""
    return _BUDGET_SCALE


# The chain kernel's tile-height tradeoff is NOT VMEM-bound: larger tiles
# reduce halo re-reads but lose DMA/compute overlap (a budget-scaled fuse3
# chain tile measured 502 -> 651 us). Its budget scales separately.
_CHAIN_SCALE = int(os.environ.get("NCONV_CHAIN_SCALE", "1") or 1)


def chain_scale() -> int:
    """Budget multiplier for the conv-chain kernel's tile fit model."""
    return _CHAIN_SCALE
