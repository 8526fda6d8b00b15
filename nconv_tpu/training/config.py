"""Typed configuration layer.

The reference configures runs by hand-editing module-level globals
(`/root/reference/train_step1.py:14-22`, SURVEY.md §5.6); a real config
system is a required improvement, not a port.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Sequence


@dataclass(frozen=True)
class OptimizerConfig:
    """Optimizer selection (reference ``get_optimizer``, utils.py:53-61)."""

    name: str = "adamw"  # adamw | sgd | rmsprop
    learning_rate: float = 1e-2
    weight_decay: float = 1e-7
    momentum: float = 0.9  # sgd / rmsprop only


@dataclass(frozen=True)
class SchedulerConfig:
    """LR schedule: 'plateau' (ReduceLROnPlateau(factor, patience)) or
    'linear' (LinearLR 1 -> 0 over total epochs) — the reference's two modes
    (train_step1.py:35-38)."""

    kind: str = "plateau"  # plateau | linear | constant
    factor: float = 0.1
    patience: int = 2


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 40
    batch_size: int = 4
    eval_batch_size: int = 1
    use_gradient_loss: bool = True
    batch_reduce: str = "mean"  # multi-res loss; 'first' = exact reference
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    early_stopping: bool = False
    # reference stops after patience+3 bad epochs (train_step1.py:105)
    early_stop_extra: int = 3
    seed: int = 0
    checkpoint_dir: str = "checkpoints"
    run_name: str = "run"
    checkpoint_every: int = 1  # epochs; reference only saved at the very end
    keep_checkpoints: int = 3
    log_every: int = 25  # batches
    dump_images_every: int = 0  # batches; 0 disables debug depth dumps
    image_dir: str = "tmp"
    # failure detection: 'raise' aborts on a non-finite epoch loss (so the
    # per-epoch checkpoint of the last good state survives), 'ignore' keeps
    # going (the reference had no detection at all, SURVEY.md §5.3)
    nan_policy: str = "raise"

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class GridSearchConfig:
    """LR x weight-decay sweep (reference train_step1.py:140-163)."""

    learning_rates: Sequence[float] = (1e-2,)
    weight_decays: Sequence[float] = (1e-7,)
