"""Training harness: configs, optimizers/schedules, checkpointing, loops."""
from .checkpoint import CheckpointManager, load_best, save_best
from .config import GridSearchConfig, OptimizerConfig, SchedulerConfig, TrainConfig
from .evaluate import evaluate, make_guided_predict, make_unguided_predict
from .optim import (
    ConstantScheduler,
    LinearScheduler,
    PlateauScheduler,
    build_optimizer,
    build_scheduler,
    get_learning_rate,
    set_learning_rate,
)
from .grid_parallel import parallel_grid_search
from .trainer import FitResult, GuidedTask, Trainer, UnguidedTask, grid_search

__all__ = [
    "CheckpointManager",
    "load_best",
    "save_best",
    "GridSearchConfig",
    "OptimizerConfig",
    "SchedulerConfig",
    "TrainConfig",
    "ConstantScheduler",
    "LinearScheduler",
    "PlateauScheduler",
    "build_optimizer",
    "build_scheduler",
    "get_learning_rate",
    "set_learning_rate",
    "evaluate",
    "make_guided_predict",
    "make_unguided_predict",
    "FitResult",
    "GuidedTask",
    "Trainer",
    "UnguidedTask",
    "grid_search",
    "parallel_grid_search",
]
