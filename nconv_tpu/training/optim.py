"""Optimizers and LR schedules (optax), matching the reference's torch
semantics (`/root/reference/utils.py:53-61`, `train_step1.py:35-38`).

The learning rate is injected as a runtime hyperparameter so host-side
schedulers (plateau control needs the val loss, which only the host loop
has) can adjust it without retracing the jitted train step.
"""
from __future__ import annotations

from typing import Callable

import jax
import optax

from .config import OptimizerConfig, SchedulerConfig


def build_optimizer(
    cfg: OptimizerConfig, frozen_label_fn: Callable | None = None
) -> optax.GradientTransformation:
    """Build the optimizer. ``frozen_label_fn(params) -> pytree of
    'train'|'frozen'`` freezes subtrees entirely (no update, no weight
    decay) — the functional equivalent of the reference's
    ``requires_grad=False`` on step 1 (`models/step2.py:39-40`)."""

    def make(name: str):
        if name == "adamw":
            # torch AdamW: betas (0.9, 0.999), eps 1e-8, decoupled decay
            return optax.inject_hyperparams(optax.adamw)(
                learning_rate=cfg.learning_rate,
                b1=0.9,
                b2=0.999,
                eps=1e-8,
                weight_decay=cfg.weight_decay,
            )
        if name == "sgd":
            # torch SGD couples weight decay into the gradient pre-momentum
            def sgd(learning_rate):
                return optax.chain(
                    optax.add_decayed_weights(cfg.weight_decay),
                    optax.sgd(learning_rate, momentum=cfg.momentum),
                )

            return optax.inject_hyperparams(sgd)(learning_rate=cfg.learning_rate)
        if name == "rmsprop":
            def rmsprop(learning_rate):
                return optax.chain(
                    optax.add_decayed_weights(cfg.weight_decay),
                    optax.rmsprop(
                        learning_rate, decay=0.99, eps=1e-8, momentum=cfg.momentum
                    ),
                )

            return optax.inject_hyperparams(rmsprop)(learning_rate=cfg.learning_rate)
        raise ValueError(
            f"Unsupported optimizer {name!r}. Choose 'adamw', 'sgd', or 'rmsprop'."
        )

    opt = make(cfg.name)
    if frozen_label_fn is not None:
        opt = optax.multi_transform(
            {"train": opt, "frozen": optax.set_to_zero()}, frozen_label_fn
        )
    return opt


def set_learning_rate(opt_state, lr: float):
    """Write a new LR into an inject_hyperparams optimizer state (possibly
    nested inside multi_transform)."""

    def visit(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            state.hyperparams["learning_rate"] = jax.numpy.asarray(
                lr, state.hyperparams["learning_rate"].dtype
            )
            return True
        return False

    found = _visit_states(opt_state, visit)
    if not found:
        raise ValueError("no inject_hyperparams state found in optimizer state")
    return opt_state


def get_learning_rate(opt_state) -> float:
    out = []

    def visit(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            out.append(float(state.hyperparams["learning_rate"]))
            return True
        return False

    _visit_states(opt_state, visit)
    if not out:
        raise ValueError("no learning rate found in optimizer state")
    return out[0]


def _visit_states(state, visit) -> bool:
    """DFS over optax state containers, calling visit; True if any hit.

    Attribute branches come before generic tuple iteration: optax states are
    NamedTuples (so also tuples), and e.g. multi_transform's PartitionState
    would otherwise be consumed by the tuple branch without its
    ``inner_states`` dict ever being descended into.
    """
    if visit(state):
        return True
    found = False
    if hasattr(state, "inner_states"):  # multi_transform PartitionState
        for s in state.inner_states.values():
            found |= _visit_states(s, visit)
    elif hasattr(state, "inner_state"):  # MaskedState
        found |= _visit_states(state.inner_state, visit)
    elif isinstance(state, dict):
        for s in state.values():
            found |= _visit_states(s, visit)
    elif isinstance(state, (tuple, list)):
        for s in state:
            found |= _visit_states(s, visit)
    return found


class PlateauScheduler:
    """torch ``ReduceLROnPlateau(mode='min', factor, patience)`` semantics:
    reduce LR when the monitored loss hasn't improved for > patience epochs
    (reference train_step1.py:36)."""

    def __init__(self, base_lr: float, factor: float = 0.1, patience: int = 2):
        self.lr = base_lr
        self.factor = factor
        self.patience = patience
        self.best = float("inf")
        self.num_bad = 0

    def step(self, val_loss: float) -> float:
        if val_loss < self.best:
            self.best = val_loss
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr *= self.factor
                self.num_bad = 0
        return self.lr

    def state_dict(self) -> dict:
        import math

        # JSON-safe: inf (the pristine 'best') round-trips as None
        best = self.best if math.isfinite(self.best) else None
        return {"lr": self.lr, "best": best, "num_bad": self.num_bad}

    def load_state_dict(self, sd: dict) -> None:
        self.lr = float(sd["lr"])
        self.best = float("inf") if sd.get("best") is None else float(sd["best"])
        self.num_bad = int(sd["num_bad"])


class LinearScheduler:
    """torch ``LinearLR(start_factor=1, end_factor=0, total_iters=E)``
    stepped per epoch (reference train_step1.py:38)."""

    def __init__(self, base_lr: float, total_epochs: int):
        self.base_lr = base_lr
        self.total = total_epochs
        self.epoch = 0

    def step(self, val_loss: float | None = None) -> float:
        self.epoch = min(self.epoch + 1, self.total)
        return self.base_lr * (1.0 - self.epoch / self.total)

    def state_dict(self) -> dict:
        return {"epoch": self.epoch}

    def load_state_dict(self, sd: dict) -> None:
        self.epoch = int(sd["epoch"])


class ConstantScheduler:
    def __init__(self, base_lr: float):
        self.lr = base_lr

    def step(self, val_loss: float | None = None) -> float:
        return self.lr

    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, sd: dict) -> None:
        pass


def build_scheduler(cfg: SchedulerConfig, base_lr: float, total_epochs: int):
    if cfg.kind == "plateau":
        return PlateauScheduler(base_lr, cfg.factor, cfg.patience)
    if cfg.kind == "linear":
        return LinearScheduler(base_lr, total_epochs)
    if cfg.kind == "constant":
        return ConstantScheduler(base_lr)
    raise ValueError(f"Unsupported scheduler kind {cfg.kind!r}")
