"""Mesh-parallel LR x WD grid search.

The reference trains its hyperparameter grid cell by cell
(`/root/reference/train_step1.py:140-163`): an outer Python loop over
(lr, wd), each cell a full serial training run. The cells are INDEPENDENT
— same data, same graph, different scalar hyperparameters — which on TPU
is a mapping problem, not a loop: stack every cell's train state along a
leading axis, ``jax.vmap`` the jitted train step over that axis, and shard
the cell axis across the mesh's ``data`` devices. One compiled executable
then trains the WHOLE grid per batch, each device carrying its own cells
with zero cross-device communication.

AdamW's learning rate and weight decay already live in the optimizer
*state* (``optim.build_optimizer`` wraps ``optax.inject_hyperparams``), so
the vmapped state axis carries per-cell hyperparameters for free — no
retracing, no per-cell executables, and the host-side plateau scheduler
writes per-cell LR arrays back into the stacked state between epochs.

Semantics match ``trainer.grid_search`` cell-for-cell (same init seed per
cell, same step math, same plateau schedule); equality is pinned on the
8-device CPU mesh in tests/test_training.py. Early stopping is per-cell
*tracking* only (best val + best variables per cell) — all cells run the
full epoch budget, since they execute in lockstep inside one program.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel import make_mesh
from .config import TrainConfig
from .optim import _visit_states, build_scheduler
from .trainer import FitResult, Trainer


def _largest_divisor_leq(n: int, cap: int) -> int:
    d = min(n, cap)
    while n % d:
        d -= 1
    return d


def _set_hyperparam_array(opt_state, name: str, values: jnp.ndarray) -> None:
    """Write a per-cell (n,) array into every inject_hyperparams slot
    carrying ``name`` (the stacked state's scalars became (n,) arrays)."""

    def visit(state):
        if hasattr(state, "hyperparams") and name in state.hyperparams:
            state.hyperparams[name] = values.astype(
                state.hyperparams[name].dtype
            )
            return True
        return False

    _visit_states(opt_state, visit)


def parallel_grid_search(
    task_factory: Callable[[], Any],
    cfg: TrainConfig,
    grid,
    train_loader,
    val_loader,
    mesh=None,
    log_fn: Callable[[str], None] = print,
):
    """Train every (lr, wd) cell simultaneously; returns the same
    ``(best FitResult, best_lr, best_wd)`` contract as ``grid_search``.

    ``mesh`` defaults to a fresh mesh over the largest divisor of the cell
    count that fits the available devices (cells must shard evenly).
    """
    cells = [
        (lr, wd) for lr in grid.learning_rates for wd in grid.weight_decays
    ]
    n = len(cells)
    if mesh is None:
        d = _largest_divisor_leq(n, len(jax.devices()))
        mesh = make_mesh(n_data=d, devices=jax.devices()[:d])

    task = task_factory()
    trainer = Trainer(task, cfg, mesh=make_mesh(n_data=1), log_fn=log_fn)
    train_step, eval_step = trainer._make_steps()

    cell_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    # one shared init (grid_search inits every cell from cfg.seed too)
    first = next(iter(train_loader()))
    batch0 = {
        k: np.asarray(v) for k, v in first.items() if hasattr(v, "shape")
    }
    variables = task.init_variables(jax.random.key(cfg.seed), batch0)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = trainer.tx.init(params)

    def stack(tree):
        return jax.tree.map(
            lambda x: jax.device_put(
                jnp.stack([jnp.asarray(x)] * n), cell_sharding
            ),
            tree,
        )

    params_s, stats_s, opt_s = stack(params), stack(batch_stats), stack(opt_state)
    lrs = np.asarray([c[0] for c in cells], np.float32)
    wds = np.asarray([c[1] for c in cells], np.float32)
    _set_hyperparam_array(opt_s, "learning_rate", jnp.asarray(lrs))
    _set_hyperparam_array(opt_s, "weight_decay", jnp.asarray(wds))

    vstep = jax.jit(jax.vmap(train_step, in_axes=(0, 0, 0, None)),
                    donate_argnums=(0, 1, 2))
    veval = jax.jit(jax.vmap(eval_step, in_axes=(0, 0, None)))

    def put_batch(batch):
        batch = {
            k: np.asarray(v) for k, v in batch.items() if hasattr(v, "shape")
        }
        return jax.tree.map(lambda x: jax.device_put(x, rep), batch)

    scheds = [
        build_scheduler(cfg.scheduler, lr, cfg.epochs) for (lr, _wd) in cells
    ]
    history = {
        f"lr{lr:g}_wd{wd:g}": {"train_loss": [], "val_loss": [], "lr": []}
        for (lr, wd) in cells
    }
    best_val = np.full(n, np.inf)
    best_state: list[Any] = [None] * n

    for epoch in range(cfg.epochs):
        train_losses = []
        for batch in train_loader():
            b = put_batch(batch)
            params_s, stats_s, opt_s, loss = vstep(
                params_s, stats_s, opt_s, b
            )
            train_losses.append(np.asarray(loss))
        val_losses = [
            np.asarray(veval(params_s, stats_s, put_batch(b)))
            for b in val_loader()
        ]
        train_l = (
            np.mean(train_losses, axis=0) if train_losses
            else np.full(n, np.nan)
        )
        val_l = (
            np.mean(val_losses, axis=0) if val_losses else np.full(n, np.nan)
        )

        improved = val_l < best_val
        if improved.any():
            # host snapshot of the improved cells' variables (cheap for the
            # model zoo here; fetched once per improving epoch)
            host_p = jax.tree.map(np.asarray, params_s)
            host_s = jax.tree.map(np.asarray, stats_s)
            for i in np.flatnonzero(improved):
                best_val[i] = val_l[i]
                v = {"params": jax.tree.map(lambda x: x[i], host_p)}
                if task.has_batch_stats:
                    v["batch_stats"] = jax.tree.map(lambda x: x[i], host_s)
                best_state[i] = v

        new_lrs = np.asarray(
            [s.step(float(v)) for s, v in zip(scheds, val_l)], np.float32
        )
        _set_hyperparam_array(opt_s, "learning_rate", jnp.asarray(new_lrs))
        for i, (lr, wd) in enumerate(cells):
            h = history[f"lr{lr:g}_wd{wd:g}"]
            h["train_loss"].append(float(train_l[i]))
            h["val_loss"].append(float(val_l[i]))
            h["lr"].append(float(new_lrs[i]))
        log_fn(
            f"[pgrid epoch {epoch}] val "
            + " ".join(f"{v:.4f}" for v in val_l)
        )

    i_best = int(np.argmin(best_val))
    lr, wd = cells[i_best]
    result = FitResult(
        best_state[i_best], float(best_val[i_best]),
        history[f"lr{lr:g}_wd{wd:g}"],
    )
    result.history = {**result.history, "cells": history}
    return result, lr, wd
