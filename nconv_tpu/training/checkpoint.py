"""Checkpointing with orbax: per-epoch, resumable.

Improvements over the reference (SURVEY.md §5.3/§5.4): it saved only once at
the very end of the whole grid search (`train_step1.py:172`), never saved
optimizer state, and had no resume path — a crash lost everything. Here
every epoch checkpoints {params, batch_stats, opt_state, epoch, history},
retained up to ``keep`` checkpoints, and training resumes from the latest.
Checkpoints are replica-free (params live once, whatever the mesh)."""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, epoch: int, state: dict, meta: dict | None = None) -> None:
        """``state``: array pytree (params/batch_stats/opt_state).
        ``meta``: JSON-serializable scalars/lists (history, best_val...)."""
        self._mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(_to_host(state)),
                meta=ocp.args.JsonSave(meta or {}),
            ),
            force=True,
        )
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, epoch: int | None = None, template: dict | None = None):
        """Returns ``(state, meta)``; state keeps ``template``'s structure
        (required to rebuild optax NamedTuple states)."""
        epoch = epoch if epoch is not None else self._mgr.latest_step()
        if epoch is None:
            return None
        args = ocp.args.Composite(
            state=ocp.args.StandardRestore(
                _to_host(template) if template is not None else None
            ),
            meta=ocp.args.JsonRestore(),
        )
        out = self._mgr.restore(epoch, args=args)
        return out["state"], out["meta"]

    def load_meta(self, epoch: int | None = None) -> dict | None:
        """Restore only the JSON meta of a checkpoint (no state template
        needed)."""
        epoch = epoch if epoch is not None else self._mgr.latest_step()
        if epoch is None:
            return None
        out = self._mgr.restore(
            epoch, args=ocp.args.Composite(meta=ocp.args.JsonRestore())
        )
        return out["meta"]

    def close(self):
        self._mgr.close()

    # -- best-model tracking (survives resume) ------------------------------

    @property
    def _best_path(self) -> str:
        return os.path.join(self.directory, "best_variables")

    def save_best_variables(self, variables: dict) -> None:
        """Persist the running best-validation model alongside the epoch
        checkpoints, so a resumed run keeps returning the true best even if
        no post-resume epoch improves."""
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(self._best_path, _to_host(variables), force=True)
        ckptr.wait_until_finished()

    def load_best_variables(self) -> dict | None:
        if not os.path.isdir(self._best_path):
            return None
        return ocp.StandardCheckpointer().restore(self._best_path)


def save_best(directory: str, name: str, variables: dict) -> str:
    """Standalone save of best-model variables (the reference's
    ``save_checkpoint`` analog, `utils.py:42-51`)."""
    path = os.path.join(os.path.abspath(directory), name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_host(variables), force=True)
    ckptr.wait_until_finished()
    return path


def load_best(path: str) -> dict:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
