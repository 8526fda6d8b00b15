"""Training harness: jitted SPMD train/eval steps + host-side control loop.

Rebuilds the reference's script-level training
(`/root/reference/train_step1.py:24-125`, `train_step2.py`) as a reusable
library with the survey-mandated fixes (SURVEY.md §7): eval-mode validation
(the reference's step-2 validation ran BN in train mode and built grads,
`utils.py:74-93`), per-epoch checkpointing with resume, a real config layer,
and data parallelism via mesh sharding instead of ``nn.DataParallel``.
"""
from __future__ import annotations

import copy
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import depth_loss, multi_resolution_loss
from ..models import GuidedDepthNet, NConvUNet
from ..parallel import make_mesh, replicate, shard_batch
from .checkpoint import CheckpointManager
from .config import TrainConfig
from .optim import build_optimizer, build_scheduler, set_learning_rate


# ---------------------------------------------------------------------------
# Tasks: bind a model to its loss contract
# ---------------------------------------------------------------------------

class UnguidedTask:
    """Step-1 training: sparse depth -> dense depth, masked loss vs GT
    (reference train_step1.py:61-63).

    ``two_stream=True`` reproduces the VOID harness's training form
    (`void_train_step1.py:61-63`): the batch is duplicated into two streams
    through the shared network (batch concat — the intended semantics of the
    reference's two-arg step-1 call, SURVEY.md §0) and the loss reads the
    even batch rows, i.e. stream 0.
    """

    name = "unguided"
    has_batch_stats = False

    def __init__(self, model: NConvUNet | None = None, two_stream: bool = False):
        self.model = model or NConvUNet()
        self.two_stream = two_stream

    def init_variables(self, rng, batch):
        return self.model.init(rng, jnp.asarray(batch["depth"]))

    def frozen_label_fn(self):
        return None

    def _forward(self, variables, depth):
        # two_stream semantics: the reference duplicates the batch through
        # the shared network and slices estimated_depth[0::2]
        # (void_train_step1.py) — but both streams carry the SAME tensor,
        # so stream 0's rows equal the single-stream forward exactly (the
        # step-1 net has no batch-coupled ops). The duplicate half is
        # therefore never computed; two_stream and single-stream training
        # produce identical losses/gradients, at half / full cost.
        pred, _ = self.model.apply(variables, depth)
        return pred

    def loss(self, variables, batch, *, train: bool, cfg: TrainConfig):
        pred = self._forward(variables, batch["depth"])
        loss = depth_loss(
            pred, batch["gt"], use_gradient_loss=cfg.use_gradient_loss
        )
        return loss, {}

    def predict(self, variables, batch):
        return self._forward(variables, batch["depth"])


class GuidedTask:
    """Step-2 training: RGB + sparse depth -> multi-scale refined depth,
    frozen step-1, multi-resolution loss (reference train_step2.py:62-64).

    The reference feeds the *same* (rgb, depth) to both streams during
    training (`train_step2.py:62`); reproduced here.
    """

    name = "guided"
    has_batch_stats = True

    def __init__(
        self,
        model: GuidedDepthNet | None = None,
        step1_variables: dict | None = None,
    ):
        self.model = model or GuidedDepthNet()
        if (
            self.model.backend == "pallas"
            and self.model.freeze_step1
            and not self.model.fold_bn
            and not self.model.step1_aligned
        ):
            # the Trainer differentiates only the trainable subtree, so the
            # frozen step 1 can run its fast aligned graph during training
            self.model = self.model.clone(step1_aligned=True)
        self.step1_variables = step1_variables

    def init_variables(self, rng, batch):
        rgb = jnp.asarray(batch["rgb"])
        d = jnp.asarray(batch["depth"])
        variables = self.model.init(rng, rgb, d, rgb, d)
        if self.step1_variables is not None:
            # the reference ctor loads the step-1 checkpoint into the frozen
            # submodule (models/step2.py:29-36)
            params = dict(variables["params"])
            params["step1"] = self.step1_variables["params"]
            variables = {**variables, "params": params}
        return variables

    def frozen_label_fn(self):
        def label(params):
            return {k: ("frozen" if k == "step1" else "train") for k in params}

        return label

    def loss(self, variables, batch, *, train: bool, cfg: TrainConfig):
        # The reference feeds the SAME (rgb, depth) into both streams and
        # the loss reads stream 0 only (train_step2.py:62-64), so the
        # duplicated stream-1 half of the batch is exact dead compute — the
        # single-stream form (rgb1=depth1=None) is bit-equivalent (see
        # GuidedDepthNet.__call__) and halves the backbone cost of every
        # train and validation step.
        rgb, d = batch["rgb"], batch["depth"]
        if train:
            (s0, _), mutated = self.model.apply(
                variables, rgb, d, None, None, True, mutable=["batch_stats"]
            )
        else:
            s0, _ = self.model.apply(variables, rgb, d, None, None, False)
            mutated = {}
        loss = multi_resolution_loss(
            s0,
            batch["gt"],
            use_gradient_loss=cfg.use_gradient_loss,
            batch_reduce=cfg.batch_reduce,
        )
        return loss, mutated

    def predict(self, variables, batch):
        rgb, d = batch["rgb"], batch["depth"]
        s0, _ = self.model.apply(variables, rgb, d, None, None, False)
        return s0[-1]


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

@dataclass
class FitResult:
    best_variables: dict
    best_val_loss: float
    history: dict = field(default_factory=dict)


class Trainer:
    def __init__(
        self,
        task,
        cfg: TrainConfig,
        mesh=None,
        checkpoints: CheckpointManager | None = None,
        log_fn: Callable[[str], None] = print,
    ):
        self.task = task
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(n_data=1)
        self.checkpoints = checkpoints
        self.log = log_fn
        self.tx = build_optimizer(cfg.optimizer, task.frozen_label_fn())
        self._train_step = None
        self._eval_step = None

    # -- jitted steps ------------------------------------------------------

    def _make_steps(self):
        """Raw (unjitted) train/eval step functions — reused by the
        mesh-parallel grid search, which vmaps them over a cell axis."""
        task, cfg, tx = self.task, self.cfg, self.tx

        def train_step(params, batch_stats, opt_state, batch):
            # differentiate ONLY the trainable subtree: frozen submodules
            # (the guided net's step-1) enter the loss as constants, so no
            # JVP is ever traced into them — their forward can run the
            # non-differentiable fast aligned kernels, and the optimizer
            # sees exact zero grads for them (same multi_transform masking
            # semantics as before)
            label_fn = task.frozen_label_fn()
            label = label_fn(params) if label_fn is not None else {}
            frozen = {k: params[k] for k, v in label.items() if v == "frozen"}
            train_p = {k: v for k, v in params.items() if k not in frozen}

            def loss_fn(tp):
                variables = {"params": {**tp, **frozen}}
                if task.has_batch_stats:
                    variables["batch_stats"] = batch_stats
                return task.loss(variables, batch, train=True, cfg=cfg)

            (loss, mutated), grads_t = jax.value_and_grad(
                loss_fn, has_aux=True
            )(train_p)
            grads = {**grads_t, **jax.tree.map(jnp.zeros_like, frozen)}
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_stats = mutated.get("batch_stats", batch_stats)
            return new_params, new_stats, new_opt_state, loss

        def eval_step(params, batch_stats, batch):
            variables = {"params": params}
            if task.has_batch_stats:
                variables["batch_stats"] = batch_stats
            loss, _ = task.loss(variables, batch, train=False, cfg=cfg)
            return loss

        return train_step, eval_step

    def _build_steps(self):
        train_step, eval_step = self._make_steps()
        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        self._eval_step = jax.jit(eval_step)

    # -- state -------------------------------------------------------------

    def init_state(self, rng, sample_batch):
        variables = self.task.init_variables(rng, self._device_batch(sample_batch))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        params, batch_stats, opt_state = replicate(
            (params, batch_stats, opt_state), self.mesh
        )
        return {"params": params, "batch_stats": batch_stats, "opt_state": opt_state}

    def _device_batch(self, batch):
        batch = {k: np.asarray(v) for k, v in batch.items() if hasattr(v, "shape")}
        return shard_batch(batch, self.mesh)

    # -- the loop ----------------------------------------------------------

    def fit(
        self,
        train_loader: Callable[[], Iterable[dict]],
        val_loader: Callable[[], Iterable[dict]],
        *,
        rng=None,
        resume: bool = True,
    ) -> FitResult:
        cfg = self.cfg
        if self._train_step is None:
            self._build_steps()

        first_batch = next(iter(train_loader()))
        rng = rng if rng is not None else jax.random.key(cfg.seed)
        state = self.init_state(rng, first_batch)

        sched = build_scheduler(
            cfg.scheduler, cfg.optimizer.learning_rate, cfg.epochs
        )
        history: dict[str, list] = {"train_loss": [], "val_loss": [], "lr": []}
        start_epoch = 0
        best_val = float("inf")
        best_vars = None
        num_bad = 0

        if resume and self.checkpoints is not None:
            latest = self.checkpoints.latest_epoch()
            if latest is not None:
                restored_state, meta = self.checkpoints.restore(
                    latest, template=jax.tree.map(np.asarray, state)
                )
                state = replicate(restored_state, self.mesh)
                history = meta["history"]
                best_val = float(meta["best_val"])
                start_epoch = latest + 1
                # scheduler + early-stop state continue where they left off
                # (a fresh PlateauScheduler would reset the decayed LR and
                # the bad-epoch counter on its first post-resume step)
                if meta.get("sched") is not None:
                    sched.load_state_dict(meta["sched"])
                num_bad = int(meta.get("num_bad", 0))
                best_vars = self.checkpoints.load_best_variables()
                self.log(f"[resume] continuing from epoch {start_epoch}")

        t_start = time.time()
        for epoch in range(start_epoch, cfg.epochs):
            # ---- train sweep (batches staged onto the device ahead of
            # consumption: H2D overlaps the current step's compute)
            losses = []
            t_step = time.time()
            from ..data.pipeline import prefetch_to_device

            for i, batch in enumerate(
                prefetch_to_device(train_loader(), self._device_batch)
            ):
                (
                    state["params"],
                    state["batch_stats"],
                    state["opt_state"],
                    loss,
                ) = self._train_step(
                    state["params"], state["batch_stats"], state["opt_state"], batch
                )
                losses.append(loss)
                if cfg.log_every and i % cfg.log_every == 0 and i > 0:
                    self.log(
                        f"[epoch {epoch}] batch {i} loss {float(loss):.4f} "
                        f"({time.time() - t_step:.2f}s)"
                    )
                    t_step = time.time()
                if cfg.dump_images_every and i % cfg.dump_images_every == 0:
                    self._dump_images(state, batch, epoch, i)
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

            # ---- validation (eval mode + no grads — fixes the reference's
            # step-2 validation bug, utils.py:74-93); staged ahead like the
            # train sweep so H2D overlaps the current batch's eval
            val_losses = [
                float(self._eval_step(state["params"], state["batch_stats"], b))
                for b in prefetch_to_device(val_loader(), self._device_batch)
            ]
            val_loss = float(np.mean(val_losses)) if val_losses else float("nan")

            if cfg.nan_policy == "raise" and not (
                np.isfinite(train_loss) and np.isfinite(val_loss)
            ):
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch}: train={train_loss} "
                    f"val={val_loss}; last good checkpoint is epoch "
                    f"{epoch - 1 if epoch else 'none'}"
                )

            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)

            if val_loss < best_val:
                best_val = val_loss
                best_vars = jax.tree.map(np.asarray, self._variables(state))
                if self.checkpoints is not None:
                    self.checkpoints.save_best_variables(best_vars)
                num_bad = 0
            else:
                num_bad += 1

            # ---- schedule + early stop (reference train_step1.py:97-114)
            lr = sched.step(val_loss)
            set_learning_rate(state["opt_state"], lr)
            history["lr"].append(lr)
            self.log(
                f"[epoch {epoch}] train {train_loss:.4f} val {val_loss:.4f} "
                f"lr {lr:.2e}"
            )

            if self.checkpoints is not None and (
                (epoch + 1) % cfg.checkpoint_every == 0 or epoch == cfg.epochs - 1
            ):
                self.checkpoints.save(
                    epoch,
                    jax.tree.map(np.asarray, state),
                    meta={
                        "history": history,
                        "best_val": best_val,
                        "sched": sched.state_dict(),
                        "num_bad": num_bad,
                    },
                )

            if cfg.early_stopping and num_bad >= (
                cfg.scheduler.patience + cfg.early_stop_extra
            ):
                self.log(f"[early stop] epoch {epoch}")
                break

        self.log(
            f"training took {(time.time() - t_start) / 60:.2f} min; "
            f"best val {best_val:.4f}"
        )
        if best_vars is None:
            best_vars = jax.tree.map(np.asarray, self._variables(state))
        return FitResult(best_vars, best_val, history)

    def _variables(self, state):
        variables = {"params": state["params"]}
        if self.task.has_batch_stats:
            variables["batch_stats"] = state["batch_stats"]
        return variables

    def _dump_images(self, state, batch, epoch: int, batch_idx: int) -> None:
        """Training-time visual debug dumps: colormapped prediction / sparse
        input / GT of batch element 0 (the reference's eyeball-regression
        mechanism, `train_step1.py:73-81` -> `utils.py:12-16`)."""
        import os

        from ..utils import save_depth

        os.makedirs(self.cfg.image_dir, exist_ok=True)
        # jit once: an op-by-op forward costs ~2ms per dispatch on tunneled
        # TPU backends, stalling the train loop for seconds per dump
        if not hasattr(self, "_jit_predict"):
            self._jit_predict = jax.jit(self.task.predict)
        pred = np.asarray(self._jit_predict(self._variables(state), batch))
        stem = os.path.join(
            self.cfg.image_dir, f"{self.cfg.run_name}_e{epoch}_b{batch_idx}"
        )
        save_depth(pred[0], stem + "_out.png")
        save_depth(np.asarray(batch["depth"])[0], stem + "_sparse.png")
        save_depth(np.asarray(batch["gt"])[0], stem + "_gt.png")


def grid_search(
    task_factory: Callable[[], Any],
    cfg: TrainConfig,
    grid,
    train_loader,
    val_loader,
    mesh=None,
    log_fn: Callable[[str], None] = print,
    checkpoint_dir: str | None = None,
):
    """LR x WD sweep, returns (best FitResult, best lr, best wd) — the
    reference's outer loop (train_step1.py:140-163).

    With ``checkpoint_dir`` set the sweep is resumable: each cell trains
    under its own per-epoch CheckpointManager, finished cells are recorded
    in ``grid_results.json`` (and skipped on rerun), and a cell killed
    mid-training resumes from its latest epoch. The reference's sweep lost
    everything on a crash (it saved once, after the whole grid,
    train_step1.py:172).
    """
    import json
    import os

    results_path = (
        os.path.join(checkpoint_dir, "grid_results.json") if checkpoint_dir else None
    )
    done: dict[str, dict] = {}
    if results_path and os.path.isfile(results_path):
        with open(results_path) as f:
            done = json.load(f)

    best: FitResult | None = None
    best_lr = best_wd = None
    best_cell: str | None = None
    for lr in grid.learning_rates:
        for wd in grid.weight_decays:
            cell = f"lr{lr:g}_wd{wd:g}"
            if cell in done:
                log_fn(f"[grid] {cell}: already complete (val "
                       f"{done[cell]['best_val_loss']:.4f}), skipping")
                result = FitResult(None, float(done[cell]["best_val_loss"]),
                                   done[cell].get("history", {}))
            else:
                run_cfg = cfg.replace(
                    optimizer=cfg.optimizer.__class__(
                        name=cfg.optimizer.name,
                        learning_rate=lr,
                        weight_decay=wd,
                        momentum=cfg.optimizer.momentum,
                    )
                )
                log_fn(f"[grid] lr={lr} wd={wd}")
                ckpts = (
                    CheckpointManager(
                        os.path.join(checkpoint_dir, cell),
                        keep=cfg.keep_checkpoints,
                    )
                    if checkpoint_dir
                    else None
                )
                trainer = Trainer(
                    task_factory(), run_cfg, mesh=mesh, checkpoints=ckpts,
                    log_fn=log_fn,
                )
                result = trainer.fit(
                    train_loader, val_loader, resume=checkpoint_dir is not None
                )
                if results_path:
                    done[cell] = {
                        "lr": lr,
                        "wd": wd,
                        "best_val_loss": result.best_val_loss,
                        "history": result.history,
                    }
                    with open(results_path, "w") as f:
                        json.dump(done, f)
            if best is None or result.best_val_loss < best.best_val_loss:
                best, best_lr, best_wd, best_cell = result, lr, wd, cell
    if best is not None and best.best_variables is None and checkpoint_dir:
        # winner was a previously-completed cell — its best model is on disk
        best.best_variables = CheckpointManager(
            os.path.join(checkpoint_dir, best_cell)
        ).load_best_variables()
        if best.best_variables is None:
            # grid_results.json says the cell finished but its saved model is
            # gone (cleaned dir / copied json) — fail fast with the remedy
            # instead of crashing hours later in save_best(None)
            raise FileNotFoundError(
                f"grid cell '{best_cell}' is marked complete in "
                f"{results_path} but {checkpoint_dir}/{best_cell}/"
                "best_variables is missing; delete the cell's entry from "
                "grid_results.json to re-train it"
            )
    return best, best_lr, best_wd
