"""Training harness tests: optimizers/schedulers match torch semantics,
loss decreases on synthetic data, freezing works, checkpoint/resume works
(the e2e synthetic-frame CPU config, BASELINE.json config #1)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from nconv_tpu.training import (
    CheckpointManager,
    GuidedTask,
    LinearScheduler,
    OptimizerConfig,
    PlateauScheduler,
    SchedulerConfig,
    TrainConfig,
    Trainer,
    UnguidedTask,
    build_optimizer,
    get_learning_rate,
    set_learning_rate,
)

RNG = np.random.default_rng(0)
H, W = 48, 64


def synth_batch(b=2):
    truth = np.fromfunction(
        lambda n, i, j, c: 2 + np.sin(i / 10) + np.cos(j / 12), (b, H, W, 1)
    ).astype(np.float32)
    mask = (RNG.random((b, H, W, 1)) < 0.15).astype(np.float32)
    return {
        "rgb": RNG.random((b, H, W, 3)).astype(np.float32),
        "depth": truth * mask,
        "gt": truth,
    }


def loader(n_batches=3, b=2):
    batches = [synth_batch(b) for _ in range(n_batches)]

    def it():
        return iter(batches)

    return it


# ---------------------------------------------------------------------------
# schedulers
# ---------------------------------------------------------------------------

def test_plateau_scheduler_matches_torch():
    torch = pytest.importorskip("torch")
    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.SGD(lin.parameters(), lr=1.0)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.1, patience=2
    )
    ours = PlateauScheduler(1.0, factor=0.1, patience=2)
    losses = [5.0, 4.0, 4.5, 4.6, 4.7, 4.8, 3.0, 3.5, 3.6, 3.7, 3.8]
    for loss in losses:
        ref.step(loss)
        got = ours.step(loss)
        assert abs(got - opt.param_groups[0]["lr"]) < 1e-12, loss


def test_linear_scheduler_matches_torch():
    torch = pytest.importorskip("torch")
    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.SGD(lin.parameters(), lr=2.0)
    ref = torch.optim.lr_scheduler.LinearLR(
        opt, start_factor=1.0, end_factor=0, total_iters=10
    )
    ours = LinearScheduler(2.0, total_epochs=10)
    for _ in range(12):
        ref.step()
        got = ours.step()
        assert abs(got - opt.param_groups[0]["lr"]) < 1e-9


@pytest.mark.parametrize("name", ["adamw", "sgd", "rmsprop"])
def test_optimizer_step_matches_torch(name):
    """One optimizer step on identical params/grads must match torch."""
    torch = pytest.importorskip("torch")
    w0 = RNG.standard_normal((4, 3)).astype(np.float32)
    g = RNG.standard_normal((4, 3)).astype(np.float32)
    lr, wd = 1e-2, 1e-3

    p_t = torch.nn.Parameter(torch.tensor(w0.copy()))
    if name == "adamw":
        opt_t = torch.optim.AdamW([p_t], lr=lr, weight_decay=wd)
    elif name == "sgd":
        opt_t = torch.optim.SGD([p_t], lr=lr, weight_decay=wd, momentum=0.9)
    else:
        opt_t = torch.optim.RMSprop([p_t], lr=lr, weight_decay=wd, momentum=0.9)
    for _ in range(3):
        opt_t.zero_grad()
        p_t.grad = torch.tensor(g.copy())
        opt_t.step()

    tx = build_optimizer(OptimizerConfig(name, lr, wd))
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    grads = {"w": jnp.asarray(g)}
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), p_t.detach().numpy(), rtol=2e-4, atol=1e-6
    )


def test_set_learning_rate_roundtrip():
    tx = build_optimizer(OptimizerConfig("adamw", 1e-2, 0.0))
    state = tx.init({"w": jnp.zeros(3)})
    assert abs(get_learning_rate(state) - 1e-2) < 1e-8  # f32 storage
    set_learning_rate(state, 5e-4)
    assert abs(get_learning_rate(state) - 5e-4) < 1e-8


def test_bad_optimizer_name_raises():
    with pytest.raises(ValueError, match="Unsupported optimizer"):
        build_optimizer(OptimizerConfig("adagrad"))


# ---------------------------------------------------------------------------
# end-to-end training (CPU synthetic, BASELINE config #1)
# ---------------------------------------------------------------------------

def quiet(_msg):
    pass


def test_unguided_training_loss_decreases(tmp_path):
    cfg = TrainConfig(
        epochs=3,
        batch_size=2,
        optimizer=OptimizerConfig("adamw", 1e-2, 1e-7),
        scheduler=SchedulerConfig("plateau"),
        log_every=0,
    )
    trainer = Trainer(UnguidedTask(), cfg, log_fn=quiet)
    result = trainer.fit(loader(4), loader(2), resume=False)
    h = result.history["train_loss"]
    assert h[-1] < h[0]
    assert np.isfinite(result.best_val_loss)


def test_guided_training_updates_and_freezes_step1():
    cfg = TrainConfig(
        epochs=1,
        batch_size=1,
        optimizer=OptimizerConfig("adamw", 1e-3, 1e-7),
        log_every=0,
    )
    task = GuidedTask()
    trainer = Trainer(task, cfg, log_fn=quiet)
    batches = loader(2, b=1)
    first = next(iter(batches()))
    state = trainer.init_state(jax.random.key(0), first)
    step1_before = jax.tree.map(np.asarray, state["params"]["step1"])
    other_before = jax.tree.map(np.asarray, state["params"]["fuse3"])

    trainer._build_steps()
    batch = trainer._device_batch(first)
    new_params, new_stats, new_opt, loss = trainer._train_step(
        state["params"], state["batch_stats"], state["opt_state"], batch
    )
    assert np.isfinite(float(loss))
    # step1 frozen: bitwise unchanged
    for a, b in zip(
        jax.tree.leaves(step1_before), jax.tree.leaves(new_params["step1"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the rest trains
    changed = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(other_before), jax.tree.leaves(new_params["fuse3"])
        )
    ]
    assert any(changed)


def test_guided_task_uses_pretrained_step1():
    task0 = UnguidedTask()
    b = synth_batch(1)
    v1 = task0.init_variables(jax.random.key(7), b)
    task = GuidedTask(step1_variables=v1)
    v2 = task.init_variables(jax.random.key(0), b)
    for a, c in zip(
        jax.tree.leaves(v1["params"]), jax.tree.leaves(v2["params"]["step1"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_checkpoint_resume(tmp_path):
    cfg = TrainConfig(
        epochs=2,
        batch_size=2,
        optimizer=OptimizerConfig("adamw", 1e-2, 1e-7),
        log_every=0,
        checkpoint_every=1,
    )
    tr = loader(3)
    va = loader(1)
    ckpts = CheckpointManager(str(tmp_path / "ck"), keep=2)
    trainer = Trainer(UnguidedTask(), cfg, checkpoints=ckpts, log_fn=quiet)
    r1 = trainer.fit(tr, va, resume=False)
    assert ckpts.latest_epoch() == 1

    # resume into more epochs: starts from epoch 2, not from scratch
    cfg2 = cfg.replace(epochs=3)
    msgs = []
    trainer2 = Trainer(
        UnguidedTask(), cfg2, checkpoints=ckpts, log_fn=msgs.append
    )
    r2 = trainer2.fit(tr, va, resume=True)
    assert any("resume" in m for m in msgs)
    assert len(r2.history["val_loss"]) == 3  # 2 restored + 1 new
    ckpts.close()


def test_nan_watchdog_raises():
    """Failure detection: a diverged (non-finite) loss aborts with a clear
    error instead of silently training on garbage (SURVEY.md §5.3)."""
    cfg = TrainConfig(
        epochs=2,
        batch_size=2,
        optimizer=OptimizerConfig("adamw", 1e10, 0.0),  # guaranteed blow-up
        log_every=0,
    )
    bad = synth_batch(2)
    bad["gt"] = bad["gt"] * np.inf  # poison the target
    trainer = Trainer(UnguidedTask(), cfg, log_fn=quiet)
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        trainer.fit(lambda: iter([bad]), lambda: iter([bad]), resume=False)
