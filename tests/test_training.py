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


@pytest.mark.slow
def test_guided_mixed_precision_training_tracks_f32():
    """bf16 feature convs + f32 depth path / master weights (the CLI's
    --precision bf16): params stay f32, the loss trajectory tracks the
    all-f32 step closely, and the frozen step 1 stays bitwise frozen."""
    import jax.numpy as jnp

    from nconv_tpu.models import GuidedDepthNet

    cfg = TrainConfig(
        epochs=1, batch_size=2,
        optimizer=OptimizerConfig("adamw", 1e-3, 1e-7), log_every=0,
    )
    first = synth_batch(b=2)
    losses = {}
    for tag, kw in (
        ("f32", {}),
        ("bf16", dict(dtype=jnp.bfloat16, step1_dtype=jnp.float32)),
    ):
        task = GuidedTask(GuidedDepthNet(backend="xla", **kw))
        trainer = Trainer(task, cfg, log_fn=quiet)
        state = trainer.init_state(jax.random.key(0), first)
        trainer._build_steps()
        batch = trainer._device_batch(first)
        p, s, o = state["params"], state["batch_stats"], state["opt_state"]
        step1_before = jax.tree.map(np.asarray, p["step1"])
        run = []
        for _ in range(4):
            p, s, o, loss = trainer._train_step(p, s, o, batch)
            run.append(float(loss))
        losses[tag] = run
        assert all(
            leaf.dtype == np.float32 for leaf in jax.tree.leaves(p)
        ), "master weights must stay f32"
        for a, b in zip(
            jax.tree.leaves(step1_before), jax.tree.leaves(p["step1"])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert losses["bf16"][-1] < losses["bf16"][0], losses["bf16"]
    np.testing.assert_allclose(
        losses["bf16"], losses["f32"], rtol=0.02
    )


@pytest.mark.slow
def test_guided_pallas_training_runs_step1_aligned():
    """With the pallas backend GuidedTask clones the model with
    step1_aligned=True (the frozen step 1 runs its fast aligned graph);
    the trainer differentiates only the trainable subtree, so the
    non-differentiable aligned kernels never see a JVP. Step-1 params
    stay bitwise frozen and the rest trains (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from nconv_tpu.models import GuidedDepthNet

    cfg = TrainConfig(
        epochs=1,
        batch_size=1,
        optimizer=OptimizerConfig("adamw", 1e-3, 1e-7),
        log_every=0,
    )
    task = GuidedTask(GuidedDepthNet(backend="pallas"))
    assert task.model.step1_aligned
    trainer = Trainer(task, cfg, log_fn=quiet)
    first = next(iter(loader(1, b=1)()))
    with pltpu.force_tpu_interpret_mode():
        state = trainer.init_state(jax.random.key(0), first)
        step1_before = jax.tree.map(np.asarray, state["params"]["step1"])
        other_before = jax.tree.map(np.asarray, state["params"]["fuse3"])
        trainer._build_steps()
        batch = trainer._device_batch(first)
        new_params, _, _, loss = trainer._train_step(
            state["params"], state["batch_stats"], state["opt_state"], batch
        )
        assert np.isfinite(float(loss))
        for a, b in zip(
            jax.tree.leaves(step1_before),
            jax.tree.leaves(new_params["step1"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        changed = [
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(other_before),
                jax.tree.leaves(new_params["fuse3"]),
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


def test_plateau_scheduler_state_roundtrip():
    s = PlateauScheduler(1e-2, factor=0.1, patience=2)
    # pristine state: best == inf must survive the JSON round trip
    s2 = PlateauScheduler(1e-2, factor=0.1, patience=2)
    s2.load_state_dict(s.state_dict())
    assert s2.best == float("inf")
    for v in (1.0, 1.0, 1.0, 1.0, 0.5):
        s.step(v)
    s3 = PlateauScheduler(1e-2, factor=0.1, patience=2)
    s3.load_state_dict(s.state_dict())
    assert (s3.lr, s3.best, s3.num_bad) == (s.lr, s.best, s.num_bad)
    # identical continuation
    assert s3.step(0.6) == s.step(0.6)


def test_resume_restores_scheduler_and_early_stop_state(tmp_path):
    """A resumed run must continue scheduler + early-stop state: with lr=0
    (frozen params -> exactly equal val losses) the bad-epoch counter climbs
    deterministically, so a restored counter early-stops after ONE
    post-resume epoch while a reset one would need three more."""
    cfg = TrainConfig(
        epochs=3,
        batch_size=2,
        optimizer=OptimizerConfig("adamw", 0.0, 0.0),
        scheduler=SchedulerConfig("plateau", factor=0.1, patience=0),
        log_every=0,
        checkpoint_every=1,
    )
    tr, va = loader(2), loader(1)
    ckpts = CheckpointManager(str(tmp_path / "ck"), keep=5)
    trainer = Trainer(UnguidedTask(), cfg, checkpoints=ckpts, log_fn=quiet)
    r1 = trainer.fit(tr, va, resume=False)
    # epochs 1 and 2 did not improve (equal val) -> num_bad == 2 persisted
    meta = ckpts.load_meta()
    assert meta["num_bad"] == 2
    assert meta["sched"]["best"] == pytest.approx(r1.best_val_loss)

    # resume with early stopping at threshold patience(0)+extra(3) == 3:
    # the restored counter hits 3 after one epoch; a reset one would not
    cfg2 = cfg.replace(epochs=8, early_stopping=True)
    msgs = []
    trainer2 = Trainer(UnguidedTask(), cfg2, checkpoints=ckpts, log_fn=msgs.append)
    r2 = trainer2.fit(tr, va, resume=True)
    assert any("early stop" in m for m in msgs)
    assert len(r2.history["val_loss"]) == 4  # 3 restored + 1 post-resume
    # best model from before the resume point is preserved
    assert r2.best_variables is not None
    assert r2.best_val_loss == r1.best_val_loss
    ckpts.close()


def test_dump_images_every_writes_pngs(tmp_path):
    """The reference dumps colormapped output/sparse/gt every ~100 samples
    during training (train_step1.py:73-81); the knob must produce PNGs."""
    img_dir = tmp_path / "imgs"
    cfg = TrainConfig(
        epochs=1,
        batch_size=2,
        optimizer=OptimizerConfig("adamw", 1e-2, 1e-7),
        log_every=0,
        dump_images_every=2,
        image_dir=str(img_dir),
        run_name="dbg",
    )
    trainer = Trainer(UnguidedTask(), cfg, log_fn=quiet)
    trainer.fit(loader(4), loader(1), resume=False)
    names = sorted(p.name for p in img_dir.glob("*.png"))
    # batches 0 and 2 dump out/sparse/gt each
    assert "dbg_e0_b0_out.png" in names
    assert "dbg_e0_b0_sparse.png" in names
    assert "dbg_e0_b0_gt.png" in names
    assert "dbg_e0_b2_out.png" in names
    assert len(names) == 6


def test_two_stream_unguided_task_matches_single_stream():
    """two_stream=True reproduces void_train_step1.py:61-63 (batch-concat
    through shared weights + stream-0 slice): identical loss and gradients
    to the single-stream form for the same weights."""
    b = synth_batch(2)
    cfg = TrainConfig(epochs=1, batch_size=2, log_every=0)
    t1 = UnguidedTask()
    t2 = UnguidedTask(two_stream=True)
    v = t1.init_variables(jax.random.key(3), b)
    l1, _ = t1.loss(v, {k: jnp.asarray(x) for k, x in b.items()}, train=True, cfg=cfg)
    l2, _ = t2.loss(v, {k: jnp.asarray(x) for k, x in b.items()}, train=True, cfg=cfg)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_parallel_grid_search_matches_serial(tmp_path):
    """The vmapped+sharded grid (all cells in one executable, cell axis
    over the 8-device CPU mesh) must reproduce the serial grid cell for
    cell: same per-epoch train/val losses, same winner, same plateau LR
    trajectory. 4 cells x 2 epochs, unguided task. The serial side's
    per-cell curves come from its own grid_results.json record."""
    import json

    from nconv_tpu.training import (
        GridSearchConfig, grid_search, parallel_grid_search,
    )

    cfg = TrainConfig(
        epochs=2,
        batch_size=2,
        optimizer=OptimizerConfig("adamw", 1e-2, 1e-7),
        log_every=0,
    )
    grid = GridSearchConfig(
        learning_rates=(1e-2, 1e-3), weight_decays=(1e-7, 1e-2)
    )
    tr, va = loader(2), loader(1)

    best_s, lr_s, wd_s = grid_search(
        UnguidedTask, cfg, grid, tr, va, log_fn=quiet,
        checkpoint_dir=str(tmp_path / "serial_grid"),
    )
    best_p, lr_p, wd_p = parallel_grid_search(
        UnguidedTask, cfg, grid, tr, va, log_fn=quiet
    )
    assert (lr_p, wd_p) == (lr_s, wd_s)
    np.testing.assert_allclose(
        best_p.best_val_loss, best_s.best_val_loss, rtol=1e-5
    )
    with open(tmp_path / "serial_grid" / "grid_results.json") as f:
        serial_cells = json.load(f)
    cells = best_p.history["cells"]
    assert set(cells) == set(serial_cells) and len(cells) == 4
    for name, h in cells.items():
        hs = serial_cells[name]["history"]
        np.testing.assert_allclose(h["val_loss"], hs["val_loss"], rtol=1e-5)
        np.testing.assert_allclose(
            h["train_loss"], hs["train_loss"], rtol=1e-5
        )
        np.testing.assert_allclose(h["lr"], hs["lr"], rtol=1e-6)
    # winner's variables match the serial winner's
    for a, b in zip(
        jax.tree.leaves(best_p.best_variables),
        jax.tree.leaves(best_s.best_variables),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_grid_search_resumes_without_retraining(tmp_path):
    from nconv_tpu.training import GridSearchConfig, grid_search

    cfg = TrainConfig(
        epochs=1,
        batch_size=2,
        optimizer=OptimizerConfig("adamw", 1e-2, 1e-7),
        log_every=0,
    )
    grid = GridSearchConfig(learning_rates=(1e-2, 1e-3), weight_decays=(1e-7,))
    tr, va = loader(2), loader(1)
    ckdir = str(tmp_path / "grid")

    best1, lr1, wd1 = grid_search(
        UnguidedTask, cfg, grid, tr, va, log_fn=quiet, checkpoint_dir=ckdir
    )
    assert best1.best_variables is not None

    # rerun: every cell is already recorded -> skipped, same winner, and the
    # winner's best variables come back from disk
    msgs = []
    best2, lr2, wd2 = grid_search(
        UnguidedTask, cfg, grid, tr, va, log_fn=msgs.append, checkpoint_dir=ckdir
    )
    assert sum("skipping" in m for m in msgs) == 2
    assert (lr2, wd2) == (lr1, wd1)
    assert best2.best_val_loss == best1.best_val_loss
    assert best2.best_variables is not None
    for a, c in zip(
        jax.tree.leaves(best1.best_variables), jax.tree.leaves(best2.best_variables)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
