"""Command-line interface.

The reference drives everything by hand-editing module-level globals in
`train_step1.py` / `train_step2.py` / `export_to_onnx.py` and rerunning
(`/root/reference/README.md:74-93`). Here: one CLI with subcommands.

  python -m nconv_tpu train-step1 --dataset nyu --root /data/nyu ...
  python -m nconv_tpu train-step2 --step1-checkpoint ck/step1 ...
  python -m nconv_tpu export --checkpoint ck/step2 --out model.stablehlo
  python -m nconv_tpu bench --height 352 --width 1216
  python -m nconv_tpu convert --pth ref.pth.tar --out ck/converted
"""
from __future__ import annotations

import argparse
import json
import sys


def _add_train_common(p: argparse.ArgumentParser):
    p.add_argument(
        "--dataset",
        choices=["nyu", "void", "kitti", "kitti_selval", "kitti_test", "synthetic"],
        default="synthetic",
    )
    p.add_argument("--root", default=None, help="dataset root directory")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--eval-batch-size", type=int, default=1)
    p.add_argument(
        "--dump-images-every", type=int, default=0,
        help="dump colormapped pred/sparse/gt PNGs every N train batches",
    )
    p.add_argument("--image-dir", default="tmp")
    p.add_argument("--lr", type=float, nargs="+", default=[1e-2])
    p.add_argument("--weight-decay", type=float, nargs="+", default=[1e-7])
    p.add_argument("--optimizer", choices=["adamw", "sgd", "rmsprop"], default="adamw")
    p.add_argument("--scheduler", choices=["plateau", "linear", "constant"], default="plateau")
    p.add_argument("--no-gradient-loss", action="store_true")
    p.add_argument("--apply-mask", action="store_true", default=True)
    p.add_argument("--no-apply-mask", dest="apply_mask", action="store_false")
    p.add_argument("--add-noise", action="store_true")
    p.add_argument("--early-stopping", action="store_true")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--name", default="run")
    p.add_argument("--num-workers", type=int, default=2)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--limit", type=int, default=None, help="cap dataset size (smoke runs)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--backend", choices=["auto", "xla", "pallas"], default="auto",
        help="conv backend; 'pallas' runs the fused TPU kernels in the "
             "forward (gradients via custom_vjp; faster on both training "
             "paths on v5e). 'auto' = pallas on TPU, xla elsewhere",
    )


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="nconv-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("train-step1", help="train the unguided NConv densifier")
    _add_train_common(p1)
    p1.add_argument(
        "--two-stream", action="store_true",
        help="train through the two-stream batch-concat form "
             "(reference void_train_step1.py:61-63)",
    )
    p1.add_argument(
        "--grid-parallel", action="store_true",
        help="train all lr x wd grid cells simultaneously: one vmapped "
             "executable with the cell axis sharded across mesh devices "
             "(reference trains cells serially, train_step1.py:140-163)",
    )

    p2 = sub.add_parser("train-step2", help="train the RGB-guided fusion net")
    _add_train_common(p2)
    p2.add_argument("--step1-checkpoint", default=None, help="orbax dir of step-1 best vars")
    p2.add_argument("--batch-reduce", choices=["mean", "first"], default="mean")
    p2.add_argument(
        "--precision", choices=["f32", "bf16"], default="f32",
        help="bf16 runs the RGB/fusion feature convs in bf16 while the "
             "frozen step-1 densifier, every depth tensor, the loss, and "
             "the master weights stay f32 (grads come out f32 — the casts "
             "sit inside the differentiated graph). 1.4x faster per step "
             "on v5e; loss tracks f32 to ~3 decimals. Step-1 training is "
             "all depth-path, so it has no bf16 mode",
    )

    pe = sub.add_parser(
        "export", help="export the guided net (StableHLO or deployment ONNX)"
    )
    pe.add_argument("--checkpoint", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--height", type=int, default=480)
    pe.add_argument("--width", type=int, default=640)
    pe.add_argument(
        "--batch", type=int, default=None,
        help="fixed batch size; default exports a dynamic batch axis "
             "(the reference ONNX contract, export_to_onnx.py:65-73)",
    )
    pe.add_argument(
        "--format", choices=("stablehlo", "onnx"), default="stablehlo",
        help="stablehlo = TPU-native interchange via jax.export (default); "
             "onnx = the reference's actual deployment artifact "
             "(export_to_onnx.py:57-74) via the torch mirror — needs torch, "
             "always dynamic-batch, --batch ignored",
    )
    pe.add_argument(
        "--kernel-mode", choices=("softplus", "raw"), default="softplus",
        help="(onnx) how step-1 NConv kernels become positive weights: "
             "'softplus' for models trained here (pos_fn='softplus'), 'raw' "
             "for trees converted from a reference checkpoint with "
             "kernel_mode='raw'",
    )
    pe.add_argument(
        "--selftest", action="store_true",
        help="(onnx) validate the artifact after export: always the "
             "structural wire-format check (contract I/O, opset); when the "
             "onnxruntime wheel is installed, also EXECUTE it and compare "
             "against the flax graph (<1e-4 rel RMSE)",
    )

    pb = sub.add_parser("bench", help="FPS/latency benchmark of the guided net")
    pb.add_argument("--height", type=int, default=352)
    pb.add_argument("--width", type=int, default=1216)
    pb.add_argument("--frames", type=int, default=200)
    pb.add_argument("--checkpoint", default=None)
    pb.add_argument("--backend", choices=["auto", "xla", "pallas"], default="pallas")
    pb.add_argument(
        "--pos-fn", choices=["softplus", "identity", "exp", "sigmoid", "softmax"],
        default="softplus",
        help="step-1 kernel transform; use 'identity' for checkpoints "
             "converted with --kernel-mode raw",
    )
    pb.add_argument(
        "--throughput", action="store_true",
        help="batched multi-stream bf16 throughput instead of latency",
    )
    pb.add_argument("--batch", type=int, default=8)
    pb.add_argument(
        "--train", action="store_true",
        help="measure jitted train-step ms/batch (unguided b=4 + guided b=1, "
             "reference geometry) instead of inference latency",
    )
    pb.add_argument(
        "--precision", choices=["f32", "bf16"], default="f32",
        help="with --train: run the GUIDED step mixed-precision (bf16 "
             "feature convs, f32 depth path / master weights — the "
             "train-step2 --precision bf16 recipe)",
    )

    pp = sub.add_parser("profile", help="per-op device-time profile of the guided net")
    pp.add_argument("--height", type=int, default=352)
    pp.add_argument("--width", type=int, default=1216)
    pp.add_argument("--iters", type=int, default=3)
    pp.add_argument("--checkpoint", default=None)
    pp.add_argument(
        "--pos-fn", choices=["softplus", "identity", "exp", "sigmoid", "softmax"],
        default="softplus",
    )
    pp.add_argument("--backend", choices=["xla", "pallas"], default="xla")
    pp.add_argument(
        "--mixed", action="store_true",
        help="profile the headline mixed-precision schedule (bf16 features, "
             "f32 depth path) with BN folded",
    )

    pc = sub.add_parser(
        "convert",
        help="convert a reference .pth.tar checkpoint (or, with --reverse, "
             "export one of ours back to the reference format)",
    )
    pc.add_argument("--pth", required=True,
                    help="reference .pth.tar: the input, or with --reverse "
                         "the output path")
    pc.add_argument("--out", help="destination checkpoint (forward mode)")
    pc.add_argument("--model", choices=["unguided", "guided"], default="guided")
    pc.add_argument(
        "--kernel-mode", choices=["raw", "softplus_inverse"],
        default="softplus_inverse",
        help="softplus_inverse (default) makes the converted checkpoint "
             "work with the default pos_fn='softplus' models; 'raw' keeps "
             "reference weights verbatim and requires --pos-fn identity at "
             "eval/infer/bench time. In --reverse mode the default exports "
             "the effective softplus'd kernels (what a reference checkpoint "
             "carries); 'raw' copies kernels verbatim",
    )
    pc.add_argument(
        "--reverse", action="store_true",
        help="export OUR checkpoint (--checkpoint) to a reference-format "
             ".pth.tar at --pth, ready for the reference's export_to_onnx.py "
             "(see docs/INTEROP.md)",
    )
    pc.add_argument("--checkpoint",
                    help="our checkpoint to export (reverse mode)")

    pv = sub.add_parser("eval", help="evaluate a checkpoint on a dataset")
    _add_train_common(pv)
    pv.add_argument("--checkpoint", required=True)
    pv.add_argument("--model", choices=["unguided", "guided"], default="guided")
    pv.add_argument("--split", default="val")
    pv.add_argument("--max-batches", type=int, default=None)
    pv.add_argument(
        "--pos-fn", choices=["softplus", "identity", "exp", "sigmoid", "softmax"],
        default="softplus",
    )

    pi = sub.add_parser("infer", help="densify a directory of frames")
    pi.add_argument("--checkpoint", required=True)
    pi.add_argument("--rgb-glob", default=None)
    pi.add_argument("--depth-glob", default=None)
    pi.add_argument(
        "--dataset", choices=["kitti_test", "kitti_selval", "nyu", "void"],
        default=None,
        help="read frames from a dataset loader instead of file globs "
             "(kitti_test is the gt-less 352x1216 submission split, "
             "reference dataset/kittiloader.py:160-211)",
    )
    pi.add_argument("--root", default=None, help="dataset root for --dataset")
    pi.add_argument("--split", default="val", help="split for nyu/void --dataset")
    pi.add_argument("--limit", type=int, default=None)
    pi.add_argument("--out-dir", required=True)
    pi.add_argument("--height", type=int, default=480)
    pi.add_argument("--width", type=int, default=640)
    pi.add_argument(
        "--pos-fn", choices=["softplus", "identity", "exp", "sigmoid", "softmax"],
        default="softplus",
    )
    pi.add_argument(
        "--backend", choices=["auto", "xla", "pallas"], default="auto",
        help="conv backend; 'auto' selects the fused Pallas kernels on TPU",
    )
    pi.add_argument(
        "--mixed", action="store_true",
        help="bf16 feature convs, f32 depth path (the headline engine mode)",
    )
    return ap


# ---------------------------------------------------------------------------
# dataset / loader assembly
# ---------------------------------------------------------------------------

class _SyntheticDataset:
    """In-memory synthetic sparse-depth frames (BASELINE config #1: no real
    data needed for the e2e slice)."""

    def __init__(self, n=32, height=480, width=640, seed=0):
        import numpy as np

        self.n = n
        rng = np.random.default_rng(seed)
        i, j = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
        self.truth = (
            2 + np.sin(i / 60)[None] * rng.random((n, 1, 1)) + np.cos(j / 80)[None]
        ).astype(np.float32)[..., None]
        self.masks = (rng.random((n, height, width, 1)) < 0.08).astype(np.float32)
        self.rgb = rng.random((n, height, width, 3)).astype(np.float32) * 255

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "rgb": self.rgb[i],
            "depth": self.truth[i] * self.masks[i],
            "gt": self.truth[i],
        }


class _Limited:
    def __init__(self, ds, n):
        self.ds, self.n = ds, min(n, len(ds))

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.ds[i]


def make_dataset(args, mode: str):
    from .data import (
        KITTIDataset,
        KITTISelValDataset,
        KITTITestDataset,
        NYUDataset,
        VOIDDataset,
    )

    if args.dataset == "synthetic":
        ds = _SyntheticDataset(
            n=32 if mode == "train" else 8,
            height=args.height or 480,
            width=args.width or 640,
            seed=0 if mode == "train" else 1,
        )
    elif args.dataset == "nyu":
        ds = NYUDataset(
            args.root, mode,
            getattr(args, "apply_mask", True), getattr(args, "add_noise", False),
        )
    elif args.dataset == "void":
        ds = VOIDDataset(args.root, mode, use_mask=getattr(args, "apply_mask", True))
    elif args.dataset == "kitti_selval":
        ds = KITTISelValDataset(args.root)
    elif args.dataset == "kitti_test":
        ds = KITTITestDataset(args.root)
    else:
        ds = KITTIDataset(args.root, mode)
    if args.limit:
        ds = _Limited(ds, args.limit)
    return ds


def make_loaders(args):
    from .data import Loader

    if args.dataset in ("kitti_selval", "kitti_test"):
        raise SystemExit(
            f"--dataset {args.dataset} is evaluation-only (single split"
            + (", no ground truth" if args.dataset == "kitti_test" else "")
            + "); train on 'kitti' and evaluate with `nconv-tpu eval`."
        )
    train = Loader(
        make_dataset(args, "train"),
        args.batch_size,
        shuffle=True,
        num_workers=args.num_workers,
        seed=args.seed,
    )
    val = Loader(
        make_dataset(args, "val"),
        getattr(args, "eval_batch_size", 1),
        num_workers=args.num_workers,
    )
    return (lambda: iter(train)), (lambda: iter(val))


def _train_cfg(args, batch_reduce="mean"):
    from .training import OptimizerConfig, SchedulerConfig, TrainConfig

    return TrainConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        eval_batch_size=getattr(args, "eval_batch_size", 1),
        use_gradient_loss=not args.no_gradient_loss,
        batch_reduce=batch_reduce,
        optimizer=OptimizerConfig(args.optimizer, args.lr[0], args.weight_decay[0]),
        scheduler=SchedulerConfig(args.scheduler),
        early_stopping=args.early_stopping,
        checkpoint_dir=args.checkpoint_dir,
        run_name=args.name,
        seed=args.seed,
        dump_images_every=getattr(args, "dump_images_every", 0),
        image_dir=getattr(args, "image_dir", "tmp"),
    )


# ---------------------------------------------------------------------------
# commands
# ---------------------------------------------------------------------------

def _resolve_backend(name: str) -> str:
    from .models import resolve_backend

    return resolve_backend(name)


def cmd_train_step1(args) -> int:
    from .training import (
        CheckpointManager,
        GridSearchConfig,
        Trainer,
        UnguidedTask,
        grid_search,
        save_best,
    )

    from .models import NConvUNet

    cfg = _train_cfg(args)
    train_loader, val_loader = make_loaders(args)
    grid = GridSearchConfig(args.lr, args.weight_decay)
    backend = _resolve_backend(args.backend)
    task_factory = lambda: UnguidedTask(
        NConvUNet(backend=backend), two_stream=args.two_stream
    )
    if len(args.lr) * len(args.weight_decay) > 1:
        if getattr(args, "grid_parallel", False):
            from .training import parallel_grid_search

            best, lr, wd = parallel_grid_search(
                task_factory, cfg, grid, train_loader, val_loader
            )
        else:
            best, lr, wd = grid_search(
                task_factory, cfg, grid, train_loader, val_loader,
                checkpoint_dir=f"{args.checkpoint_dir}/{args.name}_grid",
            )
        print(f"grid best: lr={lr} wd={wd} val={best.best_val_loss:.4f}")
    else:
        ckpts = CheckpointManager(
            f"{args.checkpoint_dir}/{args.name}_epochs", keep=3
        )
        trainer = Trainer(task_factory(), cfg, checkpoints=ckpts)
        best = trainer.fit(train_loader, val_loader)
    path = save_best(args.checkpoint_dir, args.name, best.best_variables)
    print(f"saved best model to {path} (val {best.best_val_loss:.4f})")
    return 0


def cmd_train_step2(args) -> int:
    from .training import (
        CheckpointManager,
        GuidedTask,
        Trainer,
        load_best,
        save_best,
    )

    step1_vars = None
    if args.step1_checkpoint:
        step1_vars = load_best(args.step1_checkpoint)
    cfg = _train_cfg(args, batch_reduce=args.batch_reduce)
    train_loader, val_loader = make_loaders(args)
    from .models import GuidedDepthNet

    ckpts = CheckpointManager(f"{args.checkpoint_dir}/{args.name}_epochs", keep=3)
    mixed = getattr(args, "precision", "f32") == "bf16"
    if mixed:
        import jax.numpy as jnp
    trainer = Trainer(
        GuidedTask(
            GuidedDepthNet(
                backend=_resolve_backend(args.backend),
                # mixed precision: bf16 feature convs, f32 depth path /
                # master weights (params are created f32 by flax; the bf16
                # casts live inside the differentiated graph so gradients
                # come out f32)
                dtype=jnp.bfloat16 if mixed else None,
                step1_dtype=jnp.float32 if mixed else None,
            ),
            step1_variables=step1_vars,
        ),
        cfg,
        checkpoints=ckpts,
    )
    best = trainer.fit(train_loader, val_loader)
    path = save_best(args.checkpoint_dir, args.name, best.best_variables)
    print(f"saved best model to {path} (val {best.best_val_loss:.4f})")
    return 0


def cmd_export(args) -> int:
    from .training import load_best

    variables = load_best(args.checkpoint)
    if args.format == "onnx":
        from .compat import export_guided_onnx, read_onnx_summary

        path = export_guided_onnx(
            variables, args.out,
            height=args.height, width=args.width,
            kernel_mode=args.kernel_mode,
        )
        s = read_onnx_summary(path)
        print(
            f"exported deployment ONNX to {path} "
            f"(opset {s['opset']}, inputs {s['inputs']}, "
            f"outputs {s['outputs']}, {s['total_weight_floats']} weight floats)"
        )
        if getattr(args, "selftest", False):
            from .compat import selftest_guided_onnx

            s = selftest_guided_onnx(
                path, variables,
                height=args.height, width=args.width,
                kernel_mode=args.kernel_mode,
            )
            if s["exec_backend"]:
                print(
                    f"selftest: structure OK; executed via "
                    f"{s['exec_backend']}, rel RMSE vs flax "
                    f"{s['exec_rel_rmse']:.3g}"
                )
            else:
                print("selftest: structure OK (no variables to execute)")
        return 0
    from .runtime import export_guided, save_exported

    exported = export_guided(
        variables, height=args.height, width=args.width, batch=args.batch
    )
    path = save_exported(exported, args.out)
    print(f"exported StableHLO graph to {path}")
    return 0


def cmd_bench(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .models import GuidedDepthNet
    from .runtime import StreamingEngine, benchmark, benchmark_throughput
    from .training import load_best

    h, w = args.height, args.width
    backend = _resolve_backend(args.backend)
    if args.train:
        return _bench_train(args, backend)
    model = GuidedDepthNet(backend=backend, step1_pos_fn=args.pos_fn)
    if args.checkpoint:
        variables = load_best(args.checkpoint)
    else:
        rng = np.random.default_rng(0)
        rgb = np.asarray(rng.random((1, h, w, 3)), np.float32)
        d = np.asarray(rng.random((1, h, w, 1)), np.float32)
        variables = GuidedDepthNet().init(jax.random.key(0), rgb, d, rgb, d)
    if args.throughput:
        # BASELINE config #5: batched multi-stream bf16 throughput — same
        # folded mixed-precision engine model bench.py measures
        from .models import maybe_fold

        tmodel, tvars = maybe_fold(
            GuidedDepthNet(
                backend=backend, dtype=jnp.bfloat16, step1_dtype=jnp.float32,
                step1_pos_fn=args.pos_fn,
            ),
            variables,
        )
        fps = benchmark_throughput(
            tvars, height=h, width=w, batch=args.batch, model=tmodel
        )
        print(json.dumps({"throughput_fps": round(fps, 2), "batch": args.batch}))
        return 0
    engine = StreamingEngine(variables, height=h, width=w, model=model)
    engine.warmup()
    stats = benchmark(engine, n_frames=args.frames)
    print(json.dumps({k: v.as_dict() for k, v in stats.items()}))
    return 0


def _bench_train(args, backend: str) -> int:
    """Jitted train-step latency: unguided (batch 4) and guided (batch 1) at
    the requested geometry — the reference's training hot loops
    (train_step1.py:61-65, train_step2.py:62-64)."""
    import time

    import jax
    import numpy as np

    from .models import GuidedDepthNet, NConvUNet
    from .runtime.streaming import _force_complete
    from .training import GuidedTask, OptimizerConfig, TrainConfig, Trainer, UnguidedTask

    h, w = args.height, args.width
    rng = np.random.default_rng(0)

    def synth(b):
        truth = np.fromfunction(
            lambda n, i, j, c: 2 + np.sin(i / 40) + np.cos(j / 60), (b, h, w, 1)
        ).astype(np.float32)
        return {
            "rgb": rng.random((b, h, w, 3)).astype(np.float32),
            "depth": truth * (rng.random((b, h, w, 1)) < 0.06),
            "gt": truth,
        }

    mixed = getattr(args, "precision", "f32") == "bf16"
    if mixed:
        import jax.numpy as jnp
    guided_model = GuidedDepthNet(
        backend=backend,
        dtype=jnp.bfloat16 if mixed else None,
        step1_dtype=jnp.float32 if mixed else None,
    )
    out = {"backend": backend, "height": h, "width": w, "precision": (
        "bf16" if mixed else "f32"
    )}
    for name, task, b in (
        ("unguided", UnguidedTask(NConvUNet(backend=backend)), 4),
        ("guided", GuidedTask(guided_model), 1),
    ):
        cfg = TrainConfig(
            epochs=1, batch_size=b, optimizer=OptimizerConfig("adamw", 1e-3, 1e-7),
            log_every=0,
        )
        trainer = Trainer(task, cfg, log_fn=lambda m: None)
        batch = trainer._device_batch(synth(b))
        state = trainer.init_state(jax.random.key(0), batch)
        trainer._build_steps()

        def step(state):
            p, s, o, loss = trainer._train_step(
                state["params"], state["batch_stats"], state["opt_state"], batch
            )
            return {"params": p, "batch_stats": s, "opt_state": o}, loss

        state, loss = step(state)  # compile
        _force_complete(loss)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = step(state)
        _force_complete(loss)
        ms = (time.perf_counter() - t0) / n * 1e3
        out[f"{name}_train_ms_per_batch"] = round(ms, 3)
        out[f"{name}_batch_size"] = b
    print(json.dumps(out))
    return 0


def cmd_profile(args) -> int:
    import jax
    import numpy as np

    from .models import GuidedDepthNet
    from .training import load_best
    from .utils import profile_fn

    import jax.numpy as jnp

    h, w = args.height, args.width
    rng = np.random.default_rng(0)
    rgb = np.asarray(rng.random((1, h, w, 3)), np.float32)
    d = np.asarray(rng.random((1, h, w, 1)), np.float32)
    if args.mixed:
        model = GuidedDepthNet(
            backend=args.backend, dtype=jnp.bfloat16, step1_dtype=jnp.float32,
            step1_pos_fn=args.pos_fn,
        )
    else:
        model = GuidedDepthNet(backend=args.backend, step1_pos_fn=args.pos_fn)
    if args.checkpoint:
        variables = load_best(args.checkpoint)
    else:
        variables = GuidedDepthNet(step1_pos_fn=args.pos_fn).init(
            jax.random.key(0), rgb, d, rgb, d
        )
    if args.mixed and variables.get("batch_stats"):
        from .models import fold_batchnorm_variables

        model = model.clone(fold_bn=True)
        variables = fold_batchnorm_variables(variables)
    fn = jax.jit(
        lambda v, r, dd: model.apply(v, r, dd, r, dd, method=GuidedDepthNet.export)
    )
    profile = profile_fn(fn, variables, rgb, d, n_iters=args.iters)
    print(profile.report())
    return 0


def cmd_convert(args) -> int:
    from .compat import (
        convert_guided_state_dict,
        convert_unguided_state_dict,
        load_pth_tar,
        save_pth_tar,
    )
    from .training import save_best

    if args.reverse:
        if not args.checkpoint:
            print("--reverse needs --checkpoint", file=sys.stderr)
            return 2
        from .training import load_best

        variables = load_best(args.checkpoint)
        # default kernel-mode symmetry: forward 'softplus_inverse' stores raw
        # params for pos_fn='softplus' models, so the reverse of that regime
        # re-applies softplus to emit the positive reference-format weights
        mode = "softplus" if args.kernel_mode == "softplus_inverse" else "raw"
        save_pth_tar(args.pth, variables, model=args.model, kernel_mode=mode)
        print(f"exported {args.checkpoint} -> {args.pth}")
        return 0
    if not args.out:
        print("forward conversion needs --out", file=sys.stderr)
        return 2
    sd = load_pth_tar(args.pth)
    if args.model == "guided":
        variables = convert_guided_state_dict(sd, kernel_mode=args.kernel_mode)
    else:
        variables = convert_unguided_state_dict(sd, kernel_mode=args.kernel_mode)
    path = save_best(*args.out.rsplit("/", 1), variables) if "/" in args.out else save_best(".", args.out, variables)
    print(f"converted {args.pth} -> {path}")
    return 0


def cmd_eval(args) -> int:
    from .data import Loader
    from .training import (
        evaluate,
        load_best,
        make_guided_predict,
        make_unguided_predict,
    )

    from .models import GuidedDepthNet, NConvUNet

    if args.dataset == "kitti_test":
        raise SystemExit(
            "kitti_test (test_depth_completion_anonymous) carries no ground "
            "truth, so there is nothing to score; produce dense maps with "
            "`nconv-tpu infer` instead."
        )
    backend = _resolve_backend(args.backend)
    variables = load_best(args.checkpoint)
    if args.model == "guided":
        predict = make_guided_predict(
            variables, GuidedDepthNet(step1_pos_fn=args.pos_fn, backend=backend)
        )
    else:
        predict = make_unguided_predict(
            variables, NConvUNet(pos_fn=args.pos_fn, backend=backend)
        )
    ds = make_dataset(args, args.split)
    loader = Loader(ds, args.batch_size, num_workers=args.num_workers)
    result = evaluate(predict, loader, max_batches=args.max_batches)
    print(json.dumps({k: round(v, 6) for k, v in result.items()}))
    return 0


def cmd_infer(args) -> int:
    import glob as globlib
    import os

    import numpy as np

    from .data import io as data_io
    from .runtime import StreamingEngine
    from .training import load_best
    from .utils import save_depth

    from .models import GuidedDepthNet

    variables = load_best(args.checkpoint)

    if args.dataset:
        if not args.root:
            raise SystemExit("--dataset requires --root")
        ds = make_dataset(args, args.split)
        n = len(ds)
        frames = (
            (ds[i]["rgb"], ds[i]["depth"][..., 0], f"{i:06d}") for i in range(n)
        )
        h, w = ds[0]["rgb"].shape[:2]
    else:
        if not (args.rgb_glob and args.depth_glob):
            raise SystemExit("provide --rgb-glob/--depth-glob or --dataset/--root")
        rgbs = sorted(globlib.glob(args.rgb_glob))
        depths = sorted(globlib.glob(args.depth_glob))
        n = len(rgbs)

        def _load(rp, dp):
            d = (
                data_io.load_depth_png16(dp)
                if dp.endswith(".png")
                else np.load(dp).astype(np.float32)
            )
            return data_io.load_rgb(rp), d, os.path.splitext(os.path.basename(rp))[0]

        frames = (_load(rp, dp) for rp, dp in zip(rgbs, depths))
        h, w = args.height, args.width

    import jax.numpy as jnp

    backend = _resolve_backend(args.backend)
    kw = (
        {"dtype": jnp.bfloat16, "step1_dtype": jnp.float32}
        if args.mixed
        else {}
    )
    engine = StreamingEngine(
        variables,
        height=h,
        width=w,
        model=GuidedDepthNet(step1_pos_fn=args.pos_fn, backend=backend, **kw),
    )
    engine.warmup()
    os.makedirs(args.out_dir, exist_ok=True)

    def _save(out, base):
        dense = np.asarray(out, np.float32)[0, :, :, 0]
        data_io.save_depth_png16(os.path.join(args.out_dir, base + "_depth.png"), dense)
        save_depth(dense, os.path.join(args.out_dir, base + "_vis.png"))

    # the deployed graph takes TWO camera streams per forward
    # (reference export_to_onnx.py:65-66) — consume frames in pairs so a
    # directory of N frames costs ceil(N/2) dispatches, not N
    done = 0
    pending = None
    for frame in frames:
        if pending is None:
            pending = frame
            continue
        (r0, d0, b0), (r1, d1, b1) = pending, frame
        pending = None
        out0, out1 = engine(r0, d0, r1, d1)
        _save(out0, b0)
        _save(out1, b1)
        done += 2
        print(f"[{done}/{n}] {b0} {b1}")
    if pending is not None:
        rgb, d, base = pending
        out0, _ = engine(rgb, d, rgb, d)
        _save(out0, base)
        done += 1
        print(f"[{done}/{n}] {base}")
    return 0


COMMANDS = {
    "train-step1": cmd_train_step1,
    "train-step2": cmd_train_step2,
    "export": cmd_export,
    "bench": cmd_bench,
    "convert": cmd_convert,
    "profile": cmd_profile,
    "eval": cmd_eval,
    "infer": cmd_infer,
}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return COMMANDS[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
