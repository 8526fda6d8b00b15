"""Device-time profiling utilities.

The reference's only instrumentation is wall-clock prints every ~100 samples
(`/root/reference/train_step1.py:74-77`, SURVEY.md §5.1). This module wraps
``jax.profiler`` traces and digests them into per-op device-time summaries —
the tool that located the layout-copy bottleneck in the guided graph.

Works on backends where host-side timing is unreliable (tunneled TPUs):
device events come from the XLA trace itself.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Callable

import jax


@dataclass
class DeviceProfile:
    total_ms: float
    n_iters: int
    by_op: dict[str, float] = field(default_factory=dict)  # us per iter
    by_category: dict[str, float] = field(default_factory=dict)

    @property
    def ms_per_iter(self) -> float:
        return self.total_ms / max(self.n_iters, 1)

    def top(self, n: int = 15) -> list[tuple[str, float]]:
        return sorted(self.by_op.items(), key=lambda kv: -kv[1])[:n]

    def report(self, n: int = 15) -> str:
        lines = [
            f"device time: {self.ms_per_iter:.2f} ms/iter over {self.n_iters} iters"
        ]
        lines.append("-- by category (us/iter):")
        for k, v in sorted(self.by_category.items(), key=lambda kv: -kv[1])[:n]:
            lines.append(f"  {v:>10.0f}  {k}")
        lines.append("-- top ops (us/iter):")
        for k, v in self.top(n):
            lines.append(f"  {v:>10.0f}  {k}")
        return "\n".join(lines)


def _parse_trace(trace_dir: str, n_iters: int) -> DeviceProfile:
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    )
    if not files:
        raise FileNotFoundError(f"no trace files under {trace_dir}")
    data = json.loads(gzip.open(files[-1]).read())
    events = data.get("traceEvents", [])
    pids = {
        e.get("pid"): e.get("args", {}).get("name")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items() if n and ("TPU" in n or "GPU" in n)}
    by_op: dict[str, float] = collections.defaultdict(float)
    by_cat: dict[str, float] = collections.defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("pid") not in dev_pids or not e.get("dur"):
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            total += e["dur"]
            continue
        by_op[name] += e["dur"] / n_iters
        by_cat[name.split(".")[0]] += e["dur"] / n_iters
    return DeviceProfile(
        total_ms=total / 1e3, n_iters=n_iters, by_op=dict(by_op),
        by_category=dict(by_cat),
    )


def profile_fn(
    fn: Callable, *args, n_iters: int = 3, trace_dir: str | None = None
) -> DeviceProfile:
    """Run ``fn(*args)`` under a profiler trace and summarize device time.

    ``fn`` should be jitted; it is warmed up once (with completion forced)
    before tracing.
    """
    out = fn(*args)
    jax.block_until_ready(out)
    # force real completion (tunneled backends ack dispatch early)
    leaf = jax.tree.leaves(out)[0]
    _ = float(jax.numpy.ravel(leaf)[0])

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="nconv_trace_")
    jax.profiler.start_trace(trace_dir)
    for _i in range(n_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    _ = float(jax.numpy.ravel(leaf)[0])
    jax.profiler.stop_trace()
    return _parse_trace(trace_dir, n_iters)
