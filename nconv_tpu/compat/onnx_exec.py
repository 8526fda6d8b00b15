"""Minimal ONNX executor for the exported deployment graph.

The reference's artifact is consumed by a robot-side ONNX Runtime session
(`/root/reference/export_to_onnx.py:57-74`); this environment ships no
`onnx`/`onnxruntime` wheel, so "the artifact executes" would otherwise be
untestable here. This module EXECUTES the serialized ModelProto bytes
directly: a self-contained protobuf wire-format parser (extending the
field set of :func:`.onnx_export.read_onnx_summary`) plus eager numpy/JAX
implementations of exactly the op set the exporter emits (enumerated by
test_onnx_artifact_contract): Add, BatchNormalization, Cast, Concat,
Constant, Conv, ConvTranspose, Div, Gather, Greater, Identity, MaxPool,
Mul, ReduceSum, Relu, Reshape, Resize, Shape, Slice, Unsqueeze.

It is a *validation* interpreter (eager, unoptimized, NCHW) — deployment
still targets ONNX Runtime; `selftest_guided_onnx` uses this as the
fallback numeric check wherever the ORT wheel is absent.
"""
from __future__ import annotations

import numpy as np

from .onnx_export import _iter_fields, _varint

__all__ = ["load_onnx_graph", "run_onnx", "OnnxGraph"]

# TensorProto.DataType -> numpy
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32, 7: np.int64,
    9: np.bool_, 10: np.float16, 11: np.float64, 12: np.uint32, 13: np.uint64,
}


def _parse_tensor(buf) -> np.ndarray:
    dims: list[int] = []
    data_type = 1
    raw = None
    float_data: list[float] = []
    int_data: list[int] = []
    for field, wire, val in _iter_fields(buf):
        if field == 1:  # dims (varint, possibly repeated)
            if wire == 0:
                dims.append(val)
            else:  # packed
                i = 0
                while i < len(val):
                    v, i = _varint(val, i)
                    dims.append(v)
        elif field == 2 and wire == 0:
            data_type = val
        elif field == 4:  # float_data
            if wire == 5:
                float_data.append(np.frombuffer(val, "<f4")[0])
            elif wire == 2:
                float_data.extend(np.frombuffer(bytes(val), "<f4"))
        elif field in (5, 7):  # int32_data / int64_data
            if wire == 0:
                int_data.append(val)
            elif wire == 2:
                i = 0
                while i < len(val):
                    v, i = _varint(val, i)
                    int_data.append(v)
        elif field == 9 and wire == 2:  # raw_data
            raw = bytes(val)
    dt = _DTYPES[data_type]
    shape = tuple(dims)
    if raw is not None:
        return np.frombuffer(raw, dt).reshape(shape).copy()
    if float_data:
        return np.asarray(float_data, dt).reshape(shape)
    if int_data:
        # varint-decoded negatives arrive as Python ints >= 2**63 (2^64
        # complements); normalize BEFORE np.asarray — int64 would overflow
        a = np.asarray(
            [v - (1 << 64) if v >= 1 << 63 else v for v in int_data], np.int64
        )
        return a.astype(dt).reshape(shape)
    return np.zeros(shape, dt)


def _parse_attr(buf) -> tuple[str, object]:
    name = ""
    f = i_ = s = t = None
    floats: list[float] = []
    ints: list[int] = []
    for field, wire, val in _iter_fields(buf):
        if field == 1 and wire == 2:
            name = bytes(val).decode()
        elif field == 2 and wire == 5:
            f = float(np.frombuffer(val, "<f4")[0])
        elif field == 3 and wire == 0:
            i_ = val if val < 1 << 63 else val - (1 << 64)
        elif field == 4 and wire == 2:
            s = bytes(val)
        elif field == 5 and wire == 2:
            t = _parse_tensor(val)
        elif field == 7:
            if wire == 5:
                floats.append(float(np.frombuffer(val, "<f4")[0]))
            elif wire == 2:
                floats.extend(np.frombuffer(bytes(val), "<f4").tolist())
        elif field == 8:
            if wire == 0:
                ints.append(val if val < 1 << 63 else val - (1 << 64))
            elif wire == 2:
                j = 0
                while j < len(val):
                    v, j = _varint(val, j)
                    ints.append(v if v < 1 << 63 else v - (1 << 64))
    for v in (t, f, i_, s):
        if v is not None:
            return name, v
    if floats:
        return name, floats
    return name, ints


class OnnxGraph:
    def __init__(self):
        self.nodes: list[dict] = []
        self.initializers: dict[str, np.ndarray] = {}
        self.inputs: list[str] = []
        self.outputs: list[str] = []


def load_onnx_graph(path: str) -> OnnxGraph:
    with open(path, "rb") as fh:
        data = memoryview(fh.read())
    graph = None
    for field, wire, val in _iter_fields(data):
        if field == 7 and wire == 2:  # ModelProto.graph
            graph = val
    if graph is None:
        raise ValueError(f"{path}: not an ONNX ModelProto")
    g = OnnxGraph()
    for field, wire, val in _iter_fields(graph):
        if field == 1 and wire == 2:  # node
            node = {"inputs": [], "outputs": [], "op": "", "attrs": {}}
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1 and w2 == 2:
                    node["inputs"].append(bytes(v2).decode())
                elif f2 == 2 and w2 == 2:
                    node["outputs"].append(bytes(v2).decode())
                elif f2 == 4 and w2 == 2:
                    node["op"] = bytes(v2).decode()
                elif f2 == 5 and w2 == 2:
                    k, v = _parse_attr(v2)
                    node["attrs"][k] = v
            g.nodes.append(node)
        elif field == 5 and wire == 2:  # initializer
            name = ""
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 8 and w2 == 2:
                    name = bytes(v2).decode()
            g.initializers[name] = _parse_tensor(val)
        elif field == 11 and wire == 2:
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1 and w2 == 2:
                    g.inputs.append(bytes(v2).decode())
        elif field == 12 and wire == 2:
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1 and w2 == 2:
                    g.outputs.append(bytes(v2).decode())
    g.inputs = [n for n in g.inputs if n not in g.initializers]
    return g


# ---------------------------------------------------------------------------
# Eager op implementations (NCHW)
# ---------------------------------------------------------------------------

def _conv(x, w, b, attrs, transpose=False):
    import jax.numpy as jnp
    from jax import lax

    groups = int(attrs.get("group", 1))
    strides = tuple(attrs.get("strides", [1, 1]))
    dil = tuple(attrs.get("dilations", [1, 1]))
    pads = attrs.get("pads", [0, 0, 0, 0])
    pt, pl, pb, pr = (int(p) for p in pads)
    if not transpose:
        out = lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w),
            window_strides=strides,
            padding=((pt, pb), (pl, pr)),
            rhs_dilation=dil,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=groups,
        )
    else:
        # ONNX ConvTranspose W is (Cin, Cout/g, kH, kW); equivalent direct
        # conv: flip spatial taps, swap I/O, dilate the input by stride,
        # pad with (k-1-p) on each side (output_padding defaults 0 — the
        # exporter emits none for this graph)
        assert groups == 1, "grouped ConvTranspose not emitted by this graph"
        kh, kw = w.shape[2], w.shape[3]
        wf = jnp.asarray(w[:, :, ::-1, ::-1]).transpose(1, 0, 2, 3)
        out = lax.conv_general_dilated(
            jnp.asarray(x), wf,
            window_strides=(1, 1),
            padding=(
                ((kh - 1) * dil[0] - pt, (kh - 1) * dil[0] - pb),
                ((kw - 1) * dil[1] - pl, (kw - 1) * dil[1] - pr),
            ),
            lhs_dilation=strides,
            rhs_dilation=dil,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
    if b is not None:
        out = out + jnp.asarray(b).reshape(1, -1, 1, 1)
    return np.asarray(out)


def _maxpool(x, attrs):
    import jax.numpy as jnp
    from jax import lax

    kh, kw = (int(k) for k in attrs["kernel_shape"])
    strides = tuple(int(s) for s in attrs.get("strides", [kh, kw]))
    pads = attrs.get("pads", [0, 0, 0, 0])
    pt, pl, pb, pr = (int(p) for p in pads)
    if attrs.get("ceil_mode", 0):
        # extend the end padding so the last (partial) window is included
        n, c, h, w = x.shape
        pb += -(h + pt + pb - kh) % strides[0]
        pr += -(w + pl + pr - kw) % strides[1]
    neg = np.finfo(np.float32).min
    out = lax.reduce_window(
        jnp.asarray(x), neg, lax.max,
        window_dimensions=(1, 1, kh, kw),
        window_strides=(1, 1) + strides,
        padding=((0, 0), (0, 0), (pt, pb), (pl, pr)),
    )
    return np.asarray(out)


def _resize(x, sizes, scales, attrs):
    mode = attrs.get("mode", b"nearest").decode()
    coord = attrs.get(
        "coordinate_transformation_mode", b"half_pixel"
    ).decode()
    n, c, h, w = x.shape
    if sizes is not None and sizes.size:
        oh, ow = int(sizes[-2]), int(sizes[-1])
    else:
        oh, ow = int(h * scales[-2]), int(w * scales[-1])
    if mode == "nearest":
        nearest_mode = attrs.get("nearest_mode", b"round_prefer_floor").decode()
        def src(i, size_in, size_out):
            if coord == "asymmetric":
                xs = i * (size_in / size_out)
            elif coord in ("half_pixel", "pytorch_half_pixel"):
                xs = (i + 0.5) * (size_in / size_out) - 0.5
            else:
                raise NotImplementedError(coord)
            if nearest_mode == "floor":
                idx = np.floor(xs)
            elif nearest_mode == "ceil":
                idx = np.ceil(xs)
            else:  # round_prefer_floor
                idx = np.ceil(xs - 0.5)
            return np.clip(idx.astype(np.int64), 0, size_in - 1)

        iy = src(np.arange(oh), h, oh)
        ix = src(np.arange(ow), w, ow)
        return x[:, :, iy][:, :, :, ix]
    if mode == "linear":
        def grid(i, size_in, size_out):
            if coord == "align_corners":
                return i * (size_in - 1) / max(size_out - 1, 1)
            xs = (i + 0.5) * (size_in / size_out) - 0.5
            if coord == "pytorch_half_pixel" and size_out <= 1:
                xs = np.zeros_like(xs)
            return xs

        ys = np.clip(grid(np.arange(oh, dtype=np.float64), h, oh), 0, h - 1)
        xs = np.clip(grid(np.arange(ow, dtype=np.float64), w, ow), 0, w - 1)
        y0 = np.floor(ys).astype(np.int64)
        x0 = np.floor(xs).astype(np.int64)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = (ys - y0).astype(x.dtype)[None, None, :, None]
        wx = (xs - x0).astype(x.dtype)[None, None, None, :]
        a = x[:, :, y0][:, :, :, x0]
        b = x[:, :, y0][:, :, :, x1]
        cc = x[:, :, y1][:, :, :, x0]
        d = x[:, :, y1][:, :, :, x1]
        return (
            a * (1 - wy) * (1 - wx)
            + b * (1 - wy) * wx
            + cc * wy * (1 - wx)
            + d * wy * wx
        )
    raise NotImplementedError(f"Resize mode {mode}")


def run_onnx(graph_or_path, feeds: dict) -> list[np.ndarray]:
    """Execute the graph eagerly. ``feeds`` maps input names to numpy
    arrays (NCHW); returns the graph outputs in declaration order."""
    g = (
        graph_or_path
        if isinstance(graph_or_path, OnnxGraph)
        else load_onnx_graph(graph_or_path)
    )
    env: dict[str, np.ndarray] = dict(g.initializers)
    for name in g.inputs:
        env[name] = np.asarray(feeds[name])

    def get(name):
        return env[name] if name else None

    for node in g.nodes:
        op = node["op"]
        a = node["attrs"]
        ins = [get(n) for n in node["inputs"]]
        if op == "Constant":
            out = a["value"]
        elif op == "Identity":
            out = ins[0]
        elif op == "Add":
            out = ins[0] + ins[1]
        elif op == "Mul":
            out = ins[0] * ins[1]
        elif op == "Div":
            out = ins[0] / ins[1]
        elif op == "Relu":
            out = np.maximum(ins[0], 0)
        elif op == "Greater":
            out = ins[0] > ins[1]
        elif op == "Cast":
            out = np.asarray(ins[0]).astype(_DTYPES[int(a["to"])])
        elif op == "Concat":
            out = np.concatenate(ins, axis=int(a["axis"]))
        elif op == "Shape":
            out = np.asarray(np.asarray(ins[0]).shape, np.int64)
        elif op == "Gather":
            out = np.take(ins[0], ins[1], axis=int(a.get("axis", 0)))
        elif op == "Unsqueeze":
            axes = ins[1] if len(ins) > 1 else np.asarray(a["axes"])
            out = ins[0]
            for ax in sorted(int(x) for x in np.atleast_1d(axes)):
                out = np.expand_dims(out, ax)
        elif op == "Reshape":
            out = np.reshape(ins[0], [int(v) for v in ins[1]])
        elif op == "Slice":
            starts, ends = ins[1], ins[2]
            axes = (
                ins[3] if len(ins) > 3 and ins[3] is not None
                else np.arange(len(starts))
            )
            steps = (
                ins[4] if len(ins) > 4 and ins[4] is not None
                else np.ones(len(starts), np.int64)
            )
            sl = [slice(None)] * np.asarray(ins[0]).ndim
            for st, en, ax, sp in zip(starts, ends, axes, steps):
                sl[int(ax)] = slice(int(st), int(en), int(sp))
            out = np.asarray(ins[0])[tuple(sl)]
        elif op == "ReduceSum":
            axes = None
            if len(ins) > 1 and ins[1] is not None:
                axes = tuple(int(v) for v in np.atleast_1d(ins[1]))
            elif "axes" in a:
                axes = tuple(int(v) for v in a["axes"])
            out = np.sum(
                ins[0], axis=axes, keepdims=bool(a.get("keepdims", 1))
            )
        elif op == "BatchNormalization":
            x, scale, b, mean, var = ins[:5]
            eps = float(a.get("epsilon", 1e-5))
            sh = (1, -1, 1, 1)
            out = (x - mean.reshape(sh)) / np.sqrt(
                var.reshape(sh) + eps
            ) * scale.reshape(sh) + b.reshape(sh)
            out = out.astype(x.dtype)
        elif op == "Conv":
            out = _conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a)
        elif op == "ConvTranspose":
            out = _conv(
                ins[0], ins[1], ins[2] if len(ins) > 2 else None, a,
                transpose=True,
            )
        elif op == "MaxPool":
            out = _maxpool(ins[0], a)
        elif op == "Resize":
            sizes = ins[3] if len(ins) > 3 else None
            scales = ins[2] if len(ins) > 2 else None
            out = _resize(ins[0], sizes, scales, a)
        else:
            raise NotImplementedError(f"ONNX op {op}")
        outs = out if isinstance(out, tuple) else (out,)
        for name, val in zip(node["outputs"], outs):
            env[name] = val
    return [env[n] for n in g.outputs]
