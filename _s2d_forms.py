"""Microbench: s2d formulations at the enc1 aligned shape on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nconv_tpu.runtime.streaming import _force_complete

b, h, c, wp = 2, 352, 32, 1280
x = jnp.asarray(np.random.default_rng(0).random((b, h, c, wp)), jnp.bfloat16)


def timeit(name, fn, *args, n=30):
    f = jax.jit(fn)
    out = f(*args)
    _force_complete(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _force_complete(jax.tree.leaves(out)[0])
    print(f"{name}: {(time.perf_counter() - t0) / n * 1e6:.0f} us", flush=True)


def parts_current(x):
    # space_to_depth_aligned_parts: minor (W/2,2) reshape + stride-2 H slice
    v = x.reshape(b, h, c, wp // 2, 2)
    top, bot = v[:, 0::2], v[:, 1::2]
    return [top[..., 0], top[..., 1], bot[..., 0], bot[..., 1]]


def parts_6d(x):
    # 6-d reshape + unit slices only (no stride-2 slicing anywhere)
    v = x.reshape(b, h // 2, 2, c, wp // 2, 2)
    return [
        v[:, :, 0, :, :, 0], v[:, :, 0, :, :, 1],
        v[:, :, 1, :, :, 0], v[:, :, 1, :, :, 1],
    ]


def parts_rows_then_lanes(x):
    # rows first via reshape-merge (free-ish), lanes second
    v = x.reshape(b, h // 2, 2, c, wp)
    top, bot = v[:, :, 0], v[:, :, 1]
    out = []
    for r in (top, bot):
        rr = r.reshape(b, h // 2, c, wp // 2, 2)
        out += [rr[..., 0], rr[..., 1]]
    return [out[0], out[1], out[2], out[3]]


def lanes_only(x):
    # the irreducible W deinterleave alone (rows untouched)
    v = x.reshape(b, h, c, wp // 2, 2)
    return [v[..., 0], v[..., 1]]


def rows_only(x):
    v = x.reshape(b, h // 2, 2, c, wp)
    return [v[:, :, 0], v[:, :, 1]]


def interleave_stack(ev, od):
    # current depth_to_space lane merge
    return jnp.stack([ev, od], axis=-1).reshape(b, h, c, wp)


def interleave_concat_reshape(ev, od):
    return jnp.concatenate(
        [ev[..., None], od[..., None]], axis=-1
    ).reshape(b, h, c, wp)


ev = jnp.asarray(np.random.default_rng(1).random((b, h, c, wp // 2)), jnp.bfloat16)
od = jnp.asarray(np.random.default_rng(2).random((b, h, c, wp // 2)), jnp.bfloat16)

timeit("parts_current (stride-2 H)", parts_current, x)
timeit("parts_6d (unit slices)", parts_6d, x)
timeit("parts_rows_then_lanes", parts_rows_then_lanes, x)
timeit("lanes_only", lanes_only, x)
timeit("rows_only", rows_only, x)
timeit("interleave_stack", interleave_stack, ev, od)
timeit("interleave_concat_reshape", interleave_concat_reshape, ev, od)
