"""Microbenchmark: row-gather rate from lane-padded vs folded sources.

Hypothesis: the big-source gather cliff (~0.15 G rows/s at 1M rows, k=16)
is driven by the PHYSICAL source footprint — a (N, 16) f32 buffer is
lane-padded 8x (512B/row), so N=1M spans 512MB. Folding 8 logical rows
into one 128-lane physical row ((N/8, 128), dense) shrinks the footprint
to 64MB; a slot then needs take(xf, idx // 8) plus an on-the-fly one-hot
select of the idx % 8 sub-row.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.utils.profiling import sync

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
V = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
K = 16

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, K), dtype=np.float32))
xf = x.reshape(N // 8, 8 * K)
idx = jnp.asarray(rng.integers(0, N, size=V, dtype=np.int32))
val = jnp.asarray(rng.standard_normal((V,), dtype=np.float32))


def plain(x, idx, val):
    g = jnp.take(x, idx % N, axis=0)
    return (val[:, None] * g).sum(axis=0)


def folded(xf, idx, val):
    i = idx % N
    g = jnp.take(xf, i // 8, axis=0).reshape(V, 8, K)
    sel = (i % 8)[:, None] == jnp.arange(8)[None, :]
    sel = jnp.where(sel, val[:, None], 0.0)
    return jnp.einsum("vj,vjk->vk", sel, g).sum(axis=0)


def window(x, idx, val):
    # control: same gather count from a width-sized window
    g = jnp.take(x[:25_000], idx % 25_000, axis=0)
    return (val[:, None] * g).sum(axis=0)


def timeit(fn, *args):
    # idx + t makes the gather loop-carried so XLA cannot hoist it.
    f1 = jax.jit(lambda a, i, v: fn(a, i, v))
    fr = jax.jit(
        lambda a, i, v: jax.lax.fori_loop(
            0, 6, lambda t, acc: acc + fn(a, i + t, v), jnp.zeros((K,), jnp.float32)
        )
    )
    sync(f1(*args)); sync(fr(*args))
    t0 = time.perf_counter(); sync(f1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(fr(*args)); t6 = time.perf_counter() - t0
    dt = (t6 - t1) / 5
    return dt


for name, fn, a in [("plain", plain, x), ("folded", folded, xf), ("window", window, x)]:
    dt = timeit(fn, a, idx, val)
    print(f"{name:7s} {dt*1e3:8.2f} ms   {V/dt/1e9:6.3f} G rows/s", flush=True)
