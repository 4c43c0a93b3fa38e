"""Gather-rate cliff: source size, folding, and index pattern (v5e)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.utils.profiling import sync

N = 1_000_000
V = 4_000_000
K = 16

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, K), dtype=np.float32))
idx = jnp.asarray(rng.integers(0, N, size=V, dtype=np.int32))
idx_sorted = jnp.sort(idx)
# band-local: monotone ramp + jitter, the merged band's realistic pattern
band = jnp.asarray(
    (np.arange(V) * (N / V) + rng.integers(-500, 500, size=V)).clip(0, N - 1
    ).astype(np.int32)
)
val = jnp.asarray(rng.standard_normal((V,), dtype=np.float32))


def timeit(fn, *args):
    f1 = jax.jit(fn)
    fr = jax.jit(
        lambda a, i, v: jax.lax.fori_loop(
            0, 6, lambda t, acc: acc + fn(a, i + t, v), jnp.zeros((K,), jnp.float32)
        )
    )
    sync(f1(*args)); sync(fr(*args))
    t0 = time.perf_counter(); sync(f1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(fr(*args)); t6 = time.perf_counter() - t0
    return (t6 - t1) / 5


def report(name, dt):
    print(f"{name:24s} {dt*1e3:8.2f} ms   {V/dt/1e9:6.3f} G rows/s", flush=True)


def plain(xs, i, v):
    g = jnp.take(xs, i % xs.shape[0], axis=0)
    return (v[:, None] * g).sum(axis=0)


for rows in (25_000, 100_000, 200_000, 400_000, 1_000_000):
    report(f"plain src={rows}", timeit(plain, x[:rows], idx, val))

report("plain src=1M sorted", timeit(plain, x, idx_sorted, val))
report("plain src=1M band", timeit(plain, x, band, val))


def folded(xf, i, v):
    n = xf.shape[0] * 8
    i = i % n
    g = jnp.take(xf, i // 8, axis=0).reshape(V, 8, K)
    sel = (i % 8)[:, None] == jnp.arange(8)[None, :]
    sel = jnp.where(sel, v[:, None], 0.0)
    return jnp.einsum("vj,vjk->vk", sel, g).sum(axis=0)


for rows in (200_000, 1_000_000):
    xf = x[:rows].reshape(rows // 8, 8 * K)
    report(f"folded src={rows}", timeit(folded, xf, idx, val))

xf = x.reshape(N // 8, 8 * K)
report("folded src=1M sorted", timeit(folded, xf, idx_sorted, val))
report("folded src=1M band", timeit(folded, xf, band, val))
