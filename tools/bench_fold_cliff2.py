"""Does the FOLDED source hit its own cliff? Footprint N*64B at k=16:
1M rows = 64MB (plateau), 4M = 256MB, 16M = 1GB."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.ops.ell import _folded_select
from arrow_matrix_tpu.utils.profiling import sync

V = 4_000_000
K = 16

rng = np.random.default_rng(0)


def timeit(fn, *args, reps=6):
    f1 = jax.jit(lambda *a: fn(a[0], a[1], *a[2:]).sum(axis=0))
    fr = jax.jit(lambda *a: jax.lax.fori_loop(
        0, reps, lambda t, acc: acc + fn(a[0], a[1] + t, *a[2:]).sum(axis=0),
        jnp.zeros((K,), jnp.float32)))
    sync(f1(*args)); sync(fr(*args))
    t0 = time.perf_counter(); sync(f1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(fr(*args)); t6 = time.perf_counter() - t0
    return (t6 - t1) / (reps - 1)


for N in (1_000_000, 2_000_000, 4_000_000, 8_000_000, 16_000_000):
    xf = jnp.asarray(rng.standard_normal((N // 8, 128), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=V, dtype=np.int32))
    val = jnp.asarray(rng.standard_normal((V,), dtype=np.float32))

    def fold(xfa, i, v):
        return _folded_select(xfa, i % N, K, v)

    dt = timeit(fold, xf, idx, val)
    print(f"folded src={N:>9d} ({N*64//2**20:5d}MB) {dt*1e3:8.2f} ms  "
          f"{V/dt/1e9:6.3f} G rows/s", flush=True)
