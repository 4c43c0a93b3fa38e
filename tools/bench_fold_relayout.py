"""How much does the (N, 16) -> (N/8, 128) fold relayout cost, and which
formulation is cheapest? Also: folded-path rate with a PRE-folded source
(the ceiling if the relayout were free)."""
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
xf0 = jnp.asarray(np.asarray(x).reshape(N // 8, 8 * K))
idx = jnp.asarray(rng.integers(0, N, size=V, dtype=np.int32))
val = jnp.asarray(rng.standard_normal((V,), dtype=np.float32))


def timeit(fn, *args, reps=6):
    # fn(x + t) makes the fold loop-carried so XLA cannot hoist it.
    # full-array .sum() consumption prevents DCE of the relayout
    f1 = jax.jit(lambda *a: fn(a[0] + 0.0, *a[1:]).sum())
    fr = jax.jit(lambda *a: jax.lax.fori_loop(
        0, reps, lambda t, acc: acc + fn(a[0] + t, *a[1:]).sum(),
        0.0))
    sync(f1(*args)); sync(fr(*args))
    t0 = time.perf_counter(); sync(f1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(fr(*args)); t6 = time.perf_counter() - t0
    return (t6 - t1) / (reps - 1)


def fold_reshape(x):
    return x.reshape(N // 8, 8 * K) * 1.0


def fold_strided(x):
    return jnp.concatenate([x[j::8] for j in range(8)], axis=1) * 1.0


def fold_3d(x):
    return (x.reshape(N // 8, 8, K) * 1.0).reshape(N // 8, 8 * K)


for name, fn in [("reshape", fold_reshape), ("strided", fold_strided),
                 ("3d", fold_3d)]:
    dt = timeit(fn, x)
    print(f"fold {name:8s} {dt*1e3:8.2f} ms", flush=True)


def folded_prefolded(xf, i, v):
    from arrow_matrix_tpu.ops.ell import _folded_select
    return _folded_select(xf, i, K, v)


def timeit_vec(fn, *args, reps=6):
    f1 = jax.jit(lambda *a: fn(*a).sum(axis=0))
    fr = jax.jit(lambda *a: jax.lax.fori_loop(
        0, reps, lambda t, acc: acc + fn(args[0], args[1] + t, *args[2:]).sum(axis=0),
        jnp.zeros((K,), jnp.float32)))
    sync(f1(*args)); sync(fr(*args))
    t0 = time.perf_counter(); sync(f1(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(fr(*args)); t6 = time.perf_counter() - t0
    return (t6 - t1) / (reps - 1)


dt = timeit_vec(folded_prefolded, xf0, idx, val)
print(f"prefolded select    {dt*1e3:8.2f} ms   {V/dt/1e9:6.3f} G rows/s", flush=True)


def plain_take(x, i, v):
    return v[:, None] * jnp.take(x, i, axis=0)


dt = timeit_vec(plain_take, x, idx, val)
print(f"plain take          {dt*1e3:8.2f} ms   {V/dt/1e9:6.3f} G rows/s", flush=True)
