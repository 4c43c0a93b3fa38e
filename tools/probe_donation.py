"""Probe the windowed zero-copy step's 1.57 ms "donation copy" at grid-1M
(VERDICT r3 item 4 / NOTES "Aliased-accumulate copy").

Hypothesis: the tail-zeroing dynamic_update_slice between the window
pallas_call and the aliased-accumulate stream pallas_call materializes as a
FULL-SIZE buffer copy (520 MB r+w at ~665 GB/s = 1.56 ms). The tail rows
[group_rows, padded_rows) are never sliced into any dot (square operators:
slices end at n_col_tiles*TN <= group_rows) and never read by collect, so
leaving them uninitialized (tail="undef") is legal for the merged fast path.

Variants timed (differenced fori, state at the lane-padded 128-col width):
  zero   — current path (DUS between the two calls)
  undef  — no DUS (tail uninitialized)
  noacc  — aliasing disabled entirely (separate add pass; r3's 8.98 ms ref)
Correctness: rows [:cut] vs scipy A @ X after 1 step, for zero and undef.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import grid_graph
from arrow_matrix_tpu.ops.bsr_pallas import bsr_spmm_window
from arrow_matrix_tpu.parallel.local import compile_single_chip
from arrow_matrix_tpu.utils.profiling import sync

ITERS = 30
SIDE = 1000
WIDTH = 25_000
K = 16

A = grid_graph(SIDE)
decomp = arrow_decomposition(A, WIDTH, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
nnz = sum(int(l.matrix.nnz) for l in decomp)
plan, _ = compile_single_chip(decomp, WIDTH, k_hint=K)
lvl = plan.levels[0]
assert lvl.fmt == "window", lvl.fmt
m = lvl.mat
H = plan.padded_rows
print("padded_rows", H, "group_rows",
      m.inner.n_row_groups * m.inner.rows_per_program * m.inner.tile_m)

rng = np.random.default_rng(0)
x0 = np.zeros((H, 128), dtype=np.float32)
x0[:, :K] = rng.random((H, K), dtype=np.float32)
xj = jnp.asarray(x0)


def make_step(tail, use_acc=True):
    if use_acc:
        def step(mm, x):
            return bsr_spmm_window(mm, x, raw=True, out_rows=H, tail=tail)
    else:
        # Disable the aliased accumulate by calling the two kernels
        # separately (residual raw + explicit add), mirroring the pre-r3 path.
        from arrow_matrix_tpu.ops.bsr_pallas import bsr_spmm_stream

        def step(mm, x):
            out = bsr_spmm_window(
                mm.replace(residual=None), x, raw=True, out_rows=H, tail=tail
            )
            r = bsr_spmm_stream(mm.residual, x, raw=True, out_rows=H)
            return out + r
    return step


def timed(step):
    run = jax.jit(
        lambda mm, x, n: lax.fori_loop(0, n, lambda i, v: step(mm, v), x),
        static_argnums=2,
    )
    mm = jax.device_put(m)
    sync(run(mm, xj, 1))
    sync(run(mm, xj, ITERS))
    tic = time.perf_counter(); sync(run(mm, xj, 1)); t1 = time.perf_counter() - tic
    tic = time.perf_counter(); sync(run(mm, xj, ITERS)); tn = time.perf_counter() - tic
    return max((tn - t1) / (ITERS - 1), 1e-9)


# Correctness golden on the first step (rows [:cut], cols [:K]).
P0 = np.asarray(plan.permutations[0])
n = A.shape[0]
src = np.zeros(n, dtype=np.int64)
src[P0[P0 < n]] = np.nonzero(P0 < n)[0]
xg = x0[src][:n, :K]
want = A @ xg

out = {}
for name, tail, acc in (("zero", "zero", True), ("undef", "undef", True),
                        ("noacc", "zero", False)):
    step = make_step(tail, acc)
    y = np.asarray(jax.jit(step)(jax.device_put(m), xj))
    rel = float(np.linalg.norm(y[src][:n, :K] - want)
                / max(np.linalg.norm(want), 1e-30))
    dt = timed(step)
    out[name] = {"step_ms": dt * 1e3, "nnz_per_s": nnz / dt, "rel_err": rel}
    print(name, json.dumps(out[name]))

print(json.dumps({"metric": "grid1m_window_tail_probe", "variants": out}))
