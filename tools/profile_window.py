"""Trace the windowed-BSR single-chip step on a grid family: attribute the
gap between the step time and the A-tile/X-read floor.

Usage: tools/profile_window.py [side] [k]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import grid_graph
from arrow_matrix_tpu.parallel.local import compile_single_chip
from arrow_matrix_tpu.parallel.local import LocalArrowPlan
from arrow_matrix_tpu.utils.profiling import summarize_trace, sync

SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16

A = grid_graph(SIDE)
n = A.shape[0]
width = n // 8 + 1
decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
nnz = sum(int(l.matrix.nnz) for l in decomp)

plan, step_fn = compile_single_chip(decomp, width, k_hint=K)
assert isinstance(plan, LocalArrowPlan), type(plan)
lvl = plan.levels[0]
wm = lvl.mat
print(f"n={n} nnz={nnz} fmt={lvl.fmt} "
      f"T={wm.inner.n_tiles}+{wm.residual.n_tiles if wm.residual is not None else 0} "
      f"P={wm.inner.n_programs} TB={wm.inner.tiles_per_program} "
      f"RP={wm.inner.rows_per_program} W={wm.window_tiles} "
      f"n_windows={wm.n_windows} all_occ={wm.inner.all_occupied}",
      flush=True)
plan = jax.device_put(plan)


def run(plan, x, iters):
    return jax.lax.fori_loop(0, iters, lambda i, x: step_fn(plan, x), x)


run = jax.jit(run, static_argnums=2)
from arrow_matrix_tpu.parallel.local import state_cols
cols = state_cols(plan, K)
xh = np.zeros((plan.padded_rows, cols), np.float32)
xh[:, :K] = np.random.default_rng(0).standard_normal(
    (plan.padded_rows, K), dtype=np.float32)
x = jnp.asarray(xh)
sync(run(plan, x, 1))
sync(run(plan, x, 20))

tic = time.perf_counter(); sync(run(plan, x, 1)); t1 = time.perf_counter() - tic
tic = time.perf_counter(); sync(run(plan, x, 20)); t20 = time.perf_counter() - tic
dt = (t20 - t1) / 19
print(f"step={dt*1e3:.2f} ms  nnz/s={nnz/dt/1e6:.1f} M", flush=True)

with jax.profiler.trace("/tmp/window_trace"):
    sync(run(plan, x, 20))
for name, ms, cnt in summarize_trace("/tmp/window_trace", top=25, iters=20):
    print(f"{ms*1e3:9.1f} us x{cnt:4d}  {name}", flush=True)
