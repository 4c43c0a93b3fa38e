"""Measure the k_real (dot-width) optimization of the windowed zero-copy
step on hardware: the lane-padded 128-column state made DMA free but the MXU
dot pays per OUTPUT lane — at k=16 a 128-wide dot does 8x the useful work.

Variants at grid-1M and grid-202k (state physically 128 cols, 16 live):
  full  — dots at 128 lanes (round-3 behavior)
  kreal — dots at 16 lanes, zero-fill beyond (new fast path)
"""

import json
import sys
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
K = 16

out = {}
for side, width in ((450, 25_313), (1000, 25_000)):
    A = grid_graph(side)
    decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                                 block_diagonal=True, seed=2)
    nnz = sum(int(l.matrix.nnz) for l in decomp)
    plan, _ = compile_single_chip(decomp, width, k_hint=K)
    if plan.levels[0].fmt != "window":
        print(f"side {side}: fmt={plan.levels[0].fmt}, skip")
        continue
    m = plan.levels[0].mat
    H = plan.padded_rows
    rng = np.random.default_rng(0)
    x0 = np.zeros((H, 128), dtype=np.float32)
    x0[:, :K] = rng.random((H, K), dtype=np.float32)
    xj = jnp.asarray(x0)

    P0 = np.asarray(plan.permutations[0])
    n = A.shape[0]
    src = np.zeros(n, dtype=np.int64)
    src[P0[P0 < n]] = np.nonzero(P0 < n)[0]
    want = A @ x0[src][:n, :K]

    for name, kr in (("full", None), ("kreal", K)):
        def step(mm, x, kr=kr):
            return bsr_spmm_window(mm, x, raw=True, out_rows=H, k_real=kr)

        run = jax.jit(
            lambda p, v, it, kr=kr: lax.fori_loop(
                0, it,
                lambda i, s: bsr_spmm_window(p, s, raw=True, out_rows=H,
                                             k_real=kr),
                v),
            static_argnums=2,
        )
        mm = jax.device_put(m)
        y = np.asarray(jax.jit(step)(mm, xj))
        rel = float(np.linalg.norm(y[src][:n, :K] - want)
                    / max(np.linalg.norm(want), 1e-30))
        sync(run(mm, xj, 1)); sync(run(mm, xj, ITERS))
        tic = time.perf_counter(); sync(run(mm, xj, 1)); t1 = time.perf_counter() - tic
        tic = time.perf_counter(); sync(run(mm, xj, ITERS)); tn = time.perf_counter() - tic
        dt = max((tn - t1) / (ITERS - 1), 1e-9)
        key = f"grid-{side}sq/{name}"
        out[key] = {"step_ms": dt * 1e3, "nnz_per_s": nnz / dt, "rel_err": rel}
        print(key, json.dumps(out[key]), flush=True)

print(json.dumps({"metric": "window_kreal_probe", "variants": out}))
