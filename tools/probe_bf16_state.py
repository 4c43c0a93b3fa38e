"""Measure the bf16 windowed STATE on hardware: halves every dense-lane
byte of the windowed step — X window fetches (520->260 MB at 1M rows),
output writebacks (514->257), and the while-loop carry copy (1.58->0.79 ms).
Products stay exact (bf16 x bf16 in the f32 accumulator); the state rounds
to bf16 once per step, the same loss class as the distributed bf16 state.

Variants at grid-1M / grid-202k: f32 state vs bf16 state, fori-differenced.
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

    P0 = np.asarray(plan.permutations[0])
    n = A.shape[0]
    src = np.zeros(n, dtype=np.int64)
    src[P0[P0 < n]] = np.nonzero(P0 < n)[0]

    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        xj = jnp.asarray(x0).astype(dt)
        run = jax.jit(
            lambda p, v, it: lax.fori_loop(
                0, it,
                lambda i, s: bsr_spmm_window(p, s, raw=True, out_rows=H),
                v),
            static_argnums=2,
        )
        mm = jax.device_put(m)
        y = np.asarray(
            jax.jit(lambda p, v: bsr_spmm_window(p, v, raw=True, out_rows=H))(
                mm, xj
            ),
            dtype=np.float32,
        )
        want = A @ np.asarray(xj, dtype=np.float32)[src][:n, :K]
        rel = float(np.abs(y[src][:n, :K] - want).max()
                    / max(np.abs(want).max(), 1e-30))
        sync(run(mm, xj, 1)); sync(run(mm, xj, ITERS))
        tic = time.perf_counter(); sync(run(mm, xj, 1)); t1 = time.perf_counter() - tic
        tic = time.perf_counter(); sync(run(mm, xj, ITERS)); tn = time.perf_counter() - tic
        dtm = max((tn - t1) / (ITERS - 1), 1e-9)
        key = f"grid-{side}sq/{name}"
        out[key] = {"step_ms": dtm * 1e3, "nnz_per_s": nnz / dtm, "rel_err": rel}
        print(key, json.dumps(out[key]), flush=True)

print(json.dumps({"metric": "window_bf16_state_probe", "variants": out}))
