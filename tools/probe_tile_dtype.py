"""Measure the windowed kernel's f32-vs-bf16 TILE-payload ratio (ADVICE r3:
the windowed gate's per-tile ns constants were calibrated on f32 tile
streams; under the auto-bf16 payload the A-tile DMA halves, so the gate may
be too conservative). The measured ratio feeds the itemsize scaling in
ops/dispatch's windowed gate.

grid-1M merged windowed plan, f32 state, tile payload forced f32 vs
bfloat16 (unit weights are exactly representable, so results are
bit-identical), fori-differenced.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import grid_graph
from arrow_matrix_tpu.parallel.local import compile_single_chip, state_cols
from arrow_matrix_tpu.utils.profiling import sync

ITERS = 30
K = 16

A = grid_graph(1000)
decomp = arrow_decomposition(A, 25_000, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
nnz = sum(int(l.matrix.nnz) for l in decomp)

out = {}
for name, mdt in (("tiles-f32", np.float32), ("tiles-bf16", jnp.bfloat16)):
    plan, step = compile_single_chip(decomp, 25_000, k_hint=K,
                                     matrix_dtype=mdt)
    fmt = plan.levels[0].fmt if hasattr(plan, "levels") else "region"
    cols = state_cols(plan, K) if hasattr(plan, "levels") else K
    rng = np.random.default_rng(0)
    x0 = np.zeros((plan.padded_rows, cols), dtype=np.float32)
    x0[:, :K] = rng.random((plan.padded_rows, K), dtype=np.float32)
    run = jax.jit(
        lambda p, v, it: lax.fori_loop(0, it, lambda i, s: step(p, s), v),
        static_argnums=2,
    )
    pd = jax.device_put(plan)
    xj = jnp.asarray(x0)
    sync(run(pd, xj, 1)); sync(run(pd, xj, ITERS))
    t1s, tns = [], []
    for _ in range(3):
        tic = time.perf_counter(); sync(run(pd, xj, 1)); t1s.append(time.perf_counter() - tic)
        tic = time.perf_counter(); sync(run(pd, xj, ITERS)); tns.append(time.perf_counter() - tic)
    dtm = max((np.median(tns) - np.median(t1s)) / (ITERS - 1), 1e-9)
    out[name] = {"fmt": fmt, "step_ms": dtm * 1e3, "nnz_per_s": nnz / dtm}
    print(name, json.dumps(out[name]), flush=True)

print(json.dumps({"metric": "window_tile_dtype_probe", "variants": out}))
