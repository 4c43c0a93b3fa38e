"""Window-size sweep under the bf16 STATE (grid-1M): the 256-tile auto
window was picked in the f32-state regime (round 3); with state bytes
halved the window-fetch/compute balance shifts, so re-check 128/256/512.
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
from arrow_matrix_tpu.ops.bsr_pallas import (
    bsr_spmm_window,
    window_padded_rows,
    windowed_bsr_from_csr,
)
from arrow_matrix_tpu.plan.compile import pad_permutation
from arrow_matrix_tpu.plan.refine import rcm_refine_merged
from arrow_matrix_tpu.parallel.local import merge_levels_to_matrix

ITERS = 30
K = 16

A = grid_graph(1000)
width = 25_000
decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
nnz = sum(int(l.matrix.nnz) for l in decomp)
mats = [l.matrix.tocsr() for l in decomp]
perms = [np.asarray(l.permutation, dtype=np.int64) for l in decomp]
n = A.shape[0]
q = -(-n // width)
padded = [pad_permutation(p, q * width) for p in perms]
inv0 = np.argsort(padded[0])
Bt, cut = merge_levels_to_matrix(mats, padded, inv0, width, q)
Bt, padded, applied = rcm_refine_merged(Bt, padded, "auto")
print("rcm applied:", applied, flush=True)

out = {}
for wt in (128, 256, 512):
    m = windowed_bsr_from_csr(Bt, dtype=jnp.bfloat16, window_tiles=wt)
    H = -(-max(q * width, window_padded_rows(m)) // (
        m.inner.rows_per_program * m.inner.tile_m
    )) * (m.inner.rows_per_program * m.inner.tile_m)
    rng = np.random.default_rng(0)
    x0 = np.zeros((H, 128), dtype=np.float32)
    x0[:, :K] = rng.random((H, K), dtype=np.float32)
    xj = jnp.asarray(x0).astype(jnp.bfloat16)
    run = jax.jit(
        lambda p, v, it: lax.fori_loop(
            0, it, lambda i, s: bsr_spmm_window(p, s, raw=True, out_rows=H), v
        ),
        static_argnums=2,
    )
    mm = jax.device_put(m)
    try:
        from arrow_matrix_tpu.utils.profiling import sync

        sync(run(mm, xj, 1)); sync(run(mm, xj, ITERS))
        t1s, tns = [], []
        for _ in range(3):
            tic = time.perf_counter(); sync(run(mm, xj, 1)); t1s.append(time.perf_counter() - tic)
            tic = time.perf_counter(); sync(run(mm, xj, ITERS)); tns.append(time.perf_counter() - tic)
        dtm = max((np.median(tns) - np.median(t1s)) / (ITERS - 1), 1e-9)
        resid = 0 if m.residual is None else int(
            m.residual.tiles_data.shape[0]
        )
        out[f"wt{wt}"] = {"step_ms": dtm * 1e3, "nnz_per_s": nnz / dtm,
                          "resid_tiles": resid}
    except Exception as e:  # noqa: BLE001 — record per-size failures
        out[f"wt{wt}"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(f"wt{wt}", json.dumps(out[f"wt{wt}"]), flush=True)

print(json.dumps({"metric": "bf16_window_size_sweep", "variants": out}))
