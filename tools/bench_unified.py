"""Race the unified windowed kernel (one grid, straddlers via conditional
manual DMA) against the two-kernel path (window + aliased-accumulate
residual stream) on the merged grid operator.

Usage: tools/bench_unified.py [side] [k]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import grid_graph
from arrow_matrix_tpu.io.graphio import as_csr
from arrow_matrix_tpu.ops.bsr_pallas import (
    bsr_spmm_window,
    windowed_bsr_from_csr,
    window_padded_rows,
)
from arrow_matrix_tpu.parallel.local import merge_levels_to_matrix
from arrow_matrix_tpu.plan.compile import pad_permutation
from arrow_matrix_tpu.plan.refine import rcm_refine_merged
from arrow_matrix_tpu.utils.profiling import sync

SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 128
ITERS = 30

A = grid_graph(SIDE)
n = A.shape[0]
width = n // 8 + 1
decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
mats = [as_csr(d[0]) for d in decomp]
perms = [np.asarray(d[1], dtype=np.int64) for d in decomp]
q = max(1, -(-n // width))
padded = [pad_permutation(p, q * width) for p in perms]
inv0 = np.argsort(padded[0])
Bt, cut = merge_levels_to_matrix(mats, padded, inv0, width, q)
Bt, padded, _ = rcm_refine_merged(Bt, padded, "always")
nnz = Bt.nnz
rng = np.random.default_rng(0)
xs_host = rng.standard_normal((Bt.shape[1], K)).astype(np.float32)
ref = Bt @ xs_host

for label, kw in [("two-kernel", {}), ("unified", {"unified": True})]:
    m = windowed_bsr_from_csr(Bt, **kw)
    b = m.inner
    H = window_padded_rows(m)
    xh = np.zeros((H, K), np.float32)
    xh[: Bt.shape[1]] = xs_host
    x = jnp.asarray(xh)
    dm = jax.device_put(m)
    run = jax.jit(
        lambda m, x, i: jax.lax.fori_loop(
            0, i, lambda _, v: bsr_spmm_window(m, v, raw=True, out_rows=H), x
        ),
        static_argnums=2,
    )
    try:
        y = np.asarray(run(dm, x, 1))
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        continue
    err = np.abs(y[: Bt.shape[0]] - ref).max() / np.abs(ref).max()
    sync(run(dm, x, ITERS))
    tic = time.perf_counter(); sync(run(dm, x, 1)); t1 = time.perf_counter() - tic
    tic = time.perf_counter(); sync(run(dm, x, ITERS)); tn = time.perf_counter() - tic
    dt = (tn - t1) / (ITERS - 1)
    res = m.residual.n_tiles if m.residual is not None else 0
    straddlers = (
        int(np.asarray(m.tiles_resid).sum())
        if m.tiles_resid is not None
        else res
    )
    print(
        f"{label:10s}: T={b.n_tiles}+{res} straddlers={straddlers} "
        f"P={b.n_programs} TB={b.tiles_per_program} RP={b.rows_per_program} "
        f"step={dt*1e3:7.2f}ms nnz/s={nnz/dt/1e6:7.1f}M relerr={err:.1e}",
        flush=True,
    )
