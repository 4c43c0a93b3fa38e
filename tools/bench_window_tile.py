"""Hardware sweep: windowed-BSR tile height (tile_m) on the banded family.

Host analysis (tools/../tile_study, NOTES round-3) shows the RCM'd grid
operator's (128,128) tiles are 0.8% dense; thinner tiles halve the A-tile
payload (grid-1M: 2.04 GB -> 1.09 GB at tile_m=8) at the cost of 8.5x the
tile/program count. This sweep races tile_m on the real chip to find where
the DMA-size/overhead tradeoff lands.

Usage: tools/bench_window_tile.py [side] [k] [tile_m[:TB[:RP]] ...]

Each spec may pin the program shape, e.g. ``128:32:4`` races tile_m=128
with tiles_per_program=32, rows_per_program=4 against the auto chooser.
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

SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 450
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def parse_spec(s):
    parts = [int(p) for p in s.split(":")]
    return (parts + [None, None])[:3]  # (tile_m, TB, RP)


SPECS = [parse_spec(a) for a in sys.argv[3:]] or [
    (tm, None, None) for tm in (8, 16, 32, 64, 128)
]
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
Bt, padded, applied = rcm_refine_merged(Bt, padded, "always")
nnz = Bt.nnz
print(f"n={n} nnz={nnz} rcm={applied}", flush=True)

rng = np.random.default_rng(0)
xs_host = rng.standard_normal((Bt.shape[1], K)).astype(np.float32)
ref = Bt @ xs_host

for tm, tb, rp in SPECS:
    try:
        m = windowed_bsr_from_csr(Bt, tile_m=tm, tiles_per_program=tb,
                                  rows_per_program=rp)
    except Exception as e:  # pack-time rejection
        print(f"tile_m={tm}: pack failed: {e}", flush=True)
        continue
    b = m.inner
    H = window_padded_rows(m)
    xh = np.zeros((H, 128), np.float32)
    xh[: Bt.shape[1], :K] = xs_host
    x = jnp.asarray(xh)
    res_tiles = m.residual.n_tiles if m.residual is not None else 0
    payload = (b.n_tiles + res_tiles) * tm * 128 * 4 / 1e6

    # The packed matrix rides as a jit ARGUMENT: closing over it inlines
    # the tile payload as HLO constants and the relay's remote_compile
    # rejects the body (HTTP 413).
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
        print(f"tile_m={tm}: compile/run failed: {type(e).__name__} {e}",
              flush=True)
        continue
    err = np.abs(y[: Bt.shape[0], :K] - ref).max() / np.abs(ref).max()
    sync(run(dm, x, ITERS))
    tic = time.perf_counter(); sync(run(dm, x, 1)); t1 = time.perf_counter() - tic
    tic = time.perf_counter(); sync(run(dm, x, ITERS)); tn = time.perf_counter() - tic
    dt = (tn - t1) / (ITERS - 1)
    print(
        f"tile_m={tm:3d}: T={b.n_tiles}+{res_tiles} P={b.n_programs} "
        f"TB={b.tiles_per_program} RP={b.rows_per_program} "
        f"payload={payload:7.1f}MB step={dt*1e3:7.2f}ms "
        f"nnz/s={nnz/dt/1e6:7.1f}M relerr={err:.1e}",
        flush=True,
    )
