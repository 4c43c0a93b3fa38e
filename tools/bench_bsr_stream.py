"""Streaming-X vs resident BSR kernel, and whole-matrix stream/window BSR
on the merged grid operator vs the region executor.

Phase A (calibration): ER graph sized for VMEM residency — resident and
streaming kernels on identical tiles; the ratio calibrates
``bsr_stream_ns_per_tile`` for the cost model.

Phase B (the payoff): RCM-refined merged grid-202k operator (X far beyond
residency) — one streaming-BSR launch, one WINDOWED-BSR launch (X windows
fetched ~once each instead of once per tile), and the 37-part region plan.
Each whole-matrix kernel is correctness-checked against scipy before timing.
Calibrates ``BSR_WINDOW_NS_PER_TILE`` from the windowed run.

Usage: tools/bench_bsr_stream.py [phase: a|b|both] [side] [k]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.utils.profiling import sync

PHASE = sys.argv[1] if len(sys.argv) > 1 else "both"
SIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 450
K = int(sys.argv[3]) if len(sys.argv) > 3 else 16


def bench(step, mat, x, iters=20, tag=""):
    """step(mat, x) must return an array of x's shape (iterable)."""

    def loop(mat, x, n):
        return jax.lax.fori_loop(0, n, lambda i, x: step(mat, x), x)

    loop = jax.jit(loop, static_argnums=2)
    sync(loop(mat, x, 1))
    sync(loop(mat, x, iters))
    tic = time.perf_counter()
    sync(loop(mat, x, 1))
    t1 = time.perf_counter() - tic
    tic = time.perf_counter()
    sync(loop(mat, x, iters))
    tn = time.perf_counter() - tic
    dt = max((tn - t1) / (iters - 1), 1e-9)
    print(f"{tag}: step={dt*1e3:.3f} ms", flush=True)
    return dt


if PHASE in ("a", "both"):
    from scipy import sparse
    from arrow_matrix_tpu.ops.bsr_pallas import (
        bsr_from_csr, bsr_spmm, bsr_spmm_stream,
    )

    A = sparse.random(8192, 8192, density=0.02, format="csr",
                      dtype=np.float32, random_state=3)
    mat = bsr_from_csr(A)
    print(f"A: 8192^2 d=0.02 nnz={A.nnz} tiles={mat.n_tiles}", flush=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (mat.n_col_tiles * 128, K), dtype=np.float32))
    mat = jax.device_put(mat)
    dt_r = bench(lambda m, xx: bsr_spmm(m, xx, interpret=False)[: xx.shape[0]],
                 mat, x, tag="resident")
    dt_s = bench(
        lambda m, xx: bsr_spmm_stream(m, xx, interpret=False)[: xx.shape[0]],
        mat, x, tag="stream")
    print(f"ns/tile: resident {dt_r/mat.n_tiles*1e9:.0f} "
          f"stream {dt_s/mat.n_tiles*1e9:.0f} "
          f"(ratio {dt_s/dt_r:.2f})", flush=True)

if PHASE in ("b", "both"):
    from arrow_matrix_tpu.decomposition import arrow_decomposition
    from arrow_matrix_tpu.io.generate import grid_graph
    from arrow_matrix_tpu.io.graphio import as_csr
    from arrow_matrix_tpu.ops.bsr_pallas import bsr_from_csr, bsr_spmm_stream
    from arrow_matrix_tpu.parallel.local import merge_levels_to_matrix
    from arrow_matrix_tpu.parallel.region import compile_region_plan, region_step
    from arrow_matrix_tpu.plan.compile import pad_permutation
    from arrow_matrix_tpu.plan.refine import rcm_refine_merged

    A = grid_graph(SIDE)
    n = A.shape[0]
    width = n // 8 + 1
    decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                                 block_diagonal=True, seed=2)
    nnz = sum(int(l.matrix.nnz) for l in decomp)

    mats = [as_csr(d[0]) for d in decomp]
    perms = [np.asarray(d[1], dtype=np.int64) for d in decomp]
    q = max(1, -(-n // width))
    padded = [pad_permutation(p, q * width) for p in perms]
    Bt, cut = merge_levels_to_matrix(mats, padded, np.argsort(padded[0]),
                                     width, q)
    Bt, padded, applied = rcm_refine_merged(Bt, padded, "auto")
    print(f"n={n} nnz={nnz} cut={cut} rcm_applied={applied}", flush=True)

    mat = bsr_from_csr(Bt)
    print(f"merged BSR: {mat.n_tiles} tiles, {mat.n_programs} programs",
          flush=True)
    n_pad = mat.n_col_tiles * 128
    x_h = np.random.default_rng(0).standard_normal(
        (n_pad, K)).astype(np.float32)
    ref = Bt @ x_h[: Bt.shape[1]]
    x = jnp.asarray(x_h)
    mat = jax.device_put(mat)
    y = np.asarray(bsr_spmm_stream(mat, x, interpret=False))[: Bt.shape[0]]
    err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-30)
    print(f"stream-BSR max rel err {err:.2e}", flush=True)
    dt = bench(
        lambda m, xx: bsr_spmm_stream(m, xx, interpret=False)[: xx.shape[0]],
        mat, x, tag="merged stream-BSR")
    print(f"stream-BSR nnz/s = {nnz/dt/1e6:.1f} M  "
          f"({dt/mat.n_tiles*1e9:.0f} ns/tile)", flush=True)

    from arrow_matrix_tpu.ops.bsr_pallas import (
        bsr_spmm_window, windowed_bsr_from_csr, windowed_tile_fraction,
    )

    for W, dty in ((32, np.float32), (64, np.float32), (64, jnp.bfloat16)):
        wm = windowed_bsr_from_csr(Bt, window_tiles=W, dtype=dty)
        res_t = wm.residual.n_tiles if wm.residual is not None else 0
        print(f"windowed W={W} dtype={np.dtype(dty).name}: in-window frac "
              f"{windowed_tile_fraction(Bt, W):.3f}, "
              f"{wm.inner.n_tiles} tiles + {res_t} residual", flush=True)
        wm_d = jax.device_put(wm)
        y = np.asarray(bsr_spmm_window(wm_d, x, interpret=False))[: Bt.shape[0]]
        err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-30)
        print(f"  max rel err {err:.2e}", flush=True)
        dtw = bench(
            lambda m, xx: bsr_spmm_window(m, xx, interpret=False)[: xx.shape[0]],
            wm_d, x, tag=f"  windowed W={W}")
        total_t = wm.inner.n_tiles + res_t
        print(f"  windowed nnz/s = {nnz/dtw/1e6:.1f} M  "
              f"({dtw/total_t*1e9:.0f} ns/tile)", flush=True)

    rp = jax.device_put(compile_region_plan(decomp, width, k_hint=K,
                                            region_rows=16_384))
    xr = jnp.asarray(np.random.default_rng(0).standard_normal(
        (rp.padded_rows, K), dtype=np.float32))
    dt = bench(region_step, rp, xr, tag="region")
    print(f"region nnz/s = {nnz/dt/1e6:.1f} M", flush=True)
