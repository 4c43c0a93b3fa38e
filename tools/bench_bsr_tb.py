"""Per-program overhead study for the BSR kernels.

Round-3 finding to explain: windowed grid-202k runs at 2.1 us/program
(242 ns/tile at TB=8) while the A-tile DMA floor is ~0.66 us/program, and
bf16 payloads change nothing — i.e. a fixed per-grid-step cost dominates.

Sweeps tiles_per_program (TB) and k for:
  * resident kernel on a fully-occupied ER-like matrix (pure floor)
  * windowed kernel on the RCM-refined merged grid operator

Usage: tools/bench_bsr_tb.py [resident|window|both] [side] [k]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.utils.profiling import sync

MODE = sys.argv[1] if len(sys.argv) > 1 else "both"
SIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 450
K = int(sys.argv[3]) if len(sys.argv) > 3 else 16


def bench(step, mat, x, iters=20, tag=""):
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


if MODE in ("resident", "both"):
    from scipy import sparse
    from arrow_matrix_tpu.ops.bsr_pallas import bsr_from_csr, bsr_spmm

    A = sparse.random(8192, 8192, density=0.02, format="csr",
                      dtype=np.float32, random_state=3)
    for k in (K, 128):
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (8192, k)).astype(np.float32))
        for TB in (8, 16, 32, 64):
            mat = jax.device_put(bsr_from_csr(A, tiles_per_program=TB))
            dt = bench(
                lambda m, xx: bsr_spmm(m, xx, interpret=False)[: xx.shape[0]],
                mat, x, tag=f"resident TB={TB} k={k} T={mat.n_tiles} "
                            f"P={mat.n_programs}")
            print(f"  ns/tile={dt/mat.n_tiles*1e9:.0f} "
                  f"us/prog={dt/mat.n_programs*1e6:.2f}", flush=True)

if MODE in ("window", "both"):
    from arrow_matrix_tpu.decomposition import arrow_decomposition
    from arrow_matrix_tpu.io.generate import grid_graph
    from arrow_matrix_tpu.io.graphio import as_csr
    from arrow_matrix_tpu.ops.bsr_pallas import (
        bsr_spmm_window, windowed_bsr_from_csr,
    )
    from arrow_matrix_tpu.parallel.local import merge_levels_to_matrix
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
    print(f"n={n} nnz={nnz} rcm={applied}", flush=True)
    for k in (K, 128):
        n_pad = (-(-Bt.shape[1] // 128)) * 128
        x_h = np.random.default_rng(0).standard_normal(
            (n_pad, k)).astype(np.float32)
        ref = Bt @ x_h[: Bt.shape[1]]
        x = jnp.asarray(x_h)
        for tb, rp, dty in (
            (8, 1, np.float32),      # round-2 baseline shape
            (4, 1, np.float32),      # halve pad tiles
            (8, 2, np.float32),
            (16, 4, np.float32),     # zero pad + 4x fewer programs
            (None, None, np.float32),  # auto (choose_program_shape)
            (None, None, jnp.bfloat16),
        ):
            wm = windowed_bsr_from_csr(Bt, window_tiles=64,
                                       tiles_per_program=tb,
                                       rows_per_program=rp, dtype=dty)
            res_t = wm.residual.n_tiles if wm.residual is not None else 0
            wm_d = jax.device_put(wm)
            y = np.asarray(bsr_spmm_window(wm_d, x,
                                           interpret=False))[: Bt.shape[0]]
            err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-30)
            shape = (f"TB={wm.inner.tiles_per_program} "
                     f"RP={wm.inner.rows_per_program} "
                     f"{np.dtype(dty).name}")
            dt = bench(
                lambda m, xx: bsr_spmm_window(m, xx,
                                              interpret=False)[: xx.shape[0]],
                wm_d, x,
                tag=f"window {shape} k={k} T={wm.inner.n_tiles}+{res_t} "
                    f"P={wm.inner.n_programs} err={err:.1e}")
            total_t = wm.inner.n_tiles + res_t
            print(f"  nnz/s={nnz/dt/1e6:.1f}M ns/tile={dt/total_t*1e9:.0f} "
                  f"us/prog={dt/wm.inner.n_programs*1e6:.2f}", flush=True)
