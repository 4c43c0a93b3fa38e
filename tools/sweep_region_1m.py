"""Sweep region sizes for the 1M-vertex region executor; identify whether
per-part partial-sum traffic (lane-padded (stripe, k) intermediates) or the
gather cliff dominates."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert
from arrow_matrix_tpu.parallel.region import compile_region_plan, region_step
from arrow_matrix_tpu.utils.profiling import sync

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
WIDTH = 25_000
K = 16

A = barabasi_albert(N, 4, seed=1)
decomp = arrow_decomposition(A, WIDTH, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
nnz = sum(int(l.matrix.nnz) for l in decomp)
print(f"n={A.shape[0]} nnz={nnz} levels={len(decomp)}", flush=True)

for region_rows in (131_072, 196_608, 262_144, 393_216, 524_288):
    plan = compile_region_plan(decomp, WIDTH, k_hint=K, region_rows=region_rows)
    n_parts = sum(len(p) for p in plan.stripes)
    slots = 0
    for parts in plan.stripes:
        for m in parts:
            for leaf in jax.tree_util.tree_leaves(m):
                pass
    plan_d = jax.device_put(plan)

    def run(p, x, iters):
        return jax.lax.fori_loop(0, iters, lambda i, x: region_step(p, x), x)

    run = jax.jit(run, static_argnums=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (plan.padded_rows, K), dtype=np.float32))
    sync(run(plan_d, x, 1))
    sync(run(plan_d, x, 11))
    t0 = time.perf_counter(); sync(run(plan_d, x, 1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(run(plan_d, x, 11)); t11 = time.perf_counter() - t0
    dt = (t11 - t1) / 10
    print(f"region_rows={region_rows}: stripes={len(plan.stripes)} "
          f"parts={n_parts} step={dt*1e3:.2f} ms nnz/s={nnz/dt/1e6:.1f} M",
          flush=True)
