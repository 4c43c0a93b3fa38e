"""Grid-family region/BSR experiment: do VMEM-sized column regions let the
Pallas MXU kernel engage on planar graphs too big for X residency?

The merged grid-202k matrix averages ~61 nnz/tile (BSR-eligible by the cost
model) but its dense operand (202k rows) overflows VMEM, so the single-chip
plan falls back to gather-ELL (~198 M nnz/s measured round 1). Region
partitioning with region_rows <= 16384 makes every part's operand
VMEM-resident, so ``build_block_format`` can pick BSR per part.

Usage: tools/bench_region_bsr.py [side] [region_rows] [k] [which]
  which: local | region | both (default both)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import grid_graph
from arrow_matrix_tpu.parallel.local import compile_local_plan, local_step
from arrow_matrix_tpu.parallel.region import compile_region_plan, region_step
from arrow_matrix_tpu.utils.profiling import sync

SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 450
REGION = int(sys.argv[2]) if len(sys.argv) > 2 else 16_384
K = int(sys.argv[3]) if len(sys.argv) > 3 else 16
WHICH = sys.argv[4] if len(sys.argv) > 4 else "both"

A = grid_graph(SIDE)
n = A.shape[0]
width = n // 8 + 1
decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
nnz = sum(int(l.matrix.nnz) for l in decomp)
print(f"n={n} nnz={nnz} levels={len(decomp)} width={width}", flush=True)


def bench(plan, step_fn, tag):
    plan = jax.device_put(plan)

    def run(plan, x, iters):
        return jax.lax.fori_loop(0, iters, lambda i, x: step_fn(plan, x), x)

    run = jax.jit(run, static_argnums=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (plan.padded_rows, K), dtype=np.float32))
    sync(run(plan, x, 1))
    sync(run(plan, x, 21))
    t0 = time.perf_counter(); sync(run(plan, x, 1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); sync(run(plan, x, 21)); t21 = time.perf_counter() - t0
    dt = (t21 - t1) / 20
    print(f"{tag}: step={dt*1e3:.2f} ms  nnz/s={nnz/dt/1e6:.1f} M", flush=True)
    return dt


if WHICH in ("local", "both"):
    lp = compile_local_plan(decomp, width, k_hint=K)
    bench(lp, local_step, "local/merged")

if WHICH in ("region", "both"):
    rp = compile_region_plan(decomp, width, k_hint=K, region_rows=REGION)
    from arrow_matrix_tpu.ops.bsr_pallas import BsrMat
    n_bsr = sum(isinstance(m, BsrMat) for parts in rp.stripes for m in parts)
    n_parts = sum(len(parts) for parts in rp.stripes)
    print(f"region plan: {len(rp.stripes)} stripes, {n_parts} parts, "
          f"{n_bsr} BSR", flush=True)
    bench(rp, region_step, f"region[{REGION}]")
