"""Trace the region executor on a grid family: where do the non-BSR ms go?

Usage: tools/profile_region.py [side] [region_rows] [k]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import grid_graph
from arrow_matrix_tpu.parallel.region import compile_region_plan, region_step
from arrow_matrix_tpu.utils.profiling import summarize_trace, sync

SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 450
REGION = int(sys.argv[2]) if len(sys.argv) > 2 else 16_384
K = int(sys.argv[3]) if len(sys.argv) > 3 else 16

A = grid_graph(SIDE)
n = A.shape[0]
width = n // 8 + 1
decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
nnz = sum(int(l.matrix.nnz) for l in decomp)

rp = compile_region_plan(decomp, width, k_hint=K, region_rows=REGION)
rp = jax.device_put(rp)
print(f"n={n} nnz={nnz} stripes={len(rp.stripes)} "
      f"parts={sum(len(p) for p in rp.stripes)}", flush=True)


def run(plan, x, iters):
    return jax.lax.fori_loop(0, iters, lambda i, x: region_step(plan, x), x)


run = jax.jit(run, static_argnums=2)
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (rp.padded_rows, K), dtype=np.float32))
sync(run(rp, x, 1))
sync(run(rp, x, 20))

tic = time.perf_counter(); sync(run(rp, x, 1)); t1 = time.perf_counter() - tic
tic = time.perf_counter(); sync(run(rp, x, 20)); t20 = time.perf_counter() - tic
dt = (t20 - t1) / 19
print(f"step={dt*1e3:.2f} ms  nnz/s={nnz/dt/1e6:.1f} M", flush=True)

with jax.profiler.trace("/tmp/region_trace"):
    sync(run(rp, x, 20))
for name, ms, cnt in summarize_trace("/tmp/region_trace", top=25, iters=20):
    print(f"{ms*1e3:9.1f} us x{cnt:4d}  {name}", flush=True)
