"""Time the differentiable operator's forward and backward passes on one
chip: forward = the merged local plan, backward = the transposed merged
plan (head row panel becomes head column panel — a different heavy-row
profile for the ELL chunker).

Usage: tools/bench_operator.py [vertices] [width] [k]
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert, random_dense
from arrow_matrix_tpu.parallel.operator import ArrowOperator
from arrow_matrix_tpu.utils.profiling import sync

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
WIDTH = int(sys.argv[2]) if len(sys.argv) > 2 else 25_000
K = int(sys.argv[3]) if len(sys.argv) > 3 else 16
ITERS = 50

A = barabasi_albert(N, 4, seed=1)
decomp = arrow_decomposition(A, WIDTH, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
nnz = sum(int(l.matrix.nnz) for l in decomp)
op = ArrowOperator(decomp, WIDTH, n_devices=1, k_hint=K)
xs = op.distribute(random_dense(N, K, seed=3))
ws = op.distribute(random_dense(N, K, seed=4))


def timed(fn, x, *plans):
    """Differenced 1- vs N-iteration timing (relay dispatch cost ~15-40ms).
    Plans ride as jit ARGUMENTS: closing over them would inline the format
    arrays as HLO constants and blow the relay's compile body limit (413)."""
    run = jax.jit(
        lambda x, n, *p: jax.lax.fori_loop(0, n, lambda i, v: fn(v, *p), x),
        static_argnums=1,
    )
    sync(run(x, 1, *plans))
    sync(run(x, ITERS, *plans))
    tic = time.perf_counter(); sync(run(x, 1, *plans)); t1 = time.perf_counter() - tic
    tic = time.perf_counter(); sync(run(x, ITERS, *plans)); tn = time.perf_counter() - tic
    return max((tn - t1) / (ITERS - 1), 1e-9)


from arrow_matrix_tpu.parallel.local import local_step

fwd = timed(lambda v, p: local_step(p, v), xs, op.device_plan_f)
# The operator's VJP is the transpose plan's step (custom_vjp); time it
# directly with the plan as an argument.
bwd = timed(lambda v, p: local_step(p, v), ws, op.device_plan_b)

# Correctness spot check on-device.
err = float(np.abs(op.collect(op.apply(xs)) - A @ op.collect(xs)).max())
print(json.dumps({
    "metric": "arrow_operator_fwd_bwd",
    "nnz": nnz,
    "fwd_nnz_per_s": nnz / fwd,
    "bwd_nnz_per_s": nnz / bwd,
    "fwd_ms": fwd * 1e3,
    "bwd_ms": bwd * 1e3,
    "abs_err": err,
}))
