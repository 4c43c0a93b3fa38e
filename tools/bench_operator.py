"""Time the differentiable operator's forward and backward passes on one
chip: forward = the merged local plan, backward = the transposed merged
plan (head row panel becomes head column panel — a different heavy-row
profile for the ELL chunker). On the planar family both directions compile
through the windowed zero-copy path on one aligned state layout (round 5);
the state runs lane-padded to 128 columns (physically free) so the fast
path engages, and ``bf16`` halves every dense byte stream of both passes.

Usage: tools/bench_operator.py [ba|grid] [vertices] [width] [k] [f32|bf16]
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert, grid_graph, random_dense
from arrow_matrix_tpu.parallel.operator import ArrowOperator
from arrow_matrix_tpu.utils.profiling import sync

GRAPH = sys.argv[1] if len(sys.argv) > 1 else "ba"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
WIDTH = int(sys.argv[3]) if len(sys.argv) > 3 else 25_000
K = int(sys.argv[4]) if len(sys.argv) > 4 else 16
DT = jnp.bfloat16 if (len(sys.argv) > 5 and sys.argv[5] == "bf16") else None
ITERS = 50

if GRAPH == "grid":
    A = grid_graph(int(N ** 0.5))
    N = A.shape[0]
else:
    A = barabasi_albert(N, 4, seed=1)
decomp = arrow_decomposition(A, WIDTH, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
nnz = sum(int(l.matrix.nnz) for l in decomp)
op = ArrowOperator(decomp, WIDTH, n_devices=1, k_hint=K, state_dtype=DT)
fmt = op.device_plan_f.levels[0].fmt
# Lane-padded state (zero physical cost at k <= 128) so the windowed fast
# path runs zero-copy; columns beyond K stay zero across both directions.
cols = 128 if fmt == "window" and K <= 128 else K


def make_state(seed):
    xh = np.zeros((N, cols), np.float32)
    xh[:, :K] = random_dense(N, K, seed=seed)
    return op.distribute(xh)


xs = make_state(3)
ws = make_state(4)


def timed(fn, x, *plans):
    """Differenced 1- vs N-iteration timing (relay dispatch cost ~15-40ms).
    Plans ride as jit ARGUMENTS: closing over them would inline the format
    arrays as HLO constants and blow the relay's compile body limit (413)."""
    run = jax.jit(
        lambda x, n, *p: jax.lax.fori_loop(
            0, n, lambda i, v: fn(v, *p), x, unroll=2),
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

# Correctness spot check on-device (host math in f32 — scipy cannot
# multiply bf16 operands).
got = np.asarray(op.collect(op.apply(xs)), dtype=np.float32)
err = float(np.abs(got - A @ np.asarray(op.collect(xs), dtype=np.float32)).max())
print(json.dumps({
    "metric": "arrow_operator_fwd_bwd",
    "graph": GRAPH,
    "fmt": fmt,
    "state_dtype": "bfloat16" if DT is not None else "float32",
    "nnz": nnz,
    "fwd_nnz_per_s": nnz / fwd,
    "bwd_nnz_per_s": nnz / bwd,
    "fwd_ms": fwd * 1e3,
    "bwd_ms": bwd * 1e3,
    "abs_err": err,
}))
