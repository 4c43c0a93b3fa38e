"""bf16 STATE on the blocked (distributed-structure) executor, ba-200k:
the per-stripe slot gathers are width-bounded (index-bound plateau — no
bf16 win expected there), but the window materialization copies and the
fori carry are byte-bound, so the state dtype may still move the 152 M
number (VERDICT r3 weak #4).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert
from arrow_matrix_tpu.parallel.blocked import blocked_step, compile_blocked_plan
from arrow_matrix_tpu.utils.profiling import sync

ITERS = 30
K = 16

import sys
n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
width = 25_000
A = barabasi_albert(n, 4, seed=1)
decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
nnz = sum(int(l.matrix.nnz) for l in decomp)
plan = compile_blocked_plan(decomp, width, k_hint=K)

rng = np.random.default_rng(0)
x0 = rng.random((plan.n_blocks * plan.width, K), dtype=np.float32)
P0 = np.asarray(plan.permutations[0])

run = jax.jit(
    lambda p, v, it: lax.fori_loop(0, it, lambda i, s: blocked_step(p, s), v),
    static_argnums=2,
)
pd = jax.device_put(plan)
src = np.zeros(n, dtype=np.int64)
src[P0[P0 < n]] = np.nonzero(P0 < n)[0]
out = {}
for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
    xj = jnp.asarray(x0).astype(dt)
    y = np.asarray(run(pd, xj, 1), dtype=np.float32)
    want = A @ np.asarray(xj, dtype=np.float32)[src][:n]
    rel = float(np.abs(y[src][:n] - want).max()
                / max(np.abs(want).max(), 1e-30))
    sync(run(pd, xj, ITERS))
    t1s, tns = [], []
    for _ in range(3):
        tic = time.perf_counter(); sync(run(pd, xj, 1)); t1s.append(time.perf_counter() - tic)
        tic = time.perf_counter(); sync(run(pd, xj, ITERS)); tns.append(time.perf_counter() - tic)
    dtm = max((np.median(tns) - np.median(t1s)) / (ITERS - 1), 1e-9)
    out[name] = {"step_ms": dtm * 1e3, "nnz_per_s": nnz / dtm, "rel_err": rel}
    print(name, json.dumps(out[name]), flush=True)

print(json.dumps({"metric": "blocked_bf16_state_probe", "variants": out}))
