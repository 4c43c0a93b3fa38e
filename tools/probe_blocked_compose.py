"""Measure composed forward routing in the blocked executor on hardware
(VERDICT r3 item 6): compose_routing=True folds the level->level-0 routing
into the stripe formats' column indices, dropping the per-level assembly
gather at the cost of kernel gathers whose source is the full state buffer
(on the plateau at 200k rows; the reasoning that killed composition in
round 2 applied to 1M-row sources).

Configs: ba-200k (the BENCH headline's distributed row) composed vs not.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert, random_dense
from arrow_matrix_tpu.parallel.blocked import blocked_step, compile_blocked_plan
from arrow_matrix_tpu.utils.profiling import sync

ITERS = 30
N, WIDTH, K = 200_000, 25_000, 16

A = barabasi_albert(N, 4, seed=1)
decomp = arrow_decomposition(A, WIDTH, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
nnz = sum(int(l.matrix.nnz) for l in decomp)

out = {}
for compose in (False, True):
    plan = compile_blocked_plan(decomp, WIDTH, k_hint=K,
                                compose_routing=compose)
    perm0 = np.asarray(plan.permutations[0])
    X = random_dense(N, K, seed=3)
    Xp = np.zeros((plan.n_blocks * plan.width, K), dtype=np.float32)
    Xp[:N] = X
    x = jnp.asarray(Xp[perm0])

    y = np.asarray(jax.jit(blocked_step)(jax.device_put(plan), x))
    inv = np.argsort(perm0)
    want = A @ X
    rel = float(np.linalg.norm(y[inv][:N] - want)
                / max(np.linalg.norm(want), 1e-30))

    run = jax.jit(
        lambda p, v, it: lax.fori_loop(0, it, lambda i, s: blocked_step(p, s), v),
        static_argnums=2,
    )
    dp = jax.device_put(plan)
    sync(run(dp, x, 1)); sync(run(dp, x, ITERS))
    tic = time.perf_counter(); sync(run(dp, x, 1)); t1 = time.perf_counter() - tic
    tic = time.perf_counter(); sync(run(dp, x, ITERS)); tn = time.perf_counter() - tic
    dt = max((tn - t1) / (ITERS - 1), 1e-9)
    name = "composed" if compose else "plain"
    out[name] = {"step_ms": dt * 1e3, "nnz_per_s": nnz / dt, "rel_err": rel}
    print(name, json.dumps(out[name]), flush=True)

print(json.dumps({"metric": "blocked_compose_probe", "variants": out}))
