"""bf16 STATE on the two remaining basket regimes:

* er-16k — resident Pallas BSR/MXU (X lives in VMEM): bf16 halves the
  resident operand and the output writes; tiles are already auto-bf16 on
  unit weights, so the dots run native bf16 x bf16.
* grid-202k at k=128 — the windowed family with 8x the state bytes of the
  k=16 row; if the step is state-byte-bound the bf16 win should persist at
  the reference's wide-feature default.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import erdos_renyi, grid_graph
from arrow_matrix_tpu.parallel.local import compile_single_chip, state_cols
from arrow_matrix_tpu.utils.profiling import sync

ITERS = 30

ALL_CONFIGS = {
    "er-16k/k16": lambda: (erdos_renyi(16_384, 0.01, seed=1), 2048, 16),
    # width 25_000 matches bench.build_graph (q=9 blocks) so probe
    # numbers compare structurally with the basket rows.
    "grid-202k/k128": lambda: (grid_graph(450), 25_000, 128),
    "grid-1m/k128": lambda: (grid_graph(1000), 25_000, 128),
}

names = sys.argv[1:] or ["er-16k/k16", "grid-202k/k128"]
CONFIGS = [(nm,) + ALL_CONFIGS[nm]() for nm in names]

out = {}
for name, A, width, K in CONFIGS:
    decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                                 block_diagonal=True, seed=2)
    nnz = sum(int(l.matrix.nnz) for l in decomp)
    plan, step = compile_single_chip(decomp, width, k_hint=K)
    cols = state_cols(plan, K) if hasattr(plan, "levels") else K
    rng = np.random.default_rng(0)
    x0 = np.zeros((plan.padded_rows, cols), dtype=np.float32)
    x0[:, :K] = rng.random((plan.padded_rows, K), dtype=np.float32)
    run = jax.jit(
        lambda p, v, it: lax.fori_loop(0, it, lambda i, s: step(p, s), v),
        static_argnums=2,
    )
    pd = jax.device_put(plan)
    for dname, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        xj = jnp.asarray(x0).astype(dt)
        sync(run(pd, xj, 1)); sync(run(pd, xj, ITERS))
        t1s, tns = [], []
        for _ in range(3):
            tic = time.perf_counter(); sync(run(pd, xj, 1)); t1s.append(time.perf_counter() - tic)
            tic = time.perf_counter(); sync(run(pd, xj, ITERS)); tns.append(time.perf_counter() - tic)
        dtm = max((np.median(tns) - np.median(t1s)) / (ITERS - 1), 1e-9)
        key = f"{name}/{dname}"
        out[key] = {"step_ms": dtm * 1e3, "nnz_per_s": nnz / dtm}
        print(key, json.dumps(out[key]), flush=True)

print(json.dumps({"metric": "bf16_more_probe", "variants": out}))
