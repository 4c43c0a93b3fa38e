"""Can a bf16 STATE break the 241 M ba-200k headline? (VERDICT r3 item 2
follow-up.) BASELINE.md's round-4 accounting proved the SLOT count is the
floor at f32 — but every gathered slot moves state BYTES, and if the gather
plateau is bandwidth-bound rather than index-bound, halving the row bytes
halves the dominant term. The windowed family measured exactly 2x from the
same lever (tools/probe_bf16_state.py: grid-1M 7.27 -> 3.61 ms).

Variants: ba-200k and ba-1m merged plans, f32 vs bf16 state,
fori-differenced timing, golden-checked per dtype.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert
from arrow_matrix_tpu.parallel.local import compile_single_chip, state_cols
from arrow_matrix_tpu.utils.profiling import sync

ITERS = 30
K = 16

out = {}
for n, width in ((200_000, 25_000), (1_000_000, 25_000)):
    A = barabasi_albert(n, 4, seed=1)
    decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                                 block_diagonal=True, seed=2)
    nnz = sum(int(l.matrix.nnz) for l in decomp)
    plan, step = compile_single_chip(decomp, width, k_hint=K)
    cols = state_cols(plan, K)
    rng = np.random.default_rng(0)
    x0 = np.zeros((plan.padded_rows, cols), dtype=np.float32)
    x0[:, :K] = rng.random((plan.padded_rows, K), dtype=np.float32)

    P0 = np.asarray(plan.permutations[0])
    src = np.zeros(n, dtype=np.int64)
    src[P0[P0 < n]] = np.nonzero(P0 < n)[0]

    run = jax.jit(
        lambda p, v, it: lax.fori_loop(0, it, lambda i, s: step(p, s), v),
        static_argnums=2,
    )
    pd = jax.device_put(plan)
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        xj = jnp.asarray(x0).astype(dt)
        y = np.asarray(run(pd, xj, 1), dtype=np.float32)
        want = A @ np.asarray(xj, dtype=np.float32)[src][:n, :K]
        rel = float(np.abs(y[src][:n, :K] - want).max()
                    / max(np.abs(want).max(), 1e-30))
        sync(run(pd, xj, ITERS))
        tic = time.perf_counter(); sync(run(pd, xj, 1)); t1 = time.perf_counter() - tic
        tic = time.perf_counter(); sync(run(pd, xj, ITERS)); tn = time.perf_counter() - tic
        dtm = max((tn - t1) / (ITERS - 1), 1e-9)
        key = f"ba-{n//1000}k/{name}"
        out[key] = {"step_ms": dtm * 1e3, "nnz_per_s": nnz / dtm, "rel_err": rel}
        print(key, json.dumps(out[key]), flush=True)

print(json.dumps({"metric": "ell_bf16_state_probe", "variants": out}))
