"""Measure the state-dtype-aware auto window (512 tiles under a declared
bf16 state — VERDICT r4 item 4's window_tiles leg) COMBINED with the
ping-pong (unroll=2) iteration, against the 256-tile f32-regime default.

Configs: grid-1M k=16 and grid-202k k=128, both bf16 state, wt256 vs the
new auto (state_dtype=bf16 -> 512).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import grid_graph
from arrow_matrix_tpu.parallel.local import compile_single_chip
from arrow_matrix_tpu.utils.profiling import sync

ITERS = 30

out = {}
for side, width, K in ((1000, 25_000, 16), (450, 25_313, 128)):
    A = grid_graph(side)
    decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                                 block_diagonal=True, seed=2)
    nnz = sum(int(l.matrix.nnz) for l in decomp)
    for label, kw in (("wt256", {"window_tiles": 256}),
                      ("auto512", {"state_dtype": jnp.bfloat16})):
        plan, step_fn = compile_single_chip(decomp, width, k_hint=K, **kw)
        assert plan.levels[0].fmt == "window"
        wt = plan.levels[0].mat.window_tiles
        H = plan.padded_rows
        rng = np.random.default_rng(0)
        x0 = np.zeros((H, 128), dtype=np.float32)
        x0[:, :K] = rng.random((H, K), dtype=np.float32)
        xj = jnp.asarray(x0).astype(jnp.bfloat16)
        pj = jax.device_put(plan)

        y = np.asarray(
            jax.jit(step_fn)(pj, xj)[:, :K], dtype=np.float32)
        P0 = np.asarray(plan.permutations[0])
        n = A.shape[0]
        src = np.zeros(n, dtype=np.int64)
        src[P0[P0 < n]] = np.nonzero(P0 < n)[0]
        want = A @ np.asarray(xj, dtype=np.float32)[src][:n, :K]
        rel = float(np.abs(y[src][:n] - want).max()
                    / max(np.abs(want).max(), 1e-30))

        run = jax.jit(
            lambda p, v, it: lax.fori_loop(
                0, it, lambda i, s: step_fn(p, s), v, unroll=2),
            static_argnums=2,
        )
        sync(run(pj, xj, 1)); sync(run(pj, xj, ITERS))
        t1s, tns = [], []
        for _ in range(3):
            tic = time.perf_counter(); sync(run(pj, xj, 1))
            t1s.append(time.perf_counter() - tic)
            tic = time.perf_counter(); sync(run(pj, xj, ITERS))
            tns.append(time.perf_counter() - tic)
        dt = max((np.median(tns) - np.median(t1s)) / (ITERS - 1), 1e-9)
        key = f"grid-{side}sq-k{K}/{label}"
        out[key] = {"window_tiles": int(wt), "step_ms": dt * 1e3,
                    "nnz_per_s": nnz / dt, "rel_err": rel}
        print(key, json.dumps(out[key]), flush=True)

print(json.dumps({"metric": "bf16_auto512_probe", "variants": out}))
