"""Probe the ping-pong (unroll-2) fix for the windowed step's back-edge
carry copy (VERDICT r4 item 1).

Mechanism: inside a ``fori_loop`` the body's output buffer must equal its
input (carry) buffer; the windowed step's aliased-accumulate pins the
result into the window kernel's output buffer, which CANNOT be the carry
(the kernels read the carry's windows while writing), so XLA copies the
full state at the back edge (~1.58 ms f32 / ~0.79 bf16 at grid-1M,
tools/profile_window_step.py). Unrolling the body by 2 gives
``x -> step -> y -> step -> z``: step 2's kernels read ``y`` (a scratch
buffer), not the carry, so XLA's buffer assignment is free to write ``z``
straight into the carry buffer — the ping-pong two-buffer iteration
realized without any manual buffer plumbing.

Variants per config (grid-1M / grid-202k, f32 and bf16 state):
  u1   — baseline one-step body (the round-4 number)
  u2   — ``lax.fori_loop(..., unroll=2)``
  d2   — explicit double-step body over it//2 trips
All report per-STEP ms (double-step trips count two steps).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import grid_graph
from arrow_matrix_tpu.parallel.local import compile_single_chip, local_step
from arrow_matrix_tpu.utils.profiling import sync

ITERS = 30
K = 16

out = {}
for side, width in ((450, 25_313), (1000, 25_000)):
    A = grid_graph(side)
    decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                                 block_diagonal=True, seed=2)
    nnz = sum(int(l.matrix.nnz) for l in decomp)
    plan, step_fn = compile_single_chip(decomp, width, k_hint=K)
    assert plan.levels[0].fmt == "window", plan.levels[0].fmt
    H = plan.padded_rows
    rng = np.random.default_rng(0)
    x0 = np.zeros((H, 128), dtype=np.float32)
    x0[:, :K] = rng.random((H, K), dtype=np.float32)

    P0 = np.asarray(plan.permutations[0])
    n = A.shape[0]
    src = np.zeros(n, dtype=np.int64)
    src[P0[P0 < n]] = np.nonzero(P0 < n)[0]

    pj = jax.device_put(plan)
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        xj = jnp.asarray(x0).astype(dt)

        # Correctness once per dtype: two steps vs host A@(A@x).
        y2 = np.asarray(
            jax.jit(lambda p, v: step_fn(p, step_fn(p, v)))(pj, xj),
            dtype=np.float32,
        )
        xh = np.asarray(xj, dtype=np.float32)[src][:n, :K]
        want = A @ (A @ xh)
        rel = float(np.abs(y2[src][:n, :K] - want).max()
                    / max(np.abs(want).max(), 1e-30))

        def run_u1(p, v, it):
            return lax.fori_loop(0, it, lambda i, s: step_fn(p, s), v)

        def run_u2(p, v, it):
            return lax.fori_loop(0, it, lambda i, s: step_fn(p, s), v,
                                 unroll=2)

        def run_d2(p, v, trips):
            return lax.fori_loop(
                0, trips, lambda i, s: step_fn(p, step_fn(p, s)), v)

        for vname, run, per_trip in (("u1", run_u1, 1), ("u2", run_u2, 1),
                                     ("d2", run_d2, 2)):
            f = jax.jit(run, static_argnums=2)
            itn = ITERS // per_trip
            sync(f(pj, xj, 1)); sync(f(pj, xj, itn))
            t1s, tns = [], []
            for _ in range(3):
                tic = time.perf_counter(); sync(f(pj, xj, 1))
                t1s.append(time.perf_counter() - tic)
                tic = time.perf_counter(); sync(f(pj, xj, itn))
                tns.append(time.perf_counter() - tic)
            dtm = max((np.median(tns) - np.median(t1s))
                      / ((itn - 1) * per_trip), 1e-9)
            key = f"grid-{side}sq/{name}/{vname}"
            out[key] = {"step_ms": dtm * 1e3, "nnz_per_s": nnz / dtm,
                        "rel_err2": rel}
            print(key, json.dumps(out[key]), flush=True)

print(json.dumps({"metric": "window_pingpong_probe", "variants": out}))
