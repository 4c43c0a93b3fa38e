"""Trace one grid-1M windowed step inside a fori_loop and print the per-op
device-time summary — attribution for the remaining gap between the 7.3 ms
step and the ~5.5 ms window-kernel floor."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import grid_graph
from arrow_matrix_tpu.parallel.local import compile_single_chip, local_step
from arrow_matrix_tpu.utils import profiling

A = grid_graph(1000)
decomp = arrow_decomposition(A, 25_000, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
plan, step_fn = compile_single_chip(decomp, 25_000, k_hint=16)
assert plan.levels[0].fmt == "window"

rng = np.random.default_rng(0)
x0 = np.zeros((plan.padded_rows, 128), dtype=np.float32)
x0[:, :16] = rng.random((plan.padded_rows, 16), dtype=np.float32)
xj = jnp.asarray(x0)
dplan = jax.device_put(plan)

run = jax.jit(
    lambda p, v, n: lax.fori_loop(0, n, lambda i, s: step_fn(p, s), v),
    static_argnums=2,
)
profiling.sync(run(dplan, xj, 10))  # compile + warm
with profiling.trace("/tmp/window_trace"):
    profiling.sync(run(dplan, xj, 10))

summary = profiling.summarize_trace("/tmp/window_trace", top=15, iters=10)
total = sum(ms for _, ms, _ in summary)
print(f"top-op device time: {total:.3f} ms/iter")
for name, ms, count in summary:
    print(f"  {ms:9.3f} ms/iter  x{count:<5d} {name}")
