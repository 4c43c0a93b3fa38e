"""Profile the SPMD-emulation step on the chip: per-op device time for one
emulated_step (default ba-200k q=8), to attribute measured step time.
Round-5 findings recorded in NOTES:

* vmap mode, ba-200k: 101.7 ms/step — the batched takes lower to one
  big-source gather against the fused (q, width, k) operand (~5x the
  padded-slot floor). Banked negative; scan mode is the default.
* scan mode, ba-200k: 43.4 ms/step vs ~18 ms of padded-slot work.

Usage: tools/tpurun.sh tools/probe_emulate_profile.py [ba|grid] [n] [vmap|scan]
"""

import sys
import time

import numpy as np

import jax
from jax import lax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert, grid_graph, random_dense
from arrow_matrix_tpu.parallel.emulate import EmulatedSpmm, emulated_step
from arrow_matrix_tpu.plan.compile import compile_plan
from arrow_matrix_tpu.utils.profiling import sync, summarize_trace

GRAPH = sys.argv[1] if len(sys.argv) > 1 else "ba"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
BATCH = sys.argv[3] if len(sys.argv) > 3 else "scan"

A = grid_graph(int(N ** 0.5)) if GRAPH == "grid" else barabasi_albert(
    N, 4, seed=1
)
n = A.shape[0]
width = -(-n // 8)
decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
plan = compile_plan(decomp, width, 8, k_hint=16)
emu = EmulatedSpmm(plan, batch=BATCH)
xs = emu.distribute(random_dense(n, 16, seed=3))

ITERS = 10
run = jax.jit(
    lambda p, x, iters: lax.fori_loop(
        0, iters, lambda i, v: emulated_step(p, v, batch=BATCH), x),
    static_argnums=2,
)
dp = emu.device_plan
sync(run(dp, xs, ITERS))

with jax.profiler.trace("/tmp/emuprof"):
    sync(run(dp, xs, ITERS))

for name, ms, cnt in summarize_trace("/tmp/emuprof", top=25, iters=ITERS):
    print(f"{ms:9.3f} ms  x{cnt:4d}  {name[:110]}")
