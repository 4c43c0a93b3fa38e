"""Measure the batched SPMD emulation (parallel/emulate.py) on the real TPU
chip: the distributed program's per-device cost WITHOUT the blocked
executor's ~430 us per-part launch artifact (tools/fit_stripe_overhead.py).

Per config: golden-check one emulated step vs scipy A @ X, then
fori-differenced step time (plan as jit argument, sync fence, medians of 3,
unroll=2 — the bench.py conventions). Reported alongside:

* merged t1 (the single-chip plan, tools/mesh_projection.py T1_MERGED_MS) —
  the strong-scaling reference;
* the blocked executor's measured step where one exists (ba-200k 10.52 ms,
  ba-1m 103.4 ms, round-4/5 NOTES) — the serialized-dispatch comparison;
* emulated/q — the balanced per-device compute+assembly span a fused
  q-device SPMD program pays, to replace the [0, 435 us] x instances
  bracket in tools/mesh_projection.py with a measured point.

Usage: tools/tpurun.sh tools/bench_emulate_chip.py [config ...]
Configs: ba-200k ba-1m grid-202k grid-202k-bf16 (default: first three).
"""

import json
import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert, grid_graph, random_dense
from arrow_matrix_tpu.parallel.emulate import EmulatedSpmm, emulated_step
from arrow_matrix_tpu.plan.compile import compile_plan
from arrow_matrix_tpu.utils.profiling import sync

ITERS = 20
Q = 8

CONFIGS = {
    # name: (graph, n, k, state_dtype, merged_t1_ms, blocked_ms)
    "ba-200k": ("ba", 200_000, 16, jnp.float32, 6.34, 10.52),
    "ba-1m": ("ba", 1_000_000, 16, jnp.float32, 50.7, 103.4),
    "grid-202k": ("grid", 202_500, 16, jnp.float32, 1.05, None),
    "grid-202k-bf16": ("grid", 202_500, 16, jnp.bfloat16, 0.56, None),
    "grid-1m": ("grid", 1_000_000, 16, jnp.float32, 5.54, None),
}


def run_one(name, force_format=None, batch="scan", slots=None):
    graph, n, k, sdt, t1_ms, blocked_ms = CONFIGS[name]
    A = grid_graph(int(n ** 0.5)) if graph == "grid" else barabasi_albert(
        n, 4, seed=1
    )
    n = A.shape[0]
    nnz = A.nnz
    width = -(-n // Q)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    plan = compile_plan(decomp, width, Q, k_hint=k,
                        force_format=force_format, slots_per_row=slots)
    roles = sum(
        1
        for lvl in plan.levels
        for r in (lvl.head, lvl.diag, lvl.col, lvl.band_lo, lvl.band_hi)
        if r is not None
    )
    emu = EmulatedSpmm(plan, state_dtype=sdt, batch=batch)
    X = random_dense(n, k, seed=3)
    xs = emu.distribute(X)

    got = emu.collect(emu.step(xs))
    want = A @ X
    rel_err = float(np.abs(got - want).max()) / max(
        float(np.abs(want).max()), 1e-30
    )

    run = jax.jit(
        lambda p, x, iters: lax.fori_loop(
            0, iters, lambda i, v: emulated_step(p, v, batch=batch), x,
            unroll=2,
        ),
        static_argnums=2,
    )
    dp = emu.device_plan
    sync(run(dp, xs, 1))
    sync(run(dp, xs, ITERS))
    t1s, tns = [], []
    for _ in range(3):
        tic = time.perf_counter(); sync(run(dp, xs, 1))
        t1s.append(time.perf_counter() - tic)
        tic = time.perf_counter(); sync(run(dp, xs, ITERS))
        tns.append(time.perf_counter() - tic)
    dt = max((np.median(tns) - np.median(t1s)) / (ITERS - 1), 1e-9)

    out = {
        "config": name,
        "batch": batch,
        "force_format": force_format,
        "slots_per_row": slots,
        "formats": sorted({
            type(getattr(lvl, r)).__name__
            for lvl in plan.levels for r in ("head", "diag", "col")
            if getattr(lvl, r) is not None
        }),
        "q": Q,
        "levels": len(plan.levels),
        "role_launches": roles,
        "nnz": int(nnz),
        "rel_err": rel_err,
        "emulated_ms": dt * 1e3,
        "emulated_nnz_per_s": nnz / dt,
        "per_device_ms": dt * 1e3 / Q,
        "merged_t1_ms": t1_ms,
    }
    if blocked_ms is not None:
        out["blocked_ms"] = blocked_ms
        out["vs_blocked"] = blocked_ms / (dt * 1e3)
    print(json.dumps(out), flush=True)


def main():
    args = [a for a in sys.argv[1:]]
    force = None
    if "--force" in args:
        i = args.index("--force")
        force = args[i + 1]
        del args[i : i + 2]
    batch = "scan"
    if "--batch" in args:
        i = args.index("--batch")
        batch = args[i + 1]
        del args[i : i + 2]
    slots = None
    if "--slots" in args:
        i = args.index("--slots")
        slots = int(args[i + 1])
        del args[i : i + 2]
    names = args or ["ba-200k", "grid-202k", "ba-1m"]
    for name in names:
        try:
            run_one(name, force_format=force, batch=batch, slots=slots)
        except Exception:  # noqa: BLE001 — report and continue the sweep
            print(json.dumps({"config": name, "error": True}), flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
