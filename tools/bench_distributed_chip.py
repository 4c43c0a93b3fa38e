"""Run the DISTRIBUTED shard_map program (ArrowSpmm + stacked formats) on
the real TPU chip via a q=1 block mesh — the first hardware execution of the
per-device program a real mesh runs (everything before this ran stacked
formats on virtual CPU meshes in Pallas interpret mode only).

At q=1 every level's nonzeros land in the head panel A_00, the sharded-head
collectives (all_gather / psum_scatter / routing all_to_all) lower for a
1-device mesh, and Mosaic compiles the STACKED (leading q axis) Pallas/ELL
kernels inside shard_map. This is the reference's runtime path actually
executing on real ranks (reference: scripts/run_tests.sh:9-11, mpiexec -n 30)
collapsed to one chip.

Each config forces one stacked format in turn (compile_plan(force_format=...))
and records the fenced per-step time plus the collect()-ed result's error vs
scipy A @ X. Usage: tools/tpurun.sh tools/bench_distributed_chip.py
"""

import json
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import (
    barabasi_albert,
    erdos_renyi,
    grid_graph,
    random_dense,
)
from arrow_matrix_tpu.parallel.arrow_spmm import ArrowSpmm, block_mesh
from arrow_matrix_tpu.plan.compile import compile_plan
from arrow_matrix_tpu.utils.profiling import sync

ITERS = 20


def run_one(name, A, width, force_format, k=16, state_dtype=jnp.float32):
    n = A.shape[0]
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    nnz = sum(int(l.matrix.nnz) for l in decomp)
    # q=1 block mesh: one block of width >= n covers everything.
    plan = compile_plan(decomp, n, n_devices=1, force_format=force_format,
                        k_hint=k)
    mesh = block_mesh(1)
    runner = ArrowSpmm(plan, mesh, state_dtype=state_dtype)
    X = random_dense(n, k, seed=3)
    xs = runner.distribute(X)

    # Correctness first (one dispatched step).
    got = runner.collect(runner.step(xs))
    want = A @ X
    scale = max(float(np.abs(want).max()), 1e-30)
    rel_err = float(np.abs(got - want).max()) / scale

    # Differenced 1- vs N-iteration fori timing; the plan rides as a jit
    # ARGUMENT (closed-over device arrays re-materialize as HLO constants
    # and trip the relay's remote_compile body limit).
    body = runner._make_step()
    run = jax.jit(
        lambda p, x, iters: lax.fori_loop(0, iters, lambda i, v: body(p, v), x),
        static_argnums=2,
    )
    dp = runner.device_plan
    sync(run(dp, xs, 1))
    sync(run(dp, xs, ITERS))
    tic = time.perf_counter(); sync(run(dp, xs, 1)); t1 = time.perf_counter() - tic
    tic = time.perf_counter(); sync(run(dp, xs, ITERS)); tn = time.perf_counter() - tic
    dt = max((tn - t1) / (ITERS - 1), 1e-9)

    fmts = {
        type(getattr(lvl, role)).__name__
        for lvl in plan.levels
        for role in ("head", "diag", "col")
        if getattr(lvl, role) is not None
    }
    return {
        "step_ms": dt * 1e3,
        "nnz_per_s": nnz / dt,
        "nnz": nnz,
        "levels": len(decomp),
        "rel_err": rel_err,
        "formats": sorted(fmts),
    }


def main():
    print("devices:", jax.devices())
    ba = barabasi_albert(200_000, 4, seed=1)
    grid = grid_graph(450)  # 202,500 vertices, planar
    er = erdos_renyi(8_192, 0.01, seed=1)  # dense-ish, BSR territory

    configs = [
        ("ba-200k/auto", ba, 25_000, None),
        ("ba-200k/ell", ba, 25_000, "ell"),
        ("grid-202k/auto", grid, 25_313, None),
        ("grid-202k/window", grid, 25_313, "window"),
        ("er-8k/bsr", er, 1_024, "bsr"),
    ]
    # bf16 STATE variant of the distributed program (the round-4 2x lever
    # measured on the merged windowed plan — here it exercises the stacked
    # formats + collectives under a bf16 carry on hardware).
    bf16_configs = [
        ("grid-202k/window-bf16", grid, 25_313, "window", jnp.bfloat16),
        ("ba-200k/auto-bf16", ba, 25_000, None, jnp.bfloat16),
    ]
    out = {}
    for name, A, width, fmt, *dt in configs + bf16_configs:
        try:
            out[name] = run_one(name, A, width, fmt,
                                state_dtype=(dt[0] if dt else jnp.float32))
            print(name, json.dumps(out[name]))
        except Exception as e:  # noqa: BLE001 — record per-format failures
            traceback.print_exc()
            out[name] = {"error": f"{type(e).__name__}: {e}"}
            print(name, "FAILED:", out[name]["error"])
    print(json.dumps({"metric": "arrow_spmm_distributed_q1_chip", "configs": out}))


if __name__ == "__main__":
    main()
