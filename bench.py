"""Single-chip benchmark: iterated arrow SpMM throughput (nnz/s/chip).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Problem: decompose a Barabási graph (the reference's benchmark generator,
reference: arrow/arrow_bench.py:28-41), k = 16 dense columns (reference
default, scripts/spmm_arrow_main.py:14), run the jit-compiled iterated SpMM
on the available chip, and report effective nonzeros processed per second.

Two executors are timed:

* the best single-chip executor (``compile_single_chip``: the merged plan,
  or the region executor for RCM-banded matrices) — headline ``value``,
  with the chosen executor reported as ``executor``;
* the blocked executor (``blocked_step``) — the DISTRIBUTED program
  (per-block kernels + routing exchanges + emulated collectives) on one
  chip, reported as ``arrow_spmm_distributed_nnz_per_s``.

``vs_baseline`` compares against host scipy CSR @ dense on the same problem
(the reference's CPU kernel, arrow/arrow_mpi.py:196-219).
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graph", choices=["ba", "er", "grid", "rmat"],
                   default="ba",
                   help="ba: power-law (scattered, gather-ELL); er: dense-ish "
                        "(Pallas BSR); grid: planar family; rmat: Graph500 "
                        "power-law at scale=log2(vertices), edge factor 16")
    p.add_argument("--vertices", type=int, default=200_000)
    p.add_argument("--ba-neighbors", type=int, default=4)
    p.add_argument("--width", type=int, default=25_000)
    p.add_argument("--features", type=int, default=16)
    p.add_argument("--iterations", type=int, default=50)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--blocks", type=int, default=None,
                   help="block count for the plans (default: ceil(n/width))")
    p.add_argument("--mode", choices=["local", "blocked", "both"],
                   default="both")
    p.add_argument("--refine", choices=["never", "auto", "always"],
                   default="auto",
                   help="merged-layout RCM refinement (plan/refine.py)")
    p.add_argument("--comm-volume", type=int, default=8,
                   help="also report per-device comm volume of the N-device "
                        "distributed plan and the matching 1.5D baseline "
                        "(host-side, exact from the plans; 0 disables)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from arrow_matrix_tpu.decomposition import arrow_decomposition
    from arrow_matrix_tpu.io.generate import barabasi_albert
    from arrow_matrix_tpu.parallel.blocked import blocked_step, compile_blocked_plan
    from arrow_matrix_tpu.parallel.local import compile_single_chip
    from arrow_matrix_tpu.parallel.region import RegionPlan

    rng = np.random.default_rng(0)
    if args.graph == "er":
        from arrow_matrix_tpu.io.generate import erdos_renyi

        n = min(args.vertices, 16_384)
        A = erdos_renyi(n, 0.01, seed=1)
        args.width = min(args.width, max(1, n // 8))
    elif args.graph == "grid":
        from arrow_matrix_tpu.io.generate import grid_graph

        side = int(args.vertices ** 0.5)
        A = grid_graph(side)
        args.width = min(args.width, max(1, (side * side) // 8 + 1))
    elif args.graph == "rmat":
        from arrow_matrix_tpu.io.generate import rmat_graph

        scale = max(1, int(round(np.log2(args.vertices))))
        A = rmat_graph(scale, seed=1)
        args.width = min(max(args.width, A.shape[0] // 8 + 1), A.shape[0])
    else:
        A = barabasi_albert(args.vertices, args.ba_neighbors, seed=1)
    args.vertices = A.shape[0]
    decomp = arrow_decomposition(
        A,
        args.width,
        max_number_of_levels=100,
        block_diagonal=True,
        seed=2,
    )
    nnz = sum(int(lvl.matrix.nnz) for lvl in decomp)

    def sync(arr):
        # NOTE: through the axon relay block_until_ready can return before
        # the device finishes; a device->host transfer of (a slice of) the
        # result is the only reliable fence.
        return np.asarray(jax.device_get(arr[:1, :1]))

    def time_step(plan, step_fn, x0):
        """Differenced 1- vs N-iteration fori_loop timing (fixed relay cost
        per dispatch is ~15-40 ms)."""
        plan = jax.device_put(plan)

        def run(plan, x, iters):
            return jax.lax.fori_loop(0, iters, lambda i, x: step_fn(plan, x), x)

        run = jax.jit(run, static_argnums=2)
        xj = jnp.asarray(x0)
        sync(run(plan, xj, 1))  # compile 1-iter variant
        sync(run(plan, xj, args.iterations))  # compile N-iter variant
        tic = time.perf_counter()
        sync(run(plan, xj, 1))
        t1 = time.perf_counter() - tic
        tic = time.perf_counter()
        sync(run(plan, xj, args.iterations))
        tn = time.perf_counter() - tic
        return max((tn - t1) / (args.iterations - 1), 1e-9)

    results = {}
    executor = None
    if args.mode in ("local", "both"):
        plan, step_fn = compile_single_chip(
            decomp, args.width, n_blocks=args.blocks, k_hint=args.features,
            refine=args.refine,
        )
        executor = "region" if isinstance(plan, RegionPlan) else "merged"
        if not isinstance(plan, RegionPlan):
            executor = f"merged/{plan.levels[0].fmt}"
        x0 = rng.random((plan.padded_rows, args.features), dtype=np.float32)
        results["local"] = time_step(plan, step_fn, x0)
    if args.mode in ("blocked", "both"):
        bplan = compile_blocked_plan(
            decomp, args.width, n_blocks=args.blocks, k_hint=args.features
        )
        x0 = rng.random(
            (bplan.n_blocks * bplan.width, args.features), dtype=np.float32
        )
        results["blocked"] = time_step(bplan, blocked_step, x0)

    # Host scipy baseline (reference CPU kernel) on the same iteration.
    X = rng.random((args.vertices, args.features), dtype=np.float32)
    A @ X  # warm caches
    tic = time.perf_counter()
    reps = max(1, min(5, args.iterations // 4))
    for _ in range(reps):
        X = A @ X
    scipy_time = (time.perf_counter() - tic) / reps

    device_time = results.get("local", results.get("blocked"))
    out = {
        "metric": "arrow_spmm_nnz_per_s_per_chip",
        "value": nnz / device_time,
        "unit": "nnz/s",
        "vs_baseline": scipy_time / device_time,  # >1 == faster than scipy
    }
    if executor is not None:
        out["executor"] = executor
    if "blocked" in results:
        out["arrow_spmm_distributed_nnz_per_s"] = nnz / results["blocked"]
    if args.comm_volume:
        # Exact per-device bytes/iteration from the compiled plans (the
        # reference's headline comparison, README.md:3) — host-side only.
        try:
            from arrow_matrix_tpu.baselines.spmm_15d import replication_factor
            from arrow_matrix_tpu.plan import compile_plan
            from arrow_matrix_tpu.plan.comm import (
                arrow_comm_volume,
                spmm_15d_comm_volume,
            )

            # The distributed plan needs qv * width >= padded rows.
            qv = max(args.comm_volume, -(-args.vertices // args.width))
            dplan = compile_plan(decomp, args.width, qv, k_hint=args.features)
            c = replication_factor(qv)
            out["comm_volume"] = {
                "n_devices": qv,
                "arrow_bytes_per_device": arrow_comm_volume(
                    dplan, args.features
                )["total_bytes"],
                "spmm_15d_bytes_per_device": spmm_15d_comm_volume(
                    args.vertices, args.vertices, args.features, qv // c, c
                )["total_bytes"],
            }
        except Exception as e:  # noqa: BLE001 — reporting must not kill bench
            out["comm_volume"] = {"error": str(e)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
