"""Single-chip benchmark: iterated arrow SpMM throughput (nnz/s/chip).

Prints ONE JSON line.  The headline fields ``metric``/``value``/``unit``/
``vs_baseline`` report the default configuration (Barabási 200k vertices,
k = 16 — the reference's benchmark generator and default feature count,
reference: arrow/arrow_bench.py:28-41, scripts/spmm_arrow_main.py:14).
The ``configs`` map reports the full basket the reference benchmarks across
(multiple graph families and feature widths, arrow/arrow_bench.py:12-137):

* ``ba-200k``      — power-law, scattered (gather-ELL path), headline
* ``grid-202k``    — planar family (RCM + region / windowed BSR path)
* ``grid-1m``      — planar at 1M rows
* ``ba-1m``        — power-law at 1M rows (folded-source gathers)
* ``er-16k``       — dense-ish (resident Pallas BSR / MXU)
* ``ba-200k-k128`` / ``grid-202k-k128`` — k = 128 (the reference's 1.5D
  default feature count, scripts/spmm_15d_main.py:57; lane padding makes
  wide k nearly free on TPU)

Per config: nnz/s, the auto-selected executor, and speedup vs host scipy
CSR @ dense (the reference's CPU kernel, arrow/arrow_mpi.py:196-219).
The ``blocked`` (distributed-program-on-one-chip) executor is timed on the
headline config only.  ``comm_volume`` reports exact per-device
bytes/iteration from the compiled plans for BOTH the headline BA graph
(not minor-excluded: arrow loses there, as the paper predicts) and the
planar grid (where arrow wins — the README.md:3 claim).

Use ``--graph`` to run a single configuration instead of the basket.
"""

import argparse
import json
import time

import numpy as np


def build_graph(graph, vertices, ba_neighbors, width):
    """Return (A, width) for a named family, mirroring the reference's
    generators (arrow/arrow_bench.py:28-41, arrow/common/utils.py:63-87)."""
    if graph == "er":
        from arrow_matrix_tpu.io.generate import erdos_renyi

        n = min(vertices, 16_384)
        A = erdos_renyi(n, 0.01, seed=1)
        width = min(width, max(1, n // 8))
    elif graph == "grid":
        from arrow_matrix_tpu.io.generate import grid_graph

        side = int(vertices ** 0.5)
        A = grid_graph(side)
        width = min(width, max(1, (side * side) // 8 + 1))
    elif graph == "rmat":
        from arrow_matrix_tpu.io.generate import rmat_graph

        scale = max(1, int(round(np.log2(vertices))))
        A = rmat_graph(scale, seed=1)
        width = min(max(width, A.shape[0] // 8 + 1), A.shape[0])
    else:
        from arrow_matrix_tpu.io.generate import barabasi_albert

        A = barabasi_albert(vertices, ba_neighbors, seed=1)
    return A, width


def make_sync():
    import jax

    def sync(arr):
        # NOTE: through the axon relay block_until_ready can return before
        # the device finishes; a device->host transfer of (a slice of) the
        # result is the only reliable fence.
        return np.asarray(jax.device_get(arr[:1, :1]))

    return sync


def make_timer(iterations, sync):
    import jax
    import jax.numpy as jnp

    def time_step(plan, step_fn, x0, reps: int = 3):
        """Differenced 1- vs N-iteration fori_loop timing (fixed relay cost
        per dispatch is ~15-40 ms). The 1- and N-iteration runs each repeat
        ``reps`` times and difference their MEDIANS: the fixed relay cost
        varies +-10 ms between dispatches, which at fast steps (er-16k,
        2.6 ms) shows up as +-8% config noise under single-shot
        differencing — repeats cost only extra dispatches (no compiles)."""
        plan = jax.device_put(plan)

        def run(plan, x, iters):
            # unroll=2 is the ping-pong two-buffer iteration: the second
            # step's kernels read the first step's scratch output, so XLA
            # writes the body result straight into the carry buffer instead
            # of paying a full-state copy at the while back edge (measured
            # -1.56 ms/step on grid-1M f32, tools/probe_pingpong.py).
            return jax.lax.fori_loop(
                0, iters, lambda i, x: step_fn(plan, x), x, unroll=2)

        run = jax.jit(run, static_argnums=2)
        xj = jnp.asarray(x0)
        sync(run(plan, xj, 1))  # compile 1-iter variant
        sync(run(plan, xj, iterations))  # compile N-iter variant

        def timed(iters):
            ts = []
            for _ in range(reps):
                tic = time.perf_counter()
                sync(run(plan, xj, iters))
                ts.append(time.perf_counter() - tic)
            return float(np.median(ts))

        t1 = timed(1)
        tn = timed(iterations)
        return max((tn - t1) / (iterations - 1), 1e-9)

    return time_step


def run_config(A, width, k, iterations, refine, time_step, blocks=None,
               with_blocked=False, state_dtype="float32", tune=False):
    """Decompose A, compile the best single-chip executor, time it, and
    compare against host scipy.  Returns ``(result dict, decomposition,
    width used)``.

    ``state_dtype="bfloat16"`` runs the iterated state in bf16 (one output
    rounding per step; every dense byte stream of the step halves — measured
    2x on the windowed family, tools/probe_bf16_state.py).

    ``tune=True`` lets the plan-time auto-tuner pick the width (and the
    state-dtype-aware window size) instead of the hand-set default — the
    compiler's choice is the number of record for the planar family
    (plan/tune.py; the search early-stops when the merged-plan
    normalization makes candidates identical)."""
    import jax.numpy as jnp

    from arrow_matrix_tpu.decomposition import arrow_decomposition
    from arrow_matrix_tpu.parallel.local import compile_single_chip
    from arrow_matrix_tpu.parallel.region import RegionPlan

    rng = np.random.default_rng(0)
    sdt = jnp.bfloat16 if state_dtype == "bfloat16" else None
    tuned = None
    # An explicit --blocks pins the plan shape — the width search would
    # silently override it, so tuning only applies without it.
    if tune and blocks is None:
        from arrow_matrix_tpu.plan.tune import tune_single_chip

        tr = tune_single_chip(A, k, state_dtype=sdt, base_width=width,
                              refine=refine)
        decomp, plan, step_fn, width = (
            tr.decomposition, tr.plan, tr.step_fn, tr.width)
        tuned = tr
        nnz = sum(int(lvl.matrix.nnz) for lvl in decomp)
    else:
        decomp = arrow_decomposition(
            A, width, max_number_of_levels=100, block_diagonal=True, seed=2
        )
        nnz = sum(int(lvl.matrix.nnz) for lvl in decomp)

        plan, step_fn = compile_single_chip(
            decomp, width, n_blocks=blocks, k_hint=k, refine=refine,
            state_dtype=sdt,
        )
    if isinstance(plan, RegionPlan):
        executor = "region"
        cols = k
    else:
        from arrow_matrix_tpu.parallel.local import state_cols

        executor = getattr(plan, "executor_name", None) or (
            f"merged/{plan.levels[0].fmt}"
        )
        # Lane-padded state engages the windowed zero-copy fast path
        # (physically identical bytes; removes per-step logical lane pads).
        cols = state_cols(plan, k)
    x0 = np.zeros((plan.padded_rows, cols), dtype=np.float32)
    x0[:, :k] = rng.random((plan.padded_rows, k), dtype=np.float32)
    if state_dtype == "bfloat16":
        x0 = jnp.asarray(x0).astype(jnp.bfloat16)
    dt = time_step(plan, step_fn, x0)

    # Host scipy baseline (reference CPU kernel) on the same iteration.
    X = rng.random((A.shape[0], k), dtype=np.float32)
    A @ X  # warm caches
    tic = time.perf_counter()
    reps = max(1, min(5, iterations // 4))
    for _ in range(reps):
        X = A @ X
    scipy_time = (time.perf_counter() - tic) / reps

    res = {
        "nnz_per_s": nnz / dt,
        "step_ms": dt * 1e3,
        "nnz": nnz,
        "k": k,
        "levels": len(decomp),
        "executor": executor,
        "vs_scipy": scipy_time / dt,
    }
    if state_dtype != "float32":
        res["state_dtype"] = state_dtype
    if tuned is not None:
        res["width"] = int(width)
        res["tuned"] = True
        res["tune_normalized"] = bool(tuned.normalized)
        lvl0 = plan.levels[0] if hasattr(plan, "levels") else None
        if lvl0 is not None and lvl0.fmt == "window":
            res["window_tiles"] = int(lvl0.mat.window_tiles)
    if with_blocked:
        from arrow_matrix_tpu.parallel.blocked import (
            blocked_step,
            compile_blocked_plan,
        )

        bplan = compile_blocked_plan(decomp, width, n_blocks=blocks, k_hint=k)
        xb = rng.random((bplan.n_blocks * bplan.width, k), dtype=np.float32)
        res["distributed_nnz_per_s"] = nnz / time_step(bplan, blocked_step, xb)
    return res, decomp, width


def operator_config(time_step, k=16):
    """Forward/backward throughput of the differentiable operator on the
    planar family (grid-202k) — the training path the reference has no
    analogue for. Both directions ride the windowed zero-copy pair on one
    aligned state layout; bf16 halves every dense byte stream of both."""
    import jax.numpy as jnp

    from arrow_matrix_tpu.decomposition import arrow_decomposition
    from arrow_matrix_tpu.io.generate import grid_graph
    from arrow_matrix_tpu.parallel.local import local_step
    from arrow_matrix_tpu.parallel.operator import ArrowOperator

    A = grid_graph(450)
    width = A.shape[0] // 8 + 1
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    nnz = sum(int(lvl.matrix.nnz) for lvl in decomp)
    res = {"nnz": nnz, "k": k}
    rng = np.random.default_rng(0)
    for name, sdt in (("f32", None), ("bf16", jnp.bfloat16)):
        op = ArrowOperator(decomp, width, n_devices=1, k_hint=k,
                           state_dtype=sdt)
        cols = 128 if op.device_plan_f.levels[0].fmt == "window" else k
        xh = np.zeros((A.shape[0], cols), np.float32)
        xh[:, :k] = rng.random((A.shape[0], k), dtype=np.float32)
        xs = op.distribute(xh)
        res[f"fwd_{name}_nnz_per_s"] = nnz / time_step(
            op.device_plan_f, local_step, xs)
        res[f"bwd_{name}_nnz_per_s"] = nnz / time_step(
            op.device_plan_b, local_step, xs)
    return res


def comm_volume_report(decomp, width, n, k, n_devices):
    """Exact per-device bytes/iteration from the compiled plans (the
    reference's headline comparison, README.md:3) — host-side only."""
    from arrow_matrix_tpu.baselines.spmm_15d import replication_factor
    from arrow_matrix_tpu.plan import compile_plan
    from arrow_matrix_tpu.plan.comm import arrow_comm_volume, spmm_15d_comm_volume

    qv = max(n_devices, -(-n // width))
    dplan = compile_plan(decomp, width, qv, k_hint=k)
    c = replication_factor(qv)
    return {
        "n_devices": qv,
        "arrow_bytes_per_device": arrow_comm_volume(dplan, k)["total_bytes"],
        "spmm_15d_bytes_per_device": spmm_15d_comm_volume(
            n, n, k, qv // c, c
        )["total_bytes"],
    }


# (name, graph family, vertices, k, state dtype) — the driver-visible
# basket.  The ``-bf16`` rows run the same iterated step with a bfloat16
# state (one output rounding per step): every dense byte stream halves,
# measured ~2x on the windowed family and recorded next to the f32 numbers
# of the same graphs.
BASKET = [
    ("ba-200k", "ba", 200_000, 16, "float32"),
    ("grid-202k", "grid", 202_500, 16, "float32"),
    ("grid-1m", "grid", 1_000_000, 16, "float32"),
    ("ba-1m", "ba", 1_000_000, 16, "float32"),
    ("er-16k", "er", 16_384, 16, "float32"),
    ("ba-200k-k128", "ba", 200_000, 128, "float32"),
    ("grid-202k-k128", "grid", 202_500, 128, "float32"),
    ("grid-202k-bf16", "grid", 202_500, 16, "bfloat16"),
    ("grid-1m-bf16", "grid", 1_000_000, 16, "bfloat16"),
    ("grid-202k-k128-bf16", "grid", 202_500, 128, "bfloat16"),
    # No ba-*-bf16 rows (gather-ELL measured byte-insensitive — index-bound
    # plateau, tools/probe_bf16_ell.py: 240.0 vs 239.6 M) and no er-bf16
    # (resident BSR is A-tile-stream bound, +1.8%, tools/probe_bf16_more.py).
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graph", choices=["ba", "er", "grid", "rmat"],
                   default=None,
                   help="run ONE configuration instead of the basket")
    p.add_argument("--vertices", type=int, default=200_000)
    p.add_argument("--ba-neighbors", type=int, default=4)
    p.add_argument("--width", type=int, default=25_000)
    p.add_argument("--features", type=int, default=16)
    p.add_argument("--iterations", type=int, default=50)
    p.add_argument("--blocks", type=int, default=None,
                   help="block count for the plans (default: ceil(n/width))")
    p.add_argument("--mode", choices=["local", "blocked", "both"],
                   default="both")
    p.add_argument("--refine", choices=["never", "auto", "always"],
                   default="auto",
                   help="merged-layout RCM refinement (plan/refine.py)")
    p.add_argument("--comm-volume", type=int, default=8,
                   help="report per-device comm volume of the N-device "
                        "distributed plan vs the 1.5D baseline (0 disables)")
    p.add_argument("--skip", default="",
                   help="comma-separated basket config names to skip")
    args = p.parse_args()

    time_step = make_timer(args.iterations, make_sync())

    if args.graph is not None:
        # Single-config mode (kept for tools/ and ad-hoc sweeps).
        A, width = build_graph(args.graph, args.vertices, args.ba_neighbors,
                               args.width)
        res, decomp, width = run_config(
            A, width, args.features, args.iterations, args.refine, time_step,
            blocks=args.blocks, with_blocked=args.mode in ("blocked", "both"),
        )
        out = {
            "metric": "arrow_spmm_nnz_per_s_per_chip",
            "value": res["nnz_per_s"],
            "unit": "nnz/s",
            "vs_baseline": res["vs_scipy"],
            "executor": res["executor"],
        }
        if "distributed_nnz_per_s" in res:
            out["arrow_spmm_distributed_nnz_per_s"] = res[
                "distributed_nnz_per_s"]
        if args.comm_volume:
            try:
                out["comm_volume"] = comm_volume_report(
                    decomp, width, A.shape[0], args.features,
                    args.comm_volume)
            except Exception as e:  # noqa: BLE001 — reporting must not kill bench
                out["comm_volume"] = {"error": str(e)}
        print(json.dumps(out))
        return

    skip = {s for s in args.skip.split(",") if s}
    configs = {}
    headline = None
    comm = {}
    for name, graph, vertices, k, state_dtype in BASKET:
        if name in skip:
            continue
        try:
            A, width = build_graph(graph, vertices, args.ba_neighbors,
                                   args.width)
            # The planar family records the TUNER's width/window choice
            # (plan/tune.py); hand-set widths remain for the scattered and
            # dense families where the search measured moot.
            res, decomp, width = run_config(
                A, width, k, args.iterations, args.refine, time_step,
                with_blocked=(name == "ba-200k"
                              and args.mode in ("blocked", "both")),
                state_dtype=state_dtype,
                tune=(graph == "grid"),
            )
            configs[name] = res
            if name == "ba-200k":
                headline = res
            if args.comm_volume and name in ("ba-200k", "grid-202k"):
                try:
                    comm[name] = comm_volume_report(
                        decomp, width, A.shape[0], k, args.comm_volume)
                except Exception as e:  # noqa: BLE001
                    comm[name] = {"error": str(e)}
        except Exception as e:  # noqa: BLE001 — one config must not kill the basket
            configs[name] = {"error": str(e)}

    # The differentiable operator (training path — no reference analogue):
    # fwd/bwd of the windowed pair on the planar family, f32 + bf16.
    if "operator" not in skip:
        try:
            configs["operator-grid-202k"] = operator_config(time_step)
        except Exception as e:  # noqa: BLE001
            configs["operator-grid-202k"] = {"error": str(e)}

    out = {
        "metric": "arrow_spmm_nnz_per_s_per_chip",
        "value": headline["nnz_per_s"] if headline else None,
        "unit": "nnz/s",
        "vs_baseline": headline["vs_scipy"] if headline else None,
        "executor": headline["executor"] if headline else None,
        "configs": configs,
    }
    if headline and "distributed_nnz_per_s" in headline:
        out["arrow_spmm_distributed_nnz_per_s"] = headline[
            "distributed_nnz_per_s"]
    if comm:
        # The BA default is not minor-excluded (arrow loses there, as the
        # paper predicts); the planar grid is where the README.md:3 win
        # materializes — report both so the headline JSON is honest AND
        # shows the claim (BASELINE.md "Round-2 measurements").
        out["comm_volume"] = comm
    print(json.dumps(out))


if __name__ == "__main__":
    main()
