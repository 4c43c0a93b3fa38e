"""Arrow SpMM benchmark driver.

Capability parity with ``bench_spmm`` (reference: arrow/arrow_bench.py:12-137):
generate a synthetic Barabási decomposition when no path is given, load +
compile, run the timed iteration loop with per-iteration failure detection,
and emit metrics through the logging subsystem.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from arrow_matrix_tpu.bench.failure import CollectiveAbort, all_processes_succeeded
from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io import graphio
from arrow_matrix_tpu.io.generate import barabasi_albert, random_dense
from arrow_matrix_tpu.parallel import ArrowSpmm, block_mesh
from arrow_matrix_tpu.parallel.local import compile_local_plan, local_step
from arrow_matrix_tpu.plan import compile_plan
from arrow_matrix_tpu.utils import metrics
from arrow_matrix_tpu.version import ARROW_ALGO_VERSION


def bench_spmm(
    path: Optional[str] = None,
    width: int = 10_000,
    features: int = 16,
    iterations: int = 10,
    block_diagonal: bool = True,
    n_devices: Optional[int] = None,
    ba_vertices: int = 100_000,
    ba_neighbors: int = 4,
    use_npy: bool = True,
    use_mmap: bool = False,
    log_dir: str = "./logs",
    seed: int = 0,
    profile: bool = False,
    mode: str = "auto",
    state_dtype: str = "float32",
    validate: bool = False,
    timing: str = "per_step",
    row_split: int = 1,
    fresh_features: bool = True,
    routing: str = "auto",
) -> dict:
    """Run the iterated arrow SpMM benchmark; returns summary statistics.

    :param path: decomposition path prefix (graphio scheme). If None, a
        Barabási graph is generated and decomposed on the fly
        (reference: arrow_bench.py:28-41).
    :param n_devices: block-axis mesh size; defaults to all local devices,
        or 1 for the fused single-chip path.
    :param mode: single-chip executor — 'auto' picks the best one
        (``compile_single_chip``: the merged plan, or the region executor
        when the RCM refinement reveals banded structure — grid-202k 327 vs
        193M nnz/s measured); 'local' forces the merged plan; 'blocked'
        runs the distributed program's per-block stripe structure with
        width-bounded gather windows (the hardware stand-in for the
        distributed program and the basis for multi-chip projections; the
        merged plan stays ahead single-chip, 241 vs 148M nnz/s at 200k
        vertices). Ignored when n_devices > 1.
    :param state_dtype: distributed iteration-state dtype ('float32' or
        'bfloat16'); bfloat16 halves per-device state/replica HBM and the
        routing wire bytes (plan/memory.py) at ~bf16 rounding per level
        per iteration. Single-chip executors ignore it (their state is
        one buffer, not the capacity bottleneck).
    :param validate: full gather-and-compare of one device product against
        the host golden ``compute_spmm`` (the reference's 1.5D ``--validate``
        applied to the arrow path, scripts/spmm_15d_main.py:156-223); the
        relative error is printed, recorded in the stats, and raised on if
        above 1e-2.
    :param row_split: fat layout — split every block's panels over this many
        extra mesh devices (``n_devices * row_split`` total, the TPU
        generalization of the reference's 2q−1-rank fat layout / its
        ``--ranksperside`` knob, scripts/spmm_arrow_main.py:10-29 and
        arrow/arrow_mpi.py:26-93); per-device matrix and block-state bytes
        scale 1/row_split.
    :param fresh_features: re-randomize the features before every timed
        iteration — the reference's benchmark contract (each timed step is
        ``A @ fresh_X``, reference: arrow/arrow_bench.py:113-117). The
        randomization happens OUTSIDE the timed span, like the reference's.
        ``timing='fori'`` necessarily iterates the state instead
        (``A^t @ X``) and ignores this.
    """
    devices = jax.devices()
    n_devices = n_devices or len(devices)

    dataset = path or f"ba_{ba_vertices}_{ba_neighbors}"
    if path is None:
        A = barabasi_albert(ba_vertices, ba_neighbors, seed=seed)
        with metrics.span("decomposition_time"):
            decomposition = arrow_decomposition(
                A,
                width,
                max_number_of_levels=100,
                block_diagonal=block_diagonal,
                seed=seed,
            )
    else:
        loader = graphio.load_decomposition_new if use_npy else graphio.load_decomposition
        kwargs = {"mem_map": use_mmap} if use_npy else {}
        decomposition = loader(path, width, block_diagonal=block_diagonal, **kwargs)
        if not decomposition:
            raise FileNotFoundError(
                f"decomposition '{path}' width {width} not found"
            )

    metrics.wandb_init(
        algorithm=ARROW_ALGO_VERSION
        + ("_BlockDiagonal" if block_diagonal else "_Banded"),
        dataset=dataset,
        config={
            "width": width,
            "n_features": features,
            "iterations": iterations,
            "device": jax.default_backend(),
            "n_devices": n_devices,
            "levels": len(decomposition),
        },
    )

    from arrow_matrix_tpu.parallel.blocked import blocked_step, compile_blocked_plan
    from arrow_matrix_tpu.parallel.local import compile_single_chip

    distributed = n_devices > 1 or row_split > 1
    step_fn = None
    with metrics.span("plan_compile_time"):
        if distributed:
            plan = compile_plan(
                decomposition,
                width,
                n_devices,
                block_diagonal=block_diagonal,
                k_hint=features,
                row_split=row_split,
                routing=routing,
            )
        elif mode == "blocked":
            plan = compile_blocked_plan(
                decomposition, width, block_diagonal=block_diagonal,
                k_hint=features,
            )
            step_fn = blocked_step
        elif mode == "auto":
            plan, step_fn = compile_single_chip(
                decomposition, width, k_hint=features,
                state_dtype=jnp.dtype(state_dtype),
            )
        else:
            plan = compile_local_plan(
                decomposition, width, k_hint=features,
                block_diagonal=block_diagonal,
            )
            step_fn = local_step
    nnz = sum(graphio.csr_nnz(m) for m, _ in decomposition)

    rng = np.random.default_rng(seed + 1)
    if distributed:
        if row_split > 1:
            from arrow_matrix_tpu.parallel.fat import FatArrowSpmm, fat_mesh

            runner = FatArrowSpmm(
                plan,
                fat_mesh(n_devices, row_split),
                state_dtype=jnp.dtype(state_dtype),
            )
        else:
            runner = ArrowSpmm(
                plan, block_mesh(n_devices), state_dtype=jnp.dtype(state_dtype)
            )
        x = runner.distribute(random_dense(plan.n_rows, features, seed=seed + 1))
        # Profile mode: separately jitted phases emitting the reference's
        # span taxonomy (spmm_kernel_time, spmm_x_bcast_time,
        # spmm_row_reduce, forward/back_agg_all_to_all_v) per iteration
        # (reference: arrow/arrow_mpi.py:196-299). The fat runner has no
        # phased mirror — profile falls back to the fused step there.
        step = (
            runner.step_phased
            if profile and hasattr(runner, "step_phased")
            else runner.step
        )
    else:
        from arrow_matrix_tpu.parallel.local import state_cols

        dplan = jax.device_put(plan)
        # Lane-padded iteration state for the windowed fast path (zero
        # extra physical bytes; removes the per-step logical lane pads).
        cols = state_cols(plan, features)
        xh = np.zeros((plan.padded_rows, cols), np.float32)
        xh[:, :features] = rng.random(
            (plan.padded_rows, features), dtype=np.float32
        )
        # The single-chip iterated state honors the requested dtype too
        # (bf16 halves every dense byte stream of the windowed step —
        # measured ~2x, tools/probe_bf16_state.py).
        x = jnp.asarray(xh).astype(jnp.dtype(state_dtype))
        jitted = jax.jit(step_fn)
        if profile:
            # Single chip has no comm phases: the whole step is the kernel.
            def step(x):
                with metrics.span("spmm_kernel_time"):
                    y = jitted(dplan, x)
                    jax.block_until_ready(y)
                return y
        else:
            step = lambda x: jitted(dplan, x)

    if validate:
        from arrow_matrix_tpu.decomposition.arrow import compute_spmm
        from arrow_matrix_tpu.io.graphio import as_csr

        n_rows = as_csr(decomposition[0][0]).shape[0]
        Xv = random_dense(n_rows, features, seed=seed + 2)
        golden = compute_spmm(
            [(as_csr(m), np.asarray(p)) for m, p in decomposition], Xv
        )
        if distributed:
            got = runner.collect(runner.step(runner.distribute(Xv)))
        else:
            perm0 = np.asarray(plan.permutations[0])
            mask = perm0 < n_rows
            Xp = np.zeros((plan.padded_rows, features), np.float32)
            Xp[mask] = Xv[perm0[mask]]
            y = np.asarray(jitted(dplan, jnp.asarray(Xp)))
            got = np.zeros_like(Xv)
            got[perm0[mask]] = y[mask]
        rel = float(
            np.abs(got - golden).max() / max(np.abs(golden).max(), 1e-30)
        )
        print(f"validate: max rel err {rel:.3e}", flush=True)
        metrics.log({"validate_rel_err": rel})
        if rel > 1e-2:
            metrics.finish(log_dir)
            raise CollectiveAbort(f"validation failed: rel err {rel:.3e}")

    # Warm-up / compile.
    x = step(x)
    jax.block_until_ready(x)

    if timing == "fori" and not distributed and not profile:
        # Differenced 1- vs N-iteration fori_loop timing: through the axon
        # relay each dispatch carries ~15-40 ms fixed cost, which the
        # per-step taxonomy below cannot separate from the device step
        # (bench.py's scheme). Single-chip only: the distributed runner's
        # step is shard_map-jitted per call.
        from arrow_matrix_tpu.utils.profiling import fori_time

        med = fori_time(
            lambda p, v: jitted(p, v), dplan, x, max(2, iterations)
        )
        metrics.log({"spmm_time": med})
        log_path = metrics.finish(log_dir)
        stats = {
            "iterations": iterations,
            "median_spmm_time": med,
            "nnz": nnz,
            "nnz_per_s": nnz / med,
            "levels": len(decomposition),
            "timing": "fori",
            "log_path": log_path,
        }
        if validate:
            stats["validate_rel_err"] = rel
        return stats

    times = []
    for it in range(iterations):
        metrics.set_iteration_data({"iteration": it})
        if fresh_features:
            # The reference's benchmark contract: every timed step multiplies
            # FRESH random features (set on matrix-0 column ranks each
            # iteration, reference: arrow/arrow_bench.py:113-117) — the
            # randomization itself stays outside the timed span.
            if distributed:
                x = runner.distribute(
                    random_dense(plan.n_rows, features, seed=seed + 10 + it)
                )
            else:
                xh[:, :features] = rng.random(
                    (plan.padded_rows, features), dtype=np.float32
                )
                x = jnp.asarray(xh)
        ok = True
        tic = time.perf_counter()
        try:
            x = step(x)
            jax.block_until_ready(x)
        except Exception as e:  # noqa: BLE001 — mirror collective abort
            print(f"iteration {it} failed: {e}", flush=True)
            ok = False
        toc = time.perf_counter()
        if not all_processes_succeeded(ok):
            metrics.finish(log_dir)
            raise CollectiveAbort(f"iteration {it} failed on some host")
        times.append(toc - tic)
        metrics.log({"spmm_time": toc - tic})

    log_path = metrics.finish(log_dir)
    med = float(np.median(times))
    stats = {
        "iterations": iterations,
        "median_spmm_time": med,
        "nnz": nnz,
        "nnz_per_s": nnz / med if med > 0 else float("inf"),
        "levels": len(decomposition),
        "log_path": log_path,
        "timing": timing,
    }
    if validate:
        stats["validate_rel_err"] = rel
    if distributed:
        # Exact per-device communication volume of the distributed program
        # (the reference's headline O(width*k) claim, README.md:3).
        from arrow_matrix_tpu.plan.comm import arrow_comm_volume

        stats["comm_volume"] = arrow_comm_volume(plan, features)
    return stats
