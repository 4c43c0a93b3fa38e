"""``spmm_petsc`` CLI — 1-D (hypergraph-)partitioned SpMM benchmark.

Flag parity with the reference (reference: scripts/spmm_petsc_main.py:11-41:
--file slice pattern, --columns, --iterations, --dryrun). Pre-partitioned
slices follow the reference's ``{name}.part.{P}.slice.{i}.npz`` naming
(reference: arrow/baseline/spmm_petsc.py:82-102).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
from scipy import sparse

import jax

from arrow_matrix_tpu.baselines import Spmm1D, build_slice_plan
from arrow_matrix_tpu.baselines.spmm_petsc import slice_mesh
from arrow_matrix_tpu.io.generate import random_csr, random_dense
from arrow_matrix_tpu.utils import metrics
from arrow_matrix_tpu.utils.args import str2bool
from arrow_matrix_tpu.version import SPMM_1D_ALGO_VERSION


def load_partitioned(file_pattern: str, n_parts: int):
    """Load ``{name}.part.P.slice.i.npz`` slices and return (A, row_counts)
    (reference: spmm_petsc.py:82-102)."""
    slices = []
    for i in range(n_parts):
        path = f"{file_pattern}.part.{n_parts}.slice.{i}.npz"
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        slices.append(sparse.load_npz(path).tocsr())
    A = sparse.vstack(slices).tocsr()
    return A, [s.shape[0] for s in slices]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--file", type=str, default=None,
                   help="slice pattern prefix (reference naming scheme)")
    p.add_argument("-c", "--columns", type=int, default=32)
    p.add_argument("--vertices", type=int, default=100_000)
    p.add_argument("--edges", type=int, default=1_000_000)
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--format", choices=["auto", "ell", "bsr", "window"],
                   default="auto",
                   help="local-block kernel: the gather path, the Pallas "
                        "BSR/MXU path with automatic k-tiling, the windowed "
                        "BSR path (naturally banded slices beyond VMEM "
                        "residency), or the calibrated cost model (the TPU "
                        "analogue of the reference's --gpu-tiling / "
                        "--memory knobs, scripts/spmm_petsc_main.py:38-41)")
    p.add_argument("--exchange", choices=["rows", "ranges"], default="rows",
                   help="ship exactly the needed remote rows (the "
                        "reference's element exchange) or the contiguous "
                        "covering ranges (its slice exchange, "
                        "arrow/baseline/spmm_petsc.py:105-176)")
    p.add_argument("--dryrun", type=str2bool, default=False)
    p.add_argument("--validate", type=str2bool, default=False)
    p.add_argument("--log_dir", type=str, default="./logs")
    p.add_argument("--timing", choices=["per_step", "fori"],
                   default="per_step",
                   help="per_step mirrors the reference's per-iteration "
                        "spans (spmm_petsc.py:471-492); fori differences a "
                        "1- vs N-iteration fori_loop of X <- A X, separating "
                        "the device step from the fixed per-dispatch cost")
    args = p.parse_args(argv)

    n_dev = args.devices or len(jax.devices())
    if args.file:
        A, counts = load_partitioned(args.file, n_dev)
        dataset = args.file
    else:
        nnz_per_row = max(1, args.edges // args.vertices)
        A = random_csr(args.vertices, args.vertices, nnz_per_row, seed=42)
        counts = None
        dataset = f"random_{args.vertices}_{args.edges}"

    plan = build_slice_plan(
        A,
        row_counts=counts,
        n_devices=n_dev,
        k_hint=args.columns,
        force_format=None if args.format == "auto" else args.format,
        exchange=args.exchange,
    )
    if args.dryrun:
        print(json.dumps({
            "n_devices": n_dev,
            "max_rows_per_pair": plan.max_per_pair,
            "rows_per_slice": plan.lmax,
        }))
        return

    metrics.wandb_init(
        algorithm=SPMM_1D_ALGO_VERSION,
        dataset=dataset,
        config={
            "n_features": args.columns,
            "iterations": args.iterations,
            "device": jax.default_backend(),
            "n_devices": n_dev,
        },
    )

    runner = Spmm1D(plan, slice_mesh(n_dev))
    X = random_dense(A.shape[0], args.columns, seed=1)
    x = runner.distribute(X)
    y = runner.step(x)
    jax.block_until_ready(y)

    if args.validate:
        ref = A @ X
        rel = np.linalg.norm(runner.collect(y) - ref) / max(1e-30, np.linalg.norm(ref))
        print(f"validation relative error: {rel:.3e}")
        assert rel < 1e-4, "validation FAILED"

    if args.timing == "fori":
        from arrow_matrix_tpu.utils.profiling import fori_time

        med = fori_time(
            runner._step, runner.device_plan, x, args.iterations
        )
        metrics.log({"spmm_time": med})
    else:
        times = []
        for it in range(args.iterations):
            metrics.set_iteration_data({"iteration": it})
            tic = time.perf_counter()
            y = runner.step(x)
            jax.block_until_ready(y)
            toc = time.perf_counter()
            times.append(toc - tic)
            metrics.log({"spmm_time": toc - tic})
        med = float(np.median(times))
    metrics.finish(args.log_dir)

    print(json.dumps({
        "median_spmm_time": med,
        "nnz": int(A.nnz),
        "nnz_per_s": A.nnz / med,
        "timing": args.timing,
    }))


if __name__ == "__main__":
    main()
