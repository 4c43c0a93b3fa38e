"""``spmm_15d`` CLI — 1.5D A-stationary SpMM benchmark.

Flag parity with the reference (reference: scripts/spmm_15d_main.py:21-69:
--dataset random|file, --vertices, --edges, --columns, --replication 0=auto,
--validate, --iterations).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax

from arrow_matrix_tpu.baselines import Spmm15D, grid_mesh
from arrow_matrix_tpu.baselines.spmm_15d import replication_factor
from arrow_matrix_tpu.io import graphio
from arrow_matrix_tpu.io.generate import random_csr, random_dense
from arrow_matrix_tpu.utils import metrics
from arrow_matrix_tpu.utils.args import str2bool
from arrow_matrix_tpu.version import SPMM_15D_ALGO_VERSION


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=["random", "file"], default="random")
    p.add_argument("--file", type=str, default=None,
                   help=".npz matrix path, or a prefix of memory-mapped "
                        "{prefix}_indptr/_indices[/_data].npy triplets "
                        "(reference: scripts/spmm_15d_main.py:114-120)")
    p.add_argument("-v", "--vertices", type=int, default=100_000)
    p.add_argument("-e", "--edges", type=int, default=1_000_000)
    p.add_argument("-c", "--columns", type=int, default=128)
    p.add_argument("--replication", type=int, default=0, help="0 = auto")
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--validate", type=str2bool, default=False)
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--format", choices=["auto", "ell", "bsr", "window"],
                   default="auto",
                   help="local-block kernel: the gather path, the Pallas "
                        "BSR/MXU path with automatic k-tiling, the windowed "
                        "BSR path (naturally banded matrices beyond VMEM "
                        "residency), or the calibrated cost model (the TPU "
                        "analogue of the reference's --gpu-tiling knob, "
                        "scripts/spmm_15d_main.py:68)")
    p.add_argument("--log_dir", type=str, default="./logs")
    p.add_argument("--timing", choices=["per_step", "fori"],
                   default="per_step",
                   help="per_step mirrors the reference's timeit loop "
                        "(scripts/spmm_15d_main.py:231-276); fori differences "
                        "a 1- vs N-iteration fori_loop of the square step "
                        "X <- A X, separating the device step from the fixed "
                        "per-dispatch relay cost")
    args = p.parse_args(argv)

    n_dev = args.devices or len(jax.devices())
    c = args.replication or replication_factor(n_dev)
    if n_dev % c:
        raise SystemExit(f"devices ({n_dev}) must be divisible by replication ({c})")

    if args.dataset == "file":
        import os

        from scipy import sparse

        if args.file.endswith(".npz"):
            A = sparse.load_npz(args.file).tocsr()
        else:
            # Memory-mapped npy triplet prefix; a missing _data.npy means an
            # unweighted matrix (reference: scripts/spmm_15d_main.py:114-120).
            mm = lambda p: np.lib.format.open_memmap(p, mode="r")
            indptr = mm(f"{args.file}_indptr.npy")
            indices = mm(f"{args.file}_indices.npy")
            data_path = f"{args.file}_data.npy"
            data = (
                mm(data_path)
                if os.path.exists(data_path)
                else np.ones(indices.shape[0], dtype=np.float32)
            )
            A = (data, indices, indptr)
        dataset = args.file
    else:
        nnz_per_row = max(1, args.edges // args.vertices)
        A = random_csr(args.vertices, args.vertices, nnz_per_row, seed=42)
        dataset = f"random_{args.vertices}_{args.edges}"

    metrics.wandb_init(
        algorithm=f"{SPMM_15D_ALGO_VERSION}_c_{c}",
        dataset=dataset,
        config={
            "n_features": args.columns,
            "iterations": args.iterations,
            "device": jax.default_backend(),
            "n_devices": n_dev,
            "replication": c,
        },
    )

    runner = Spmm15D(
        A,
        grid_mesh(n_dev // c, c),
        k_hint=args.columns,
        force_format=None if args.format == "auto" else args.format,
    )
    nnz = graphio.csr_nnz(A)
    X = random_dense(runner.NK, args.columns, seed=1)
    x = runner.distribute(X)
    y = runner.spmm(x)
    jax.block_until_ready(y)

    if args.validate:
        ref = graphio.as_csr(A) @ X
        got = runner.collect(y)
        rel = np.linalg.norm(got - ref) / max(1e-30, np.linalg.norm(ref))
        print(f"validation relative error: {rel:.3e}")
        assert rel < 1e-4, "validation FAILED"

    if args.timing == "fori":
        from arrow_matrix_tpu.utils.profiling import fori_time

        med = fori_time(
            runner._step, runner.device_lA, x, args.iterations
        )
        metrics.log({"spmm_time": med})
    else:
        times = []
        for it in range(args.iterations):
            metrics.set_iteration_data({"iteration": it})
            tic = time.perf_counter()
            y = runner.spmm(x)
            jax.block_until_ready(y)
            toc = time.perf_counter()
            times.append(toc - tic)
            metrics.log({"spmm_time": toc - tic})
        med = float(np.median(times))
    metrics.finish(args.log_dir)

    print(json.dumps({
        "median_spmm_time": med,
        "nnz": nnz,
        "nnz_per_s": nnz / med,
        "replication": c,
        "timing": args.timing,
        "format": runner.fmt,
    }))


if __name__ == "__main__":
    main()
