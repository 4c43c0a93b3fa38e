"""PageRank via iterated arrow SpMM — a worked end-to-end example.

The power iteration x <- d * A_norm^T x + (1-d)/n is exactly the framework's
workload: a stationary sparse matrix times an evolving tall-skinny dense
vector block. This example decomposes the column-normalized adjacency,
builds an :class:`ArrowSession`, and iterates to convergence.

    python examples/pagerank.py --vertices 100000 --width 12500
"""

from __future__ import annotations

import argparse

import numpy as np
from scipy import sparse

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert
from arrow_matrix_tpu.parallel.session import ArrowSession


def pagerank(
    A: sparse.csr_matrix,
    damping: float = 0.85,
    iterations: int = 30,
    width: int | None = None,
    n_devices: int | None = None,
) -> np.ndarray:
    n = A.shape[0]
    # Column-normalized transition matrix (dangling nodes get uniform mass
    # implicitly through the damping term).
    out_deg = np.asarray(A.sum(axis=0)).ravel()
    inv = np.divide(1.0, out_deg, out=np.zeros_like(out_deg), where=out_deg > 0)
    M = (A @ sparse.diags(inv)).tocsr().astype(np.float32)

    width = width or max(1, n // 8)
    decomp = arrow_decomposition(
        M, width, max_number_of_levels=20, block_diagonal=True, seed=0
    )
    session = ArrowSession(decomp, width, n_devices=n_devices)

    x = np.full((n, 1), 1.0 / n, dtype=np.float32)
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        session.set_features(x)
        session.step()
        x = damping * session.allgather_result() + teleport
    return x.ravel()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vertices", type=int, default=100_000)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--iterations", type=int, default=30)
    p.add_argument("--devices", type=int, default=None)
    args = p.parse_args(argv)

    A = barabasi_albert(args.vertices, 4, seed=7)
    ranks = pagerank(
        A, iterations=args.iterations, width=args.width, n_devices=args.devices
    )
    top = np.argsort(-ranks)[:10]
    print("top-10 vertices by PageRank:")
    for v in top:
        print(f"  vertex {v:8d}  rank {ranks[v]:.3e}")
    print(f"rank mass: {ranks.sum():.6f}")


if __name__ == "__main__":
    main()
