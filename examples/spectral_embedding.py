"""Spectral embedding via block subspace iteration on the arrow framework.

Computes the top-k eigenvector block of the symmetrically-normalized
adjacency ``A_norm = D^-1/2 A D^-1/2`` with orthogonal (subspace) iteration
on the shifted operator ``M = (I + A_norm) / 2`` (PSD, spectrum in [0, 1] —
the shift removes the ±lambda degeneracy of bipartite graphs like grids):
repeat ``Y <- M @ X; X <- qr(Y).Q``. The SpMM — a stationary sparse matrix
times a k-column dense block, iterated — is exactly the framework's
workload (the reference's motivating GNN-propagation/spectral use case,
reference: README.md:3); the per-iteration QR on the tall-skinny block runs
as a host step between device iterations.

On a planar/banded graph the session automatically selects the RCM-refined
region executor (MXU path); on power-law graphs it keeps the merged
gather-ELL plan.

    python examples/spectral_embedding.py --side 300 --k 8
"""

from __future__ import annotations

import argparse

import numpy as np
from scipy import sparse

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import grid_graph
from arrow_matrix_tpu.parallel.session import ArrowSession


def normalized_adjacency(A: sparse.csr_matrix) -> sparse.csr_matrix:
    deg = np.asarray(A.sum(axis=1)).ravel()
    inv_sqrt = np.divide(
        1.0, np.sqrt(deg), out=np.zeros_like(deg), where=deg > 0
    )
    D = sparse.diags(inv_sqrt)
    return (D @ A @ D).tocsr().astype(np.float32)


def spectral_embedding(
    A: sparse.csr_matrix,
    k: int = 8,
    iterations: int = 25,
    width: int | None = None,
    n_devices: int | None = None,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k eigenpairs of the normalized adjacency by subspace iteration.

    :returns: (eigenvalue estimates (k,), embedding (n, k)).
    """
    n = A.shape[0]
    M = (
        0.5 * (sparse.identity(n, dtype=np.float32) + normalized_adjacency(A))
    ).tocsr()
    width = width or max(1, n // 8)
    decomp = arrow_decomposition(
        M, width, max_number_of_levels=20, block_diagonal=True, seed=seed
    )
    session = ArrowSession(decomp, width, n_devices=n_devices, features=k)

    def apply(X):
        session.set_features(X)
        session.step()
        return session.allgather_result()

    rng = np.random.default_rng(seed)
    X, _ = np.linalg.qr(rng.standard_normal((n, k)).astype(np.float32))
    X = np.ascontiguousarray(X, dtype=np.float32)
    for _ in range(iterations):
        X, _ = np.linalg.qr(apply(X))
        X = np.ascontiguousarray(X, dtype=np.float32)
    # Rayleigh quotients of A_norm (undo the shift: lambda = 2*mu - 1), then
    # rotate X into the Ritz basis for per-vector eigenpairs.
    H = X.T.astype(np.float64) @ apply(X).astype(np.float64)
    H = 2.0 * (H + H.T) / 2.0 - np.eye(k)
    eigs, W = np.linalg.eigh(H)
    order = np.argsort(-eigs)
    return eigs[order], (X @ W[:, order]).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--side", type=int, default=300,
                   help="grid side (planar family; n = side^2)")
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--iterations", type=int, default=25)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--check", action="store_true",
                   help="cross-check against scipy eigsh (host Lanczos)")
    args = p.parse_args(argv)

    A = grid_graph(args.side)
    eigs, X = spectral_embedding(
        A, k=args.k, iterations=args.iterations, width=args.width,
        n_devices=args.devices,
    )
    print("leading eigenvalue estimates of D^-1/2 A D^-1/2:")
    for i, ev in enumerate(eigs):
        print(f"  lambda_{i}: {ev:+.6f}")
    # The normalized adjacency's spectrum lies in [-1, 1] with lambda_0 = 1
    # on a connected graph; grid spectra cluster near the top, so subspace
    # iteration needs many iterations for tight eigenvalues (increase
    # --iterations for more digits).
    print(f"embedding shape: {X.shape}, lambda_0 error: {abs(eigs[0]-1):.2e}")
    if args.check:
        from scipy.sparse.linalg import eigsh

        ref = np.sort(eigsh(normalized_adjacency(A), k=args.k,
                            which="LA", return_eigenvectors=False))[::-1]
        print("scipy eigsh reference:", np.array2string(ref, precision=6))
        print(f"max |lambda - ref|: {np.abs(eigs - ref).max():.2e}")


if __name__ == "__main__":
    main()
