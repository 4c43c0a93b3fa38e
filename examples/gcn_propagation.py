"""GCN-style feature propagation via iterated arrow SpMM — the reference's
motivating workload (SURVEY: "the computational core of GNN propagation").

Each layer of a simplified graph convolution (SGC / GCN without training)
computes ``H <- relu(Â H W)`` with ``Â = D^{-1/2} (A + I) D^{-1/2}`` the
symmetrically normalized adjacency. The sparse propagation ``Â H`` is the
framework's iterated SpMM (decompose once, iterate); the small dense
``H W`` feature mix and the nonlinearity run as ordinary jax ops on the
same chip. Validated against a scipy reference model.

    python examples/gcn_propagation.py --vertices 100000 --features 16 --layers 3
"""

from __future__ import annotations

import argparse

import numpy as np
from scipy import sparse

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert
from arrow_matrix_tpu.parallel.session import ArrowSession


def normalized_adjacency(A: sparse.csr_matrix) -> sparse.csr_matrix:
    """``D^{-1/2} (A + I) D^{-1/2}`` — the GCN propagation operator."""
    n = A.shape[0]
    A_hat = (A + sparse.eye(n, format="csr", dtype=np.float32)).tocsr()
    deg = np.asarray(A_hat.sum(axis=1)).ravel()
    d_inv_sqrt = np.divide(
        1.0, np.sqrt(deg), out=np.zeros_like(deg), where=deg > 0
    )
    D = sparse.diags(d_inv_sqrt.astype(np.float32))
    return (D @ A_hat @ D).tocsr().astype(np.float32)


def gcn_propagate(
    A: sparse.csr_matrix,
    H: np.ndarray,
    weights: list[np.ndarray],
    width: int | None = None,
    n_devices: int | None = None,
) -> np.ndarray:
    """Run ``H <- relu(Â H W_l)`` for each layer weight ``W_l`` (the last
    layer is linear, matching the usual GCN head)."""
    import jax.numpy as jnp

    n = A.shape[0]
    M = normalized_adjacency(A)
    width = width or max(1, n // 8)
    decomp = arrow_decomposition(
        M, width, max_number_of_levels=20, block_diagonal=True, seed=0
    )
    session = ArrowSession(decomp, width, n_devices=n_devices)

    H = np.asarray(H, dtype=np.float32)
    for layer, W in enumerate(weights):
        session.set_features(H)
        session.step()
        P = session.allgather_result()  # Â H
        Z = jnp.asarray(P) @ jnp.asarray(W, dtype=jnp.float32)
        if layer + 1 < len(weights):
            Z = jnp.maximum(Z, 0.0)
        H = np.asarray(Z)
    return H


def reference_model(A, H, weights):
    """Host scipy/numpy golden of the same propagation."""
    M = normalized_adjacency(A)
    H = np.asarray(H, dtype=np.float32)
    for layer, W in enumerate(weights):
        H = (M @ H) @ W
        if layer + 1 < len(weights):
            H = np.maximum(H, 0.0)
    return H


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vertices", type=int, default=100_000)
    p.add_argument("--neighbors", type=int, default=4)
    p.add_argument("--features", type=int, default=16)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--validate", action="store_true")
    args = p.parse_args(argv)

    rng = np.random.default_rng(0)
    A = barabasi_albert(args.vertices, args.neighbors, seed=1)
    n = A.shape[0]
    H0 = rng.standard_normal((n, args.features)).astype(np.float32)
    dims = [args.features] + [args.hidden] * (args.layers - 1) + [args.hidden]
    weights = [
        (rng.standard_normal((dims[i], dims[i + 1])) / np.sqrt(dims[i]))
        .astype(np.float32)
        for i in range(args.layers)
    ]

    H = gcn_propagate(A, H0, weights, width=args.width,
                      n_devices=args.devices)
    print(f"propagated embeddings: {H.shape}, |H|_F = {np.linalg.norm(H):.4f}")

    if args.validate:
        ref = reference_model(A, H0, weights)
        rel = np.linalg.norm(H - ref) / max(1e-30, np.linalg.norm(ref))
        print(f"relative error vs scipy reference: {rel:.3e}")
        assert rel < 1e-4, "validation FAILED"


if __name__ == "__main__":
    main()
