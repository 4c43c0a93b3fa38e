"""Synthetic graph/matrix generators (host-side, numpy).

Replaces the reference's igraph fixtures (``igraph.Graph.Barabasi`` /
``Erdos_Renyi``, reference: tests/test_arrowdecomposition.py:14-22) and its
random CSR / dense generators (reference: arrow/common/utils.py:63-99).
"""

from __future__ import annotations

import numpy as np
from scipy import sparse


def barabasi_albert(
    n: int, m: int, seed: int | None = None, directed: bool = False
) -> sparse.csr_matrix:
    """Barabási–Albert preferential-attachment graph as a CSR adjacency.

    Each new vertex attaches to ``m`` existing vertices sampled by degree
    (with replacement collapsed to simple edges). Produces the same power-law
    degree structure as the reference's igraph fixtures
    (reference: tests/test_arrowdecomposition.py:15-18).
    """
    rng = np.random.default_rng(seed)
    # Repeated-endpoint pool for preferential attachment (each endpoint
    # appears once per incident edge); preallocated so the per-vertex work is
    # O(m), not O(degree sum).
    pool = np.empty(2 * m * n + n, dtype=np.int64)
    pool_size = 0
    edge_src = np.empty(m * n, dtype=np.int64)
    edge_dst = np.empty(m * n, dtype=np.int64)
    n_edges = 0
    for v in range(1, n):
        k = min(m, v)
        if pool_size:
            picks = np.unique(pool[rng.integers(0, pool_size, size=k)])
        else:
            picks = np.zeros(1, dtype=np.int64)
        c = picks.size
        edge_src[n_edges : n_edges + c] = v
        edge_dst[n_edges : n_edges + c] = picks
        n_edges += c
        pool[pool_size : pool_size + c] = picks
        pool[pool_size + c : pool_size + 2 * c] = v
        pool_size += 2 * c
    rows = edge_src[:n_edges]
    cols = edge_dst[:n_edges]
    if not directed:
        rows, cols = np.concatenate([rows, cols]), np.concatenate([cols, rows])
    A = sparse.csr_matrix(
        (np.ones(rows.size, dtype=np.float32), (rows, cols)), shape=(n, n)
    )
    A.data[:] = 1.0
    A.sum_duplicates()
    A.sort_indices()
    return A


def erdos_renyi(n: int, p: float, seed: int | None = None) -> sparse.csr_matrix:
    """G(n, p) undirected simple graph as CSR adjacency
    (reference fixture: tests/test_arrowdecomposition.py:17)."""
    rng = np.random.default_rng(seed)
    # Sample the upper triangle.
    mask = rng.random((n, n)) < p
    mask = np.triu(mask, k=1)
    rows, cols = np.nonzero(mask)
    rows, cols = np.concatenate([rows, cols]), np.concatenate([cols, rows])
    A = sparse.csr_matrix(
        (np.ones(rows.size, dtype=np.float32), (rows, cols)), shape=(n, n)
    )
    A.sort_indices()
    return A


def random_csr(
    n_rows: int,
    n_cols: int,
    nnz_per_row: int,
    seed: int | None = None,
    dtype=np.float32,
) -> sparse.csr_matrix:
    """Random CSR with a fixed nonzero count per row
    (reference: arrow/common/utils.py:63-87)."""
    rng = np.random.default_rng(seed)
    cols = rng.integers(0, n_cols, size=(n_rows, nnz_per_row))
    rows = np.repeat(np.arange(n_rows), nnz_per_row)
    data = rng.uniform(-1.0, 1.0, size=rows.size).astype(dtype)
    A = sparse.csr_matrix((data, (rows, cols.ravel())), shape=(n_rows, n_cols))
    A.sum_duplicates()
    A.sort_indices()
    return A


def random_dense(
    n_rows: int, n_cols: int, seed: int | None = None, dtype=np.float32
) -> np.ndarray:
    """Random dense matrix in [-1, 1) (reference: arrow/common/utils.py:90-99)."""
    rng = np.random.default_rng(seed)
    return (2.0 * rng.random((n_rows, n_cols)) - 1.0).astype(dtype)


def structured_arrow_matrix(
    n: int, width: int, seed: int | None = None, density: float = 0.3
) -> sparse.csr_matrix:
    """Dense-ish structured arrow fixture: random head row/column panels plus
    a diagonal, with some deliberately zeroed rows/columns to exercise
    compaction paths (reference: tests/test_arrowmpi.py:407-421)."""
    rng = np.random.default_rng(seed)
    A = np.zeros((n, n), dtype=np.float32)
    head = (rng.random((width, n)) < density) * rng.random((width, n))
    A[:width, :] = head
    A[:, :width] = (rng.random((n, width)) < density) * rng.random((n, width))
    A[np.arange(n), np.arange(n)] = rng.random(n)
    # Zero a few rows/columns entirely.
    kill = rng.choice(n, size=max(1, n // 16), replace=False)
    A[kill, :] = 0.0
    A[:, kill] = 0.0
    return sparse.csr_matrix(A.astype(np.float32))


def grid_graph(side: int, seed: int | None = None) -> sparse.csr_matrix:
    """2-D grid graph (side x side vertices, 4-neighbor) — a planar family,
    the structure class for which the arrow decomposition guarantees
    polynomial communication reduction (reference: README.md:3)."""
    n = side * side
    idx = np.arange(n).reshape(side, side)
    rows, cols = [], []
    rows.append(idx[:, :-1].ravel()); cols.append(idx[:, 1:].ravel())
    rows.append(idx[:-1, :].ravel()); cols.append(idx[1:, :].ravel())
    r = np.concatenate(rows); c = np.concatenate(cols)
    rr, cc = np.concatenate([r, c]), np.concatenate([c, r])
    A = sparse.csr_matrix(
        (np.ones(rr.size, dtype=np.float32), (rr, cc)), shape=(n, n)
    )
    A.sum_duplicates()
    return A


def rmat_graph(
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int | None = None,
    symmetric: bool = True,
) -> sparse.csr_matrix:
    """Graph500-style RMAT power-law graph, fully vectorized — the big-graph
    stand-in for the reference's SuiteSparse datasets (kmer_V2a, mawi, ...,
    reference: scripts/decomposition_main.py:126), which need downloads this
    environment cannot perform. 2**scale vertices, ~edge_factor * n edges;
    generation is O(scale) vectorized passes over the edge list.
    """
    rng = np.random.default_rng(seed)
    n = 1 << scale
    m = edge_factor * n
    src = np.zeros(m, dtype=np.int64)
    dst = np.zeros(m, dtype=np.int64)
    ab, abc = a + b, a + b + c
    for _ in range(scale):
        r = rng.random(m)
        right = r >= ab  # bottom half (c or d quadrant)
        low = (r >= a) & (r < ab) | (r >= abc)  # b or d quadrant
        src = (src << 1) | right
        dst = (dst << 1) | low
    keep = src != dst  # drop self-loops
    src, dst = src[keep], dst[keep]
    if symmetric:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    A = sparse.csr_matrix(
        (np.ones(src.size, dtype=np.float32), (src, dst)), shape=(n, n)
    )
    A.sum_duplicates()
    A.data[:] = 1.0
    return A
