"""Vectorized graph kernels on CSR matrices.

Replaces the reference's igraph calls (spanning_tree, connected_components,
bfsiter, dfs — reference: arrow/decomposition.py:147-205) and the hand-rolled
Julia kernel library (reference: julia/arrow/GraphAlgorithms.jl — union-find,
Kruskal forest, BFS, connected components). Here the heavy lifting is done by
scipy.sparse.csgraph (C implementations) plus numpy frontier expansion, so the
whole pipeline is array-oriented rather than per-vertex Python.
"""

from __future__ import annotations

import numpy as np
from scipy import sparse
from scipy.sparse import csgraph


def symmetrize_pattern(A: sparse.csr_matrix) -> sparse.csr_matrix:
    """Undirected view of a (possibly directed) adjacency: pattern of A + A^T,
    with unit weights and no explicit zeros or duplicate entries."""
    n = A.shape[0]
    coo = A.tocoo()
    rows = np.concatenate([coo.row, coo.col])
    cols = np.concatenate([coo.col, coo.row])
    data = np.ones(rows.size, dtype=np.float32)
    S = sparse.csr_matrix((data, (rows, cols)), shape=(n, n))
    S.data[:] = 1.0
    S.setdiag(0)
    S.eliminate_zeros()
    return S


def total_degrees(
    A: sparse.csr_matrix, symmetric: bool = False
) -> np.ndarray:
    """Degree of each vertex counting both in- and out-edges (igraph's
    ``degree(mode='all')`` semantics used by the reference's pruning step,
    reference: arrow/decomposition.py:253-256).

    :param symmetric: the caller asserts the PATTERN of ``A`` is symmetric
        (the reference Julia pipeline's ``symmetric::Bool``,
        julia/arrow/ArrowDecomposition.jl:119-124); then in-degree equals
        out-degree and the column histogram — the hottest host phase at
        100M+-edge scale — is skipped entirely.
    """
    A = A.tocsr()
    out_deg = np.diff(A.indptr)
    if symmetric:
        return 2 * out_deg
    from arrow_matrix_tpu.decomposition import native

    if native.AVAILABLE and A.nnz >= (1 << 20):
        in_deg = native.bincount_indices(A.indices, A.shape[0])
    else:
        in_deg = np.bincount(A.indices, minlength=A.shape[0])
    return out_deg + in_deg


def connected_component_labels(A_sym: sparse.csr_matrix) -> tuple[int, np.ndarray]:
    """Weakly connected components. Labels are ordered by first occurrence, so
    component k's smallest vertex increases with k (matches processing
    components in discovery order, reference: arrow/decomposition.py:181-205).
    """
    n_comp, labels = csgraph.connected_components(A_sym, directed=False)
    return n_comp, labels


def random_spanning_forest(
    A_sym: sparse.csr_matrix, rng: np.random.Generator
) -> sparse.csr_matrix:
    """Random spanning forest of an undirected graph: minimum spanning forest
    under i.i.d. random edge weights (the reference draws random weights and
    calls igraph ``spanning_tree``, reference: arrow/decomposition.py:176-177).

    Returns the forest as a symmetric CSR pattern matrix.
    """
    W = A_sym.tocsr(copy=True)
    # Strictly positive weights: scipy's MST drops explicit zeros.
    W.data = rng.uniform(0.1, 1.0, size=W.data.size).astype(np.float64)
    # Symmetrize weights (min of the two directions) so the MST sees one
    # weight per undirected edge.
    W = W.minimum(W.T)
    F = csgraph.minimum_spanning_tree(W)
    F = F + F.T
    F.data[:] = 1.0
    return F.tocsr()


def _csr_neighbor_expand(
    indptr: np.ndarray, indices: np.ndarray, nodes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """For a set of nodes, return (srcs, dsts) of all incident CSR edges,
    vectorized (srcs repeats each node by its degree)."""
    starts = indptr[nodes]
    stops = indptr[nodes + 1]
    counts = stops - starts
    total = int(counts.sum())
    if total == 0:
        e = np.empty(0, dtype=indices.dtype)
        return e, e
    # Build a flat index array covering [starts_i, stops_i) for every node.
    offsets = np.repeat(stops - np.cumsum(counts), counts)
    flat = offsets + np.arange(total, dtype=np.int64)
    srcs = np.repeat(nodes, counts)
    return srcs, indices[flat]


def root_forest(
    F: sparse.csr_matrix, roots: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Root an undirected forest at the given roots (one per tree) by
    multi-source BFS, entirely with numpy frontier expansion.

    Returns (pred, depth): ``pred[v]`` is the parent of v (-1 for roots),
    ``depth[v]`` the distance to its root. Rooting via BFS yields the same
    tree as the reference's DFS rooting (reference:
    arrow/decomposition.py:192-199) because the input is a forest.
    """
    n = F.shape[0]
    pred = np.full(n, -1, dtype=np.int64)
    depth = np.full(n, -1, dtype=np.int64)
    visited = np.zeros(n, dtype=bool)
    visited[roots] = True
    depth[roots] = 0
    frontier = np.asarray(roots, dtype=np.int64)
    d = 0
    indptr, indices = F.indptr, F.indices
    while frontier.size:
        d += 1
        srcs, dsts = _csr_neighbor_expand(indptr, indices, frontier)
        new_mask = ~visited[dsts]
        new_dsts = dsts[new_mask]
        new_srcs = srcs[new_mask]
        if new_dsts.size == 0:
            break
        # In a forest each unvisited vertex has exactly one visited neighbor
        # in the frontier, so (new_srcs, new_dsts) pairs are already unique.
        pred[new_dsts] = new_srcs
        depth[new_dsts] = d
        visited[new_dsts] = True
        frontier = new_dsts
    return pred, depth


def subtree_sizes(pred: np.ndarray, depth: np.ndarray) -> np.ndarray:
    """Subtree size of every vertex of a rooted forest.

    Vectorized per depth level (deepest first), replacing the reference's
    reverse-topological Python loop (reference: arrow/decomposition.py:217-227).
    """
    n = pred.size
    sizes = np.ones(n, dtype=np.int64)
    if n == 0:
        return sizes
    max_depth = int(depth.max())
    order_by_depth = np.argsort(depth, kind="stable")
    level_starts = np.searchsorted(depth[order_by_depth], np.arange(max_depth + 2))
    for d in range(max_depth, 0, -1):
        nodes_d = order_by_depth[level_starts[d] : level_starts[d + 1]]
        np.add.at(sizes, pred[nodes_d], sizes[nodes_d])
    return sizes


def bfs_order(A_sym: sparse.csr_matrix) -> np.ndarray:
    """Deterministic BFS linear order over all components: vertices sorted by
    (component label, BFS level, vertex id), each component traversed from its
    smallest vertex. Parity with the reference's Cuthill-McKee-style fallback
    used on the deterministic last level (reference:
    arrow/decomposition.py:147-162)."""
    n = A_sym.shape[0]
    n_comp, labels = connected_component_labels(A_sym)
    # Smallest vertex of each component (labels ordered by first occurrence).
    first_idx = np.full(n_comp, n, dtype=np.int64)
    np.minimum.at(first_idx, labels, np.arange(n, dtype=np.int64))
    _, depth = root_forest_like_bfs_levels(A_sym, first_idx)
    return np.lexsort((np.arange(n), depth, labels))


def root_forest_like_bfs_levels(
    A_sym: sparse.csr_matrix, roots: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Multi-source BFS levels on a general undirected graph (not necessarily
    a forest). Returns (pred, depth); pred is one arbitrary BFS parent."""
    n = A_sym.shape[0]
    pred = np.full(n, -1, dtype=np.int64)
    depth = np.full(n, -1, dtype=np.int64)
    visited = np.zeros(n, dtype=bool)
    visited[roots] = True
    depth[roots] = 0
    frontier = np.asarray(roots, dtype=np.int64)
    d = 0
    indptr, indices = A_sym.indptr, A_sym.indices
    while frontier.size:
        d += 1
        srcs, dsts = _csr_neighbor_expand(indptr, indices, frontier)
        new_mask = ~visited[dsts]
        new_dsts = dsts[new_mask]
        new_srcs = srcs[new_mask]
        if new_dsts.size == 0:
            break
        # General graphs: the same vertex can be discovered from several
        # frontier vertices in one level — dedupe.
        uniq, first = np.unique(new_dsts, return_index=True)
        pred[uniq] = new_srcs[first]
        depth[uniq] = d
        visited[uniq] = True
        frontier = uniq
    return pred, depth
