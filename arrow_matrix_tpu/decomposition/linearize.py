"""Linear-arrangement heuristics for the arrow decomposition.

Replaces the reference's spanning-forest + subtree-size-DFS linearization
(reference: arrow/decomposition.py:165-251) with a fully vectorized
formulation: instead of walking the tree with an explicit Python stack, the
DFS preorder position of every vertex is computed in closed form by
level-synchronous prefix sums over the rooted forest.

The heuristic is identical: each tree is traversed in DFS preorder visiting
children in increasing subtree-size order (small subtrees first), which keeps
tree edges short in the resulting linear order and hence keeps most graph
edges inside the arrow band.
"""

from __future__ import annotations

import numpy as np
from scipy import sparse

from arrow_matrix_tpu.decomposition import graphalgs


def linearize_rooted_forest(
    pred: np.ndarray,
    depth: np.ndarray,
    root_order: np.ndarray,
) -> np.ndarray:
    """Compute the DFS-preorder linear arrangement of a rooted forest with
    children visited in increasing subtree-size order.

    Closed form: ``pos[v] = pos[parent] + 1 + sum(sizes of siblings of v that
    are visited before v)``, evaluated one depth level at a time (vectorized),
    which is equivalent to the reference's explicit stack traversal
    (reference: arrow/decomposition.py:230-241) but O(depth) numpy passes.

    :param pred: parent of each vertex, -1 for roots.
    :param depth: depth of each vertex in its tree.
    :param root_order: the tree roots in the order their trees should be
        concatenated in the final arrangement.
    :return: ``order`` such that order[i] = vertex at position i.
    """
    n = pred.size
    sizes = graphalgs.subtree_sizes(pred, depth)

    # Sibling rank: sort all vertices by (parent, subtree size, id); within
    # each sibling group the cumulative size of earlier siblings gives the
    # preorder offset relative to the parent.
    sib_sort = np.lexsort((np.arange(n), sizes, pred))
    sorted_pred = pred[sib_sort]
    sorted_sizes = sizes[sib_sort]
    cum = np.cumsum(sorted_sizes)
    # Start of each parent-group in the sorted array.
    group_start = np.ones(n, dtype=bool)
    group_start[1:] = sorted_pred[1:] != sorted_pred[:-1]
    group_base = np.where(group_start, cum - sorted_sizes, 0)
    np.maximum.accumulate(group_base, out=group_base)
    before_sorted = cum - sorted_sizes - group_base
    before = np.empty(n, dtype=np.int64)
    before[sib_sort] = before_sorted

    # Roots: positioned by concatenating whole trees in root_order.
    pos = np.full(n, -1, dtype=np.int64)
    root_sizes = sizes[root_order]
    pos[root_order] = np.concatenate(([0], np.cumsum(root_sizes)[:-1]))

    # Level-synchronous propagation of positions down the trees.
    max_depth = int(depth.max()) if n else -1
    order_by_depth = np.argsort(depth, kind="stable")
    level_starts = np.searchsorted(depth[order_by_depth], np.arange(max_depth + 2))
    for d in range(1, max_depth + 1):
        nodes_d = order_by_depth[level_starts[d] : level_starts[d + 1]]
        pos[nodes_d] = pos[pred[nodes_d]] + 1 + before[nodes_d]

    order = np.empty(n, dtype=np.int64)
    order[pos] = np.arange(n, dtype=np.int64)
    return order


def linearize_with_random_forest(
    A_sub: sparse.csr_matrix,
    rng: np.random.Generator,
    use_native: bool = True,
) -> np.ndarray:
    """Random-spanning-forest linearization (the reference's default,
    reference: arrow/decomposition.py:165-205): draw a random spanning forest,
    root each tree at its component's smallest vertex, and emit the
    subtree-size DFS preorder, one component after another.

    Dispatches to the C++ core (union-find Kruskal + DFS linearizer) when it
    has been built — the analogue of the reference's Julia fast path for
    huge graphs (reference: julia/arrow/GraphAlgorithms.jl).

    :return: order over the vertices of A_sub (order[i] = local vertex id).
    """
    n = A_sub.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    A_sym = graphalgs.symmetrize_pattern(A_sub)

    from arrow_matrix_tpu.decomposition import native

    if use_native and native.AVAILABLE:
        weights = rng.uniform(0.1, 1.0, size=A_sym.nnz)
        pred, _ = native.random_spanning_forest(
            A_sym.indptr, A_sym.indices, weights
        )
        roots = np.flatnonzero(pred == -1)
        return native.linearize_forest(pred, roots)
    forest = graphalgs.random_spanning_forest(A_sym, rng)
    n_comp, labels = graphalgs.connected_component_labels(A_sym)
    roots = np.full(n_comp, n, dtype=np.int64)
    np.minimum.at(roots, labels, np.arange(n, dtype=np.int64))
    pred, depth = graphalgs.root_forest(forest, roots)
    # Isolated vertices (not touched by the forest CSR) are their own roots.
    lonely = depth < 0
    if lonely.any():
        depth[lonely] = 0
        pred[lonely] = -1
        roots = np.full(n, n, dtype=np.int64)
        np.minimum.at(roots, labels, np.arange(n, dtype=np.int64))
        roots = roots[:n_comp]
    return linearize_rooted_forest(pred, depth, roots)


def linearize_bfs(A_sub: sparse.csr_matrix) -> np.ndarray:
    """Deterministic BFS linearization, used for the last decomposition level
    (reference: arrow/decomposition.py:147-162, `linearize_with_ck`)."""
    if A_sub.shape[0] == 0:
        return np.empty(0, dtype=np.int64)
    A_sym = graphalgs.symmetrize_pattern(A_sub)
    return graphalgs.bfs_order(A_sym)
