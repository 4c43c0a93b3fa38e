"""Arrow matrix decomposition on scipy CSR matrices.

Capability parity with the reference's igraph implementation (reference:
arrow/decomposition.py:32-144) and the Julia rewrite (reference:
julia/arrow/ArrowDecomposition.jl:215-278), re-designed array-first:

* edge selection is a vectorized boolean mask over the COO coordinates instead
  of per-edge igraph ``es.select`` lambdas (the reference notes those lambdas
  dominate runtime, reference: arrow/decomposition.py:84);
* matrix values (edge weights) are carried through every level — the reference
  pipeline goes through igraph and therefore only supports unit weights;
* the recursion produces, per level, the *permuted* CSR matrix ``B_i`` such
  that ``A = sum_i P_i^T B_i P_i`` with ``P_i`` the permutation matrix of
  ``permutation_i`` (row i of P is e_{perm[i]}).
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy import sparse

from arrow_matrix_tpu.decomposition import graphalgs, linearize
from arrow_matrix_tpu.decomposition import native as _native


@dataclasses.dataclass
class ArrowGraph:
    """One level of an arrow decomposition.

    :param matrix: the permuted adjacency ``B_i`` whose nonzeros satisfy the
        arrow property (head rows/columns + band or diagonal blocks).
    :param permutation: ``permutation[i] = j`` means row/column i of
        ``matrix`` corresponds to vertex j of the original matrix
        (same convention as reference: arrow/decomposition.py:6-29).
    :param arrow_width: width of the head / band (may exceed the requested
        width on the final best-effort level).
    :param nonzero_rows: number of rows with at least one nonzero in the row
        or the corresponding column (leading rows; trailing rows are
        structurally empty and can be truncated into blocks).
    """

    matrix: sparse.csr_matrix
    permutation: np.ndarray
    arrow_width: int
    nonzero_rows: int

    def __iter__(self):
        # Tuple-unpacking compatibility: (matrix, permutation), mirroring the
        # reference ArrowGraph __getitem__ (reference: arrow/decomposition.py:23-29).
        return iter((self.matrix, self.permutation))

    def __getitem__(self, item):
        return (self.matrix, self.permutation)[item]


def get_arrow_width(B: sparse.csr_matrix, initial_width: int) -> int:
    """Actual arrow width of a permuted matrix: the largest band offset among
    edges entirely outside the head (reference: arrow/decomposition.py:57-62,
    including its strict ``> width`` head test)."""
    coo = B.tocoo()
    mask = (coo.row > initial_width) & (coo.col > initial_width)
    if not mask.any():
        return initial_width
    return max(initial_width, int(np.abs(coo.row[mask] - coo.col[mask]).max()))


def _count_nonzero_rows(B: sparse.csr_matrix, symmetric: bool = False) -> int:
    """Leading count of rows that are nonzero in row or column direction.
    Trailing all-zero rows/columns can be cut into fewer blocks (reference:
    arrow/arrow_dec_mpi.py:612-627 counts trailing zero rows)."""
    deg = graphalgs.total_degrees(B, symmetric=symmetric)
    nz = np.nonzero(deg)[0]
    if nz.size == 0:
        return 0
    return int(nz[-1]) + 1


def _arrow_linear_order(
    A: sparse.csr_matrix,
    arrow_width: int,
    deterministic: bool,
    rng: np.random.Generator,
    native: bool = True,
    symmetric: bool = False,
) -> np.ndarray:
    """Linear order for one level: prune the ``arrow_width`` highest-degree
    vertices to the front, linearize the positive-degree remainder with the
    spanning-forest heuristic (or BFS when deterministic), singletons last
    (reference: arrow/decomposition.py:253-281)."""
    n = A.shape[0]
    deg = graphalgs.total_degrees(A, symmetric=symmetric)
    by_cost = np.argsort(-deg, kind="stable")

    head = by_cost[:arrow_width]
    rest = by_cost[arrow_width:]
    rest_deg = deg[rest]
    middle = rest[rest_deg > 0]
    singletons = rest[rest_deg == 0]

    A_mid = A[middle][:, middle].tocsr()
    if deterministic:
        sub_order = linearize.linearize_bfs(A_mid)
    else:
        sub_order = linearize.linearize_with_random_forest(
            A_mid, rng, use_native=native
        )

    order = np.concatenate([head, middle[sub_order], singletons])
    assert order.size == n
    return order


def _permute_matrix(
    A: sparse.csr_matrix, inverse_permutation: np.ndarray
) -> sparse.csr_matrix:
    """B[inv[u], inv[v]] = A[u, v] — i.e. B = P A P^T with P the permutation
    matrix of `order` (P[i, order[i]] = 1)."""
    coo = A.tocoo()
    B = sparse.csr_matrix(
        (coo.data, (inverse_permutation[coo.row], inverse_permutation[coo.col])),
        shape=A.shape,
    )
    B.sum_duplicates()
    B.sort_indices()
    return B


def arrow_decomposition(
    A: sparse.csr_matrix,
    arrow_width: int = 512,
    max_number_of_levels: int = 2,
    block_diagonal: bool = False,
    prune: bool = True,
    seed: int | None = None,
    native: bool = True,
    symmetric: bool = False,
) -> list[ArrowGraph]:
    """Decompose a square sparse matrix into a chain of arrow matrices.

    ``A = sum_i P_i^T B_i P_i`` where every ``B_i`` has its nonzeros confined
    to the first ``arrow_width`` rows, the first ``arrow_width`` columns, and
    a band (``block_diagonal=False``) or width-sized diagonal blocks
    (``block_diagonal=True``). Mirrors the reference's recursion
    (reference: arrow/decomposition.py:32-144): per level compute a linear
    order, keep the in-arrow edges, recurse on the leftover edges; the final
    level takes everything and reports its actual (possibly larger) width.

    :param A: square CSR adjacency (weighted entries are preserved).
    :param arrow_width: desired head/band width.
    :param max_number_of_levels: maximum number of levels; the last level is a
        best-effort fit with a deterministic BFS order.
    :param block_diagonal: block-diagonal (True) vs. band (False) criterion.
    :param prune: place the ``arrow_width`` highest-degree vertices first and
        always keep their edges at the current level.
    :param seed: RNG seed for the random spanning forests.
    :param native: use the C++ decomposition core when built (no-op
        otherwise); the numpy pipeline is always used for the BFS level.
    :param symmetric: the caller asserts ``A`` has a symmetric pattern (the
        reference Julia pipeline's ``symmetric::Bool``,
        julia/arrow/ArrowDecomposition.jl:119-124). Skips the column
        histogram in every degree computation — the arrow criterion and the
        prune rule are both symmetric, so every level and leftover of a
        symmetric matrix stays symmetric and the flag propagates through
        the recursion.
    """
    A = sparse.csr_matrix(A)
    A.sum_duplicates()
    A.sort_indices()
    assert A.shape[0] == A.shape[1], "adjacency must be square"
    assert arrow_width <= A.shape[0], "width must not exceed the vertex count"

    rng = np.random.default_rng(seed)
    decomposition: list[ArrowGraph] = []
    # Identity mapping from current-level vertex ids to original vertex ids.
    original_ids = np.arange(A.shape[0], dtype=np.int64)
    use_native_split = native and _native.AVAILABLE

    level = A
    while True:
        is_last = len(decomposition) + 1 >= max_number_of_levels
        order = _arrow_linear_order(
            level, arrow_width, is_last, rng, native, symmetric=symmetric
        )
        inv = np.argsort(order)

        leftover = None
        if use_native_split:
            # One fused parallel pass: permute + arrow criterion + both
            # canonical CSR outputs (C++ core).
            B, leftover = _native.partition_edges(
                level, inv, arrow_width, block_diagonal, prune,
                keep_all=is_last,
            )
            if not is_last and B.nnz == 0 and level.nnz > 0:
                # Degenerate guard: keep everything at this level
                # (reference: arrow/decomposition.py:100-102).
                B, leftover = _native.partition_edges(
                    level, inv, arrow_width, block_diagonal, prune,
                    keep_all=True,
                )
            actual_width = (
                get_arrow_width(B, arrow_width) if is_last else arrow_width
            )
        elif not is_last:
            coo = level.tocoo()
            pu = inv[coo.row]
            pv = inv[coo.col]
            if block_diagonal:
                in_arrow = (pu // arrow_width) == (pv // arrow_width)
            else:
                in_arrow = np.abs(pu - pv) <= arrow_width
            if prune:
                in_arrow |= (pu < arrow_width) | (pv < arrow_width)

            if not in_arrow.any():
                # Degenerate guard: keep everything at this level
                # (reference: arrow/decomposition.py:100-102).
                in_arrow = np.ones(coo.nnz, dtype=bool)

            B = sparse.csr_matrix(
                (coo.data[in_arrow], (pu[in_arrow], pv[in_arrow])),
                shape=level.shape,
            )
            B.sum_duplicates()
            B.sort_indices()
            actual_width = arrow_width
            leftover_mask = ~in_arrow
            level_coo = coo
            leftover = sparse.csr_matrix(
                (
                    level_coo.data[leftover_mask],
                    (level_coo.row[leftover_mask], level_coo.col[leftover_mask]),
                ),
                shape=level.shape,
            )
            leftover.sum_duplicates()
        else:
            B = _permute_matrix(level, inv)
            actual_width = get_arrow_width(B, arrow_width)
            leftover = None

        decomposition.append(
            ArrowGraph(
                matrix=B,
                permutation=original_ids[order],
                arrow_width=actual_width,
                nonzero_rows=_count_nonzero_rows(B, symmetric=symmetric),
            )
        )

        if leftover is None or leftover.nnz == 0:
            break
        level = leftover

    return decomposition


def compute_spmm(decomposition: list, X: np.ndarray) -> np.ndarray:
    """Golden host-side SpMM through a decomposition:
    ``sum_i (B_i @ X[perm_i])[argsort(perm_i)]`` — the shared verification
    helper of the reference test-suite (reference:
    tests/test_arrowdecomposition.py:139-156)."""
    C = np.zeros_like(X)
    for matrix, permutation in decomposition:
        inv = np.argsort(permutation)
        C += (matrix @ X[permutation])[inv]
    return C
