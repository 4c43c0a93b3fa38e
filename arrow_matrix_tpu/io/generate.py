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


def rmat_edges_to_disk(
    scale: int,
    path: str,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int | None = None,
    chunk_edges: int = 1 << 25,
):
    """Stream-generate RMAT edges to disk in bounded memory.

    Writes two raw int32 memmaps ``<path>.src`` / ``<path>.dst`` (self-loops
    dropped, files truncated to the kept count) and returns
    ``(src_mm, dst_mm, n)`` with the memmaps reopened read-only.  Peak RSS is
    O(chunk_edges), independent of the total edge count — the 22 GB
    generation-RSS floor of the in-memory ``rmat_graph`` at scale 24 becomes
    ~1.5 GB (the reference reaches this scale only through its Julia rewrite,
    reference: README.md:50,67-68; julia/arrow/ArrowDecompositionMain.jl).

    With ``chunk_edges >= edge_factor * 2**scale`` the RNG draw order matches
    ``rmat_graph`` exactly, so the same seed yields the identical edge list
    (the equality test hook).
    """
    import os

    n = 1 << scale
    m = edge_factor * n
    rng = np.random.default_rng(seed)
    ab, abc = a + b, a + b + c
    src_f = np.memmap(path + ".src", dtype=np.int32, mode="w+", shape=(m,))
    dst_f = np.memmap(path + ".dst", dtype=np.int32, mode="w+", shape=(m,))
    kept = 0
    for lo in range(0, m, chunk_edges):
        cm = min(chunk_edges, m - lo)
        s = np.zeros(cm, dtype=np.int64)
        d = np.zeros(cm, dtype=np.int64)
        for _ in range(scale):
            r = rng.random(cm)
            right = r >= ab
            low = (r >= a) & (r < ab) | (r >= abc)
            s = (s << 1) | right
            d = (d << 1) | low
        keep = s != d
        s, d = s[keep], d[keep]
        src_f[kept : kept + s.size] = s
        dst_f[kept : kept + d.size] = d
        kept += s.size
    src_f.flush(); dst_f.flush()
    del src_f, dst_f
    for p in (path + ".src", path + ".dst"):
        with open(p, "r+b") as fh:
            fh.truncate(4 * kept)
    return (
        np.memmap(path + ".src", dtype=np.int32, mode="r"),
        np.memmap(path + ".dst", dtype=np.int32, mode="r"),
        n,
    )


def csr_from_edges_disk(
    src,
    dst,
    n: int,
    path: str,
    symmetric: bool = True,
    chunk: int = 1 << 25,
) -> sparse.csr_matrix:
    """Build a canonical (sorted, deduplicated, unit-valued) CSR adjacency
    from an on-disk edge list WITHOUT materializing it in memory.

    Three bounded-memory passes over the edges: (A) per-row counts →
    indptr; (B) counting-sort scatter of the column indices into a raw
    memmap (both directions when ``symmetric``); (C) per-row-stripe sort +
    dedup compacted into the final memmap.  The returned ``csr_matrix``
    wraps the memmapped ``indices``/``data`` (page-cache-lazy), with an
    in-memory int64 ``indptr`` — the exact input contract of
    ``arrow_decomposition`` and its C++ core (ctypes reads pull pages on
    demand).  Peak RSS is O(n + chunk), not O(nnz)."""

    def directions(lo, hi):
        s = np.asarray(src[lo:hi]).astype(np.int64)
        d = np.asarray(dst[lo:hi]).astype(np.int64)
        yield s, d
        if symmetric:
            yield d, s

    m = src.shape[0]
    counts = np.zeros(n, dtype=np.int64)
    for lo in range(0, m, chunk):
        for rows, _ in directions(lo, min(lo + chunk, m)):
            counts += np.bincount(rows, minlength=n)
    indptr_raw = np.concatenate(([0], np.cumsum(counts)))
    total = int(indptr_raw[-1])

    raw = np.memmap(path + ".rawidx", dtype=np.int32, mode="w+",
                    shape=(total,))
    cursor = indptr_raw[:-1].copy()
    for lo in range(0, m, chunk):
        for rows, cols in directions(lo, min(lo + chunk, m)):
            order = np.argsort(rows, kind="stable")
            rows_s, cols_s = rows[order], cols[order]
            # Offset of each entry within its equal-row run.
            boundary = np.flatnonzero(
                np.r_[True, rows_s[1:] != rows_s[:-1]])
            run_len = np.diff(np.r_[boundary, rows_s.size])
            within = np.arange(rows_s.size, dtype=np.int64) - np.repeat(
                boundary, run_len)
            raw[cursor[rows_s] + within] = cols_s
            cursor += np.bincount(rows, minlength=n)
    raw.flush()

    # Pass C: sort within rows, drop duplicates, compact.
    final = np.memmap(path + ".indices", dtype=np.int32, mode="w+",
                      shape=(total,))
    new_counts = np.zeros(n, dtype=np.int64)
    out_pos = 0
    rows_per_stripe = max(1, chunk // max(1, total // max(n, 1)))
    for r0 in range(0, n, rows_per_stripe):
        r1 = min(r0 + rows_per_stripe, n)
        lo, hi = int(indptr_raw[r0]), int(indptr_raw[r1])
        if hi == lo:
            continue
        sub = np.asarray(raw[lo:hi], dtype=np.int64)
        row_id = np.repeat(
            np.arange(r0, r1, dtype=np.int64),
            np.diff(indptr_raw[r0 : r1 + 1]).astype(np.int64),
        )
        key = (row_id - r0) * n + sub
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        keep = np.r_[True, key_s[1:] != key_s[:-1]]
        kept_cols = (key_s[keep] % n).astype(np.int32)
        kept_rows = row_id[order][keep]
        final[out_pos : out_pos + kept_cols.size] = kept_cols
        out_pos += kept_cols.size
        new_counts[r0:r1] = np.bincount(
            kept_rows - r0, minlength=r1 - r0)
    final.flush()
    del raw
    import os

    os.remove(path + ".rawidx")
    with open(path + ".indices", "r+b") as fh:
        fh.truncate(4 * out_pos)

    data = np.memmap(path + ".data", dtype=np.float32, mode="w+",
                     shape=(out_pos,))
    for lo in range(0, out_pos, chunk):
        data[lo : min(lo + chunk, out_pos)] = 1.0
    data.flush()

    indptr = np.concatenate(([0], np.cumsum(new_counts)))
    if out_pos < np.iinfo(np.int32).max:
        # scipy unifies indptr/indices index dtypes; an int64 indptr would
        # force an int64 COPY of the memmapped indices (8 GB at 1B nnz).
        indptr = indptr.astype(np.int32)
    A = sparse.csr_matrix(
        (
            np.memmap(path + ".data", dtype=np.float32, mode="r"),
            np.memmap(path + ".indices", dtype=np.int32, mode="r"),
            indptr,
        ),
        shape=(n, n),
    )
    A.has_sorted_indices = True
    A.has_canonical_format = True
    return A


def streamed_rmat_csr(
    scale: int,
    workdir: str,
    edge_factor: int = 16,
    seed: int | None = None,
    symmetric: bool = True,
    chunk_edges: int = 1 << 25,
) -> sparse.csr_matrix:
    """``rmat_graph`` at out-of-core scale: stream edges to ``workdir`` and
    build the canonical CSR with memmap-backed indices/data.  Peak RSS is
    O(n + chunk_edges) against the in-memory generator's O(scale-passes x
    edges) (22 GB at scale 24)."""
    import os

    os.makedirs(workdir, exist_ok=True)
    base = os.path.join(workdir, f"rmat{scale}")
    src, dst, n = rmat_edges_to_disk(
        scale, base, edge_factor=edge_factor, seed=seed,
        chunk_edges=chunk_edges,
    )
    return csr_from_edges_disk(
        src, dst, n, base, symmetric=symmetric, chunk=chunk_edges
    )


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
