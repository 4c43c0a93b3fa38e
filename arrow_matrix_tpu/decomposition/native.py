"""ctypes binding to the C++ decomposition core.

The reference accelerates decomposition of 100M+-row graphs with a Julia
rewrite (reference: julia/arrow/ArrowDecomposition.jl); the TPU framework's
native core is C++ (``_native/arrowcore.cpp``), exposed through a plain C ABI
and loaded with ctypes. Falls back gracefully when the shared library has not
been built — the numpy pipeline is used instead.

Build: ``make -C arrow_matrix_tpu/decomposition/_native``
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native", "libarrowcore.so")
_lib = None
AVAILABLE = False


def _build():
    """Best-effort build of the shared library from source (the .so is not
    version-controlled; it is platform-specific and unreviewable)."""
    src_dir = os.path.dirname(_LIB_PATH)
    if not os.path.exists(os.path.join(src_dir, "arrowcore.cpp")):
        return
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", src_dir],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception as e:  # noqa: BLE001 — fall back, but say why
        import logging

        logging.getLogger(__name__).warning(
            "native decomposition core build failed (%s); falling back to "
            "the 4-10x slower numpy pipeline. Build manually with "
            "`make -C %s`.",
            e,
            src_dir,
        )


def _load():
    global _lib, AVAILABLE
    if _lib is not None:
        return
    if not os.path.exists(_LIB_PATH):
        _build()
    if not os.path.exists(_LIB_PATH):
        return
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _setup_signatures(_lib)
        AVAILABLE = True
    except OSError:
        _lib = None


def _setup_signatures(lib):
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.arrow_linearize_forest.restype = ctypes.c_int
    lib.arrow_linearize_forest.argtypes = [
        ctypes.c_int64,  # n
        i64p,  # pred
        i64p,  # roots (component order)
        ctypes.c_int64,  # n_roots
        i64p,  # out order
    ]
    lib.arrow_random_forest.restype = ctypes.c_int
    lib.arrow_random_forest.argtypes = [
        ctypes.c_int64,  # n
        i64p,  # indptr
        i64p,  # indices
        ctypes.POINTER(ctypes.c_double),  # edge weights
        i64p,  # out pred (-1 roots)
        i64p,  # out n_components
    ]
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.arrow_partition_edges.restype = ctypes.c_int
    lib.arrow_partition_edges.argtypes = [
        ctypes.c_int64,  # n
        i64p,  # indptr
        i64p,  # indices
        f32p,  # data
        i64p,  # inv permutation
        ctypes.c_int64,  # width
        ctypes.c_int,  # block_diagonal
        ctypes.c_int,  # prune
        ctypes.c_int,  # keep_all
        i64p, i64p, f32p,  # B indptr/indices/data
        i64p, i64p, f32p,  # L indptr/indices/data
        i64p,  # counts_out[2]
    ]
    lib.arrow_partition_edges_i32.restype = ctypes.c_int
    lib.arrow_partition_edges_i32.argtypes = [
        ctypes.c_int64,
        i64p,
        i32p,  # int32 column indices (scipy's default below 2^31 nnz)
        f32p,
        i64p,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        i64p, i32p, f32p,
        i64p, i32p, f32p,
        i64p,
    ]
    lib.arrow_bincount.restype = ctypes.c_int
    lib.arrow_bincount.argtypes = [ctypes.c_int64, i64p, ctypes.c_int64, i64p]
    lib.arrow_bincount_i32.restype = ctypes.c_int
    lib.arrow_bincount_i32.argtypes = [
        ctypes.c_int64, i32p, ctypes.c_int64, i64p,
    ]


_load()


def bincount_indices(indices: np.ndarray, n_bins: int) -> np.ndarray:
    """Parallel ``np.bincount(indices, minlength=n_bins)`` (C++/OpenMP).

    The in-degree histogram is the hottest remaining numpy phase of the
    directed decomposition pipeline (reference analogue: the Julia rewrite's
    degree computation, julia/arrow/ArrowDecomposition.jl:102-135)."""
    assert AVAILABLE
    out = np.empty(n_bins, dtype=np.int64)
    if np.issubdtype(indices.dtype, np.int32):
        idx = np.ascontiguousarray(indices, dtype=np.int32)
        rc = _lib.arrow_bincount_i32(
            idx.size,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_bins,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    else:
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        rc = _lib.arrow_bincount(
            idx.size,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n_bins,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    if rc != 0:
        raise RuntimeError(f"arrow_bincount failed: {rc}")
    return out


def linearize_forest(pred: np.ndarray, roots: np.ndarray) -> np.ndarray:
    """Subtree-size DFS preorder of a rooted forest (C++ fast path)."""
    assert AVAILABLE
    n = pred.size
    pred64 = np.ascontiguousarray(pred, dtype=np.int64)
    roots64 = np.ascontiguousarray(roots, dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    rc = _lib.arrow_linearize_forest(
        n,
        pred64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        roots64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        roots64.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise RuntimeError(f"arrow_linearize_forest failed: {rc}")
    return out


def partition_edges(
    level,
    inv: np.ndarray,
    width: int,
    block_diagonal: bool,
    prune: bool,
    keep_all: bool = False,
):
    """Fused per-level edge split: permute by ``inv``, test the arrow
    criterion, and build BOTH canonical CSR outputs in one parallel sweep —
    the in-arrow matrix B (new ids) and the leftover L (original ids).
    Returns (B, L) scipy csr matrices; L is None when keep_all.

    The single-pass replacement for the numpy pipeline's tocoo + mask +
    two coordinate-format CSR rebuilds (each O(nnz log / multiple
    materializations)) — the phase that dominates 100M+-edge
    decompositions."""
    assert AVAILABLE
    from scipy import sparse

    level = level.tocsr()
    n = level.shape[0]
    nnz = level.nnz
    indptr = np.ascontiguousarray(level.indptr, dtype=np.int64)
    # int32 column indices (scipy's default below 2^31 nnz) go through the
    # i32 entry point — widening 2x-nnz arrays costs seconds per level at
    # the 100M-edge scale.
    idx_dtype = (
        np.int32 if np.issubdtype(level.indices.dtype, np.int32) else np.int64
    )
    indices = np.ascontiguousarray(level.indices, dtype=idx_dtype)
    data = np.ascontiguousarray(level.data, dtype=np.float32)
    inv64 = np.ascontiguousarray(inv, dtype=np.int64)

    B_indptr = np.empty(n + 1, dtype=np.int64)
    B_indices = np.empty(nnz, dtype=idx_dtype)
    B_data = np.empty(nnz, dtype=np.float32)
    L_indptr = np.empty(n + 1, dtype=np.int64)
    if keep_all:  # the C side still writes L_indptr (all zeros)
        L_indices = np.empty(1, dtype=idx_dtype)
        L_data = np.empty(1, dtype=np.float32)
    else:
        L_indices = np.empty(nnz, dtype=idx_dtype)
        L_data = np.empty(nnz, dtype=np.float32)
    counts = np.zeros(2, dtype=np.int64)

    as_i64 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    as_f32 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    as_idx = lambda a: a.ctypes.data_as(
        ctypes.POINTER(ctypes.c_int32 if idx_dtype == np.int32 else ctypes.c_int64)
    )
    fn = (
        _lib.arrow_partition_edges_i32
        if idx_dtype == np.int32
        else _lib.arrow_partition_edges
    )
    rc = fn(
        n,
        as_i64(indptr),
        as_idx(indices),
        as_f32(data),
        as_i64(inv64),
        int(width),
        int(block_diagonal),
        int(prune),
        int(keep_all),
        as_i64(B_indptr),
        as_idx(B_indices),
        as_f32(B_data),
        as_i64(L_indptr),
        as_idx(L_indices),
        as_f32(L_data),
        as_i64(counts),
    )
    if rc != 0:
        raise RuntimeError(f"arrow_partition_edges failed: {rc}")
    b_nnz, l_nnz = int(counts[0]), int(counts[1])
    B = sparse.csr_matrix(
        (B_data[:b_nnz], B_indices[:b_nnz], B_indptr), shape=(n, n)
    )
    B._has_canonical_format = True
    B.has_sorted_indices = True
    if keep_all:
        return B, None
    L = sparse.csr_matrix(
        (L_data[:l_nnz], L_indices[:l_nnz], L_indptr), shape=(n, n)
    )
    L._has_canonical_format = True
    L.has_sorted_indices = True
    return B, L


def random_spanning_forest(
    indptr: np.ndarray, indices: np.ndarray, weights: np.ndarray
) -> tuple[np.ndarray, int]:
    """Kruskal minimum spanning forest under the given weights; returns the
    predecessor array of the rooted forest and the component count."""
    assert AVAILABLE
    n = indptr.size - 1
    pred = np.empty(n, dtype=np.int64)
    ncomp = np.zeros(1, dtype=np.int64)
    rc = _lib.arrow_random_forest(
        n,
        np.ascontiguousarray(indptr, dtype=np.int64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)
        ),
        np.ascontiguousarray(indices, dtype=np.int64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)
        ),
        np.ascontiguousarray(weights, dtype=np.float64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)
        ),
        pred.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ncomp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise RuntimeError(f"arrow_random_forest failed: {rc}")
    return pred, int(ncomp[0])
