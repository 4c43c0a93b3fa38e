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
    except Exception:
        pass


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


_load()


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
