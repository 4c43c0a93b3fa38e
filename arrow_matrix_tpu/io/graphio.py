"""Decomposition I/O: on-disk formats, path scheme, and block splitting.

Format parity with the reference (reference: arrow/common/graphio.py) so that
decompositions produced by either library are interchangeable on disk:

* path scheme ``{name}_B_{width}_{i}[_bd]{ext}`` (reference: graphio.py:38-70);
* monolithic ``.npz`` per level (reference: graphio.py:73-128);
* npy triplet per level — ``*_indptr.npy``, ``*_indices.npy``, ``*_data.npy``
  plus ``*_permutation.npy`` — with optional data-less (unweighted → ones) and
  memory-mapped loading (reference: graphio.py:131-314);
* block splitting that keeps only the arrow-relevant column blocks
  {0, i-1, i, i+1} per block row and pads the last block to full width
  (reference: graphio.py:361-446).
"""

from __future__ import annotations

import enum
import glob as _glob
import os
import pickle
import re
from typing import Any, List, Optional, Union

import numpy as np
from scipy import sparse

from arrow_matrix_tpu.decomposition.arrow import ArrowGraph


class DecompositionFileType(enum.Enum):
    npz = 1
    indptr_npy = 2
    indices_npy = 3
    data_npy = 4
    permutation_npy = 5
    nonzero_rows_npy = 6


_SUFFIX = {
    DecompositionFileType.npz: ".npz",
    DecompositionFileType.indptr_npy: "_indptr.npy",
    DecompositionFileType.indices_npy: "_indices.npy",
    DecompositionFileType.data_npy: "_data.npy",
    DecompositionFileType.permutation_npy: "_permutation.npy",
    DecompositionFileType.nonzero_rows_npy: "_nnzrows.npy",
}


def format_path(
    base_path: str,
    width: int,
    index: Optional[int],
    block_diagonal: bool,
    file_type: DecompositionFileType,
) -> str:
    """``{base}_B_{width}[_{index}][_bd]{suffix}`` — byte-for-byte the
    reference's naming scheme (reference: graphio.py:38-70)."""
    path = f"{base_path}_B_{width}"
    if index is not None:
        path += f"_{index}"
    if block_diagonal:
        path += "_bd"
    return path + _SUFFIX[file_type]


def _level_path(
    filename: str,
    width: Optional[int],
    index: int,
    block_diagonal: bool,
    file_type: DecompositionFileType,
) -> Optional[str]:
    """Resolve level ``index``'s file: first under the requested ``width``,
    then under ANY width (``{base}_B_<w>_{index}[_bd]{suffix}``) — reference
    decompositions key each level on its own arrow width (reference:
    graphio.py:140-160), and a best-effort last level commonly exceeds the
    requested width on power-law graphs. Returns None when absent or
    ambiguous."""
    path = format_path(filename, width, index, block_diagonal, file_type)
    if os.path.exists(path):
        return path
    bd = "_bd" if block_diagonal else ""
    suffix = _SUFFIX[file_type]
    rx = re.compile(
        re.escape(os.path.basename(filename))
        + r"_B_(\d+)_"
        + str(index)
        + re.escape(bd + suffix)
        + "$"
    )
    matches = [
        m
        for m in _glob.glob(f"{filename}_B_*_{index}{bd}{suffix}")
        if rx.search(os.path.basename(m))
    ]
    return matches[0] if len(matches) == 1 else None


def _require_level_path(
    filename: str,
    width: Optional[int],
    index: int,
    block_diagonal: bool,
    file_type: DecompositionFileType,
) -> str:
    """As :func:`_level_path`, but raise a clear error instead of returning
    None when a level's companion file is missing or matches several widths
    (passing None to np.load would surface as an opaque TypeError)."""
    path = _level_path(filename, width, index, block_diagonal, file_type)
    if path is None:
        raise FileNotFoundError(
            f"decomposition '{filename}' (width {width}): level {index}'s "
            f"{file_type.name} file is missing or ambiguous "
            f"(expected {format_path(filename, width, index, block_diagonal, file_type)} "
            "or a unique match under another width)"
        )
    return path


def _expected_levels(
    filename: str, width: Optional[int], block_diagonal: bool
) -> Optional[int]:
    """Level count recorded in ``_nnzrows.npy`` at save time, or None when the
    file is absent (e.g. a reference-written decomposition)."""
    path = format_path(
        filename, width, 0, block_diagonal, DecompositionFileType.nonzero_rows_npy
    )
    if not os.path.exists(path):
        return None
    return int(np.load(path).shape[0])


def _check_level_count(
    filename: str, width: Optional[int], block_diagonal: bool, loaded: int
) -> None:
    """Raise when the on-disk level count differs from what the save
    recorded. Fewer: level files are missing (computing ``A @ X`` against a
    truncated operator is silent corruption). More: the any-width fallback
    in :func:`_level_path` spliced levels from a DIFFERENT decomposition
    saved under the same base name (e.g. another width's deeper levels) —
    equally silent corruption."""
    expected = _expected_levels(filename, width, block_diagonal)
    if expected is not None and loaded != expected:
        raise ValueError(
            f"decomposition '{filename}' (width {width}): found {loaded} "
            f"level(s) on disk but the save recorded {expected}; level files "
            "are missing, saved under a different arrow width, or mixed with "
            "another decomposition sharing the base name"
        )


def decomposition_size(filename: str, width: int, block_diagonal: bool) -> int:
    """Number of levels present on disk, probed via permutation files
    (reference: graphio.py:120-128)."""
    i = 0
    while (
        _level_path(
            filename, width, i, block_diagonal, DecompositionFileType.permutation_npy
        )
        is not None
    ):
        i += 1
    return i


def save_decomposition(
    A: Optional[sparse.csr_matrix],
    decomposition: List[ArrowGraph],
    filename: str,
    dtype=np.float32,
    block_diagonal: bool = True,
    save_input: bool = True,
) -> None:
    """Monolithic ``.npz`` per level + ``_permutation.npy``
    (reference: graphio.py:73-117)."""
    if save_input and A is not None:
        with open(f"{filename}_graph.pickle", "wb") as f:
            pickle.dump(A, f)
        sparse.save_npz(f"{filename}_A.npz", sparse.csr_matrix(A, dtype=dtype))

    # Every level is keyed on the FIRST level's width: loaders (ours and the
    # reference's, graphio.py:194-248) probe with a single width, and a
    # best-effort last level may exceed the requested width — saving it under
    # its own width would silently hide it from every loader.
    width = decomposition[0].arrow_width if decomposition else 0
    for i, ag in enumerate(decomposition):
        B = sparse.csr_matrix(ag.matrix, dtype=dtype)
        sparse.save_npz(
            format_path(filename, width, i, block_diagonal, DecompositionFileType.npz),
            B,
        )
        np.save(
            format_path(
                filename,
                width,
                i,
                block_diagonal,
                DecompositionFileType.permutation_npy,
            ),
            np.asarray(ag.permutation),
        )

    nonzero_rows = np.asarray([ag.nonzero_rows for ag in decomposition], dtype=np.int64)
    np.save(
        format_path(
            filename, width, 0, block_diagonal, DecompositionFileType.nonzero_rows_npy
        ),
        nonzero_rows,
    )


def save_decomposition_new(
    A: Optional[sparse.csr_matrix],
    decomposition: List[ArrowGraph],
    filename: str,
    dtype=np.float32,
    block_diagonal: bool = True,
    save_input: bool = False,
) -> None:
    """npy-triplet format per level (reference: graphio.py:131-191)."""
    if save_input and A is not None:
        A = sparse.csr_matrix(A, dtype=dtype)
        np.save(f"{filename}_A_indptr.npy", A.indptr)
        np.save(f"{filename}_A_indices.npy", A.indices)
        np.save(f"{filename}_A_data.npy", A.data)

    # Uniform width keying — see save_decomposition.
    first_width = decomposition[0].arrow_width if decomposition else 0
    for i, ag in enumerate(decomposition):
        B = sparse.csr_matrix(ag.matrix, dtype=dtype)
        w = first_width
        np.save(
            format_path(filename, w, i, block_diagonal, DecompositionFileType.indptr_npy),
            B.indptr,
        )
        np.save(
            format_path(
                filename, w, i, block_diagonal, DecompositionFileType.indices_npy
            ),
            B.indices,
        )
        np.save(
            format_path(filename, w, i, block_diagonal, DecompositionFileType.data_npy),
            B.data,
        )
        np.save(
            format_path(
                filename, w, i, block_diagonal, DecompositionFileType.permutation_npy
            ),
            np.asarray(ag.permutation),
        )

    nonzero_rows = np.asarray([ag.nonzero_rows for ag in decomposition], dtype=np.int64)
    np.save(
        format_path(
            filename,
            first_width,
            0,
            block_diagonal,
            DecompositionFileType.nonzero_rows_npy,
        ),
        nonzero_rows,
    )


def load_decomposition(
    filename: str,
    width: Optional[int] = None,
    block_diagonal: bool = True,
    no_permutation: bool = False,
) -> List[tuple]:
    """Load the monolithic-``.npz`` format (reference: graphio.py:194-248).

    :return: list of (csr_matrix, permutation-or-None) per level.
    """
    decomposition = []
    for i in range(decomposition_size(filename, width, block_diagonal)):
        B = sparse.load_npz(
            _require_level_path(
                filename, width, i, block_diagonal, DecompositionFileType.npz
            )
        )
        permutation = None
        if not no_permutation:
            permutation = np.load(
                _require_level_path(
                    filename,
                    width,
                    i,
                    block_diagonal,
                    DecompositionFileType.permutation_npy,
                )
            )
        decomposition.append((B, permutation))
    _check_level_count(filename, width, block_diagonal, len(decomposition))
    return decomposition


def convert_decomposition(
    filename: str,
    width: Optional[int] = None,
    block_diagonal: bool = True,
) -> List[tuple]:
    """Convert a legacy monolithic-``.npz`` decomposition to the npy-triplet
    format in place, returning the loaded levels with ``None`` permutations
    (reference: arrow/common/graphio.py:317-358).

    Two historical npz layouts are probed per level: the current scheme
    (``{base}_B_{width}_{i}[_bd].npz``, via :func:`_level_path`) and the
    older one with the block-diagonal marker BEFORE the level index
    (``{base}_B_{width}[_bd]_{i}.npz``).
    """
    decomposition: List[tuple] = []
    i = 0
    while True:
        path = _level_path(
            filename, width, i, block_diagonal, DecompositionFileType.npz
        )
        if path is None:
            # Older scheme: bd marker before the index.
            bd = "_bd" if block_diagonal else ""
            legacy = f"{filename}_B_{width}{bd}_{i}.npz"
            path = legacy if width is not None and os.path.exists(legacy) else None
        if path is None:
            break
        out_width = width
        if out_width is None:
            # The any-width fallback located the source; recover its width
            # from the filename so the written triplets carry a real width
            # (a literal "_B_None_" name would be unloadable).
            m = re.search(r"_B_(\d+)_", os.path.basename(path))
            if m is None:
                raise ValueError(
                    f"cannot infer arrow width from {path!r}; pass width="
                )
            out_width = int(m.group(1))
        B = sparse.load_npz(path)
        for ftype, arr in (
            (DecompositionFileType.indptr_npy, B.indptr),
            (DecompositionFileType.indices_npy, B.indices),
            (DecompositionFileType.data_npy, B.data),
        ):
            np.save(
                format_path(filename, out_width, i, block_diagonal, ftype), arr
            )
        decomposition.append((B, None))
        i += 1
    return decomposition


def load_decomposition_new(
    filename: str,
    width: Optional[int] = None,
    block_diagonal: bool = True,
    no_permutation: bool = False,
    mem_map: bool = False,
) -> List[tuple]:
    """Load the npy-triplet format; a missing ``_data.npy`` means an
    unweighted matrix (ones). With ``mem_map`` the CSR arrays are returned as
    a ``(data, indices, indptr)`` tuple of memory-mapped arrays instead of a
    materialized csr_matrix (reference: graphio.py:251-314).
    """

    def _load(path):
        return np.lib.format.open_memmap(path, mode="r") if mem_map else np.load(path)

    decomposition = []
    i = 0
    while True:
        indptr_path = _level_path(
            filename, width, i, block_diagonal, DecompositionFileType.indptr_npy
        )
        if indptr_path is None:
            break
        indptr = _load(indptr_path)
        indices = _load(
            _require_level_path(
                filename, width, i, block_diagonal, DecompositionFileType.indices_npy
            )
        )
        data_path = _level_path(
            filename, width, i, block_diagonal, DecompositionFileType.data_npy
        )
        if data_path is not None:
            data = _load(data_path)
        else:
            data = np.ones(indices.size, dtype=np.float32)
        n = indptr.size - 1
        B: Any = (
            (data, indices, indptr)
            if mem_map
            else sparse.csr_matrix((data, indices, indptr), shape=(n, n))
        )
        permutation = None
        if not no_permutation:
            permutation = np.load(
                _require_level_path(
                    filename,
                    width,
                    i,
                    block_diagonal,
                    DecompositionFileType.permutation_npy,
                )
            )
        decomposition.append((B, permutation))
        i += 1
    _check_level_count(filename, width, block_diagonal, len(decomposition))
    return decomposition


def csr_nnz(m) -> int:
    """Nonzero count of a loaded level — a csr_matrix or a memory-mapped
    ``(data, indices, indptr)`` triplet (``load_decomposition_new`` with
    ``mem_map=True``) — without materializing the triplet."""
    if isinstance(m, tuple):
        return int(m[2][-1])
    return int(m.nnz)


def as_csr(m, dtype=np.float32) -> sparse.csr_matrix:
    """Materialize a loaded level as a square csr_matrix; accepts a
    csr_matrix or a ``(data, indices, indptr)`` (possibly memory-mapped)
    triplet. The explicit square shape matters: scipy would otherwise infer
    the column count from the maximum index present."""
    if isinstance(m, tuple):
        data, indices, indptr = m
        n = indptr.shape[0] - 1
        return sparse.csr_matrix(
            (
                np.asarray(data, dtype=dtype),
                np.asarray(indices),
                np.asarray(indptr),
            ),
            shape=(n, n),
        )
    return sparse.csr_matrix(m, dtype=dtype)


def load_row_stripe(
    m, row_start: int, n_rows: int, n_cols: int, dtype=np.float32
) -> sparse.csr_matrix:
    """Materialize rows [row_start, row_start + n_rows) of a matrix given as
    a csr_matrix or a (possibly memory-mapped) ``(data, indices, indptr)``
    triplet, as an (n_rows, n_cols) csr_matrix; rows beyond the stored
    matrix are empty. Peak memory is the stripe, never the matrix — the
    building block of out-of-core plan compilation (the reference's
    root-side streaming distribution, arrow/arrow_dec_mpi.py:629-887 +
    lazy block slices, arrow/common/graphio.py:409-495)."""
    if isinstance(m, tuple):
        data_mm, indices_mm, indptr_mm = m
        n = indptr_mm.shape[0] - 1
        stop = min(row_start + n_rows, n)
        real = max(stop - row_start, 0)
        indptr = np.zeros(n_rows + 1, dtype=np.int64)
        if real > 0:
            seg = np.asarray(indptr_mm[row_start : stop + 1], dtype=np.int64)
            lo, hi = int(seg[0]), int(seg[-1])
            indptr[: real + 1] = seg - lo
            indptr[real + 1 :] = hi - lo
            data = np.asarray(data_mm[lo:hi], dtype=dtype)
            indices = np.asarray(indices_mm[lo:hi])
        else:
            data = np.zeros(0, dtype=dtype)
            indices = np.zeros(0, dtype=np.int64)
        return sparse.csr_matrix(
            (data, indices, indptr), shape=(n_rows, n_cols)
        )
    m = m.tocsr()
    stop = min(row_start + n_rows, m.shape[0])
    stripe = m[row_start:stop]
    if stripe.shape[0] < n_rows or stripe.shape[1] != n_cols:
        stripe = sparse.csr_matrix(
            (
                stripe.data.astype(dtype),
                stripe.indices,
                np.pad(stripe.indptr, (0, n_rows - stripe.shape[0]), mode="edge"),
            ),
            shape=(n_rows, n_cols),
        )
    return stripe.tocsr()


def triplet_in_degrees(m, n: int, chunk: int = 1 << 24) -> np.ndarray:
    """Column nonzero counts of a csr_matrix or (data, indices, indptr)
    triplet, streaming the indices in chunks (out-of-core safe)."""
    if not isinstance(m, tuple):
        return np.bincount(m.tocsr().indices, minlength=n)
    indices = m[1]
    counts = np.zeros(n, dtype=np.int64)
    for lo in range(0, indices.shape[0], chunk):
        counts += np.bincount(
            np.asarray(indices[lo : lo + chunk]), minlength=n
        )
    return counts


def split_matrix_to_blocks(
    A: sparse.csr_matrix,
    block_size: int,
    dtype=None,
    use_min_shape: bool = False,
) -> List[List[Union[sparse.csr_matrix, None]]]:
    """Split a square arrow matrix into ``block_size``-sized blocks, keeping
    per block-row i only columns {0, i-1, i, i+1} (the arrow-relevant blocks)
    and padding ragged trailing blocks to full ``block_size``
    (reference: graphio.py:361-406)."""
    rows, cols = A.shape
    dtype = dtype or A.dtype
    n_block_rows = int(np.ceil(rows / block_size))
    n_block_cols = int(np.ceil(cols / block_size))
    blocks: List[List[Union[sparse.csr_matrix, None]]] = [
        [None] * n_block_cols for _ in range(n_block_rows)
    ]
    for i in range(n_block_rows):
        wanted = {0, i - 1, i, i + 1} if i > 0 else set(range(n_block_cols))
        for j in range(n_block_cols):
            if j not in wanted:
                continue
            sl = A[
                i * block_size : min(rows, (i + 1) * block_size),
                j * block_size : min(cols, (j + 1) * block_size),
            ].tocsr()
            pad_rows = block_size - sl.shape[0]
            pad_cols = block_size - sl.shape[1]
            if use_min_shape or (pad_rows == 0 and pad_cols == 0):
                block = sparse.csr_matrix(sl, dtype=dtype)
            else:
                indptr = np.pad(sl.indptr, (0, pad_rows), mode="edge")
                block = sparse.csr_matrix(
                    (sl.data, sl.indices, indptr),
                    shape=(block_size, block_size),
                    dtype=dtype,
                )
            block.sum_duplicates()
            block.sort_indices()
            blocks[i][j] = block
    return blocks
