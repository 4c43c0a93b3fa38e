"""TPU-friendly sparse matrix containers.

The reference's local kernel is row-dynamic CSR (scipy on CPU, cuSPARSE via
CuPy on GPU — reference: arrow/common/sp2cp.py, arrow/arrow_mpi.py:196-272).
Neither maps to XLA: TPU kernels need static shapes and regular access. The
workhorse here is a padded ELL format with *heavy-row splitting*:

* every (virtual) row holds exactly ``R`` (index, value) slots; padding slots
  carry ``val = 0`` so they contribute nothing;
* rows with more than ``R`` nonzeros are split into several *virtual rows*;
  a static combine-gather table sums the partials back into real rows;
* the whole SpMM is therefore gather + multiply + reduce — no scatter, no
  data-dependent shapes, everything fuses under XLA and feeds a Pallas kernel.

This subsumes the reference's nnz-column compaction trick
(reference: arrow/arrow_slim_mpi.py:329-350): the ELL gather touches exactly
the needed rows of the dense operand, so compaction is inherent.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy import sparse

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EllMat:
    """Padded-ELL sparse matrix (possibly a stack of them).

    Array fields (leading ``q`` stacking axis optional):

    * ``idx``: int32 (V, R) — column index per slot; padding slots point at
      column 0 but carry zero value.
    * ``val``: (V, R) — slot values; 0 in padding slots.
    * ``combine``: int32 (rows_out, G) — virtual-row index per real row; the
      SpMM result is ``sum_g partial[combine[r, g]]``. Padding entries point
      at a virtual row that is entirely padding (hence a zero partial).

    Static fields: ``n_rows``/``n_cols`` logical shape, ``needs_combine``
    (False when no row was split, in which case ``combine`` is identity and
    the gather is skipped).
    """

    idx: jnp.ndarray
    val: jnp.ndarray
    combine: jnp.ndarray
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    needs_combine: bool = struct.field(pytree_node=False)

    @property
    def slots_per_row(self) -> int:
        return self.idx.shape[-1]

    @property
    def virtual_rows(self) -> int:
        return self.idx.shape[-2]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def choose_slot_count(nnz_per_row: np.ndarray, quantile: float = 0.95) -> int:
    """Pick the per-virtual-row slot count R: a high quantile of the nonzero
    rows' nnz (rounded up to a multiple of 8 for sublane alignment), so that
    power-law head rows are split instead of padding every row to the max."""
    nz = nnz_per_row[nnz_per_row > 0]
    if nz.size == 0:
        return 8
    r = int(np.ceil(np.quantile(nz, quantile)))
    return max(8, _round_up(r, 8))


def ell_from_csr(
    A: sparse.csr_matrix,
    slots_per_row: int | None = None,
    dtype=np.float32,
    min_virtual_rows: int = 8,
) -> EllMat:
    """Convert a scipy CSR matrix into :class:`EllMat`.

    Deterministic, vectorized host-side packing: nonzeros keep CSR order; row
    r's j-th nonzero lands in virtual row ``base[r] + j // R``, slot
    ``j % R``.
    """
    A = A.tocsr()
    A.sum_duplicates()
    n_rows, n_cols = A.shape
    nnz_per_row = np.diff(A.indptr).astype(np.int64)

    R = slots_per_row or choose_slot_count(nnz_per_row)
    # Empty rows get NO virtual row (their combine entries point at the
    # all-zero pad row), so storage scales with nnz, not with the row count.
    splits = -(-nnz_per_row // R)  # ceil; 0 for empty rows
    base = np.concatenate(([0], np.cumsum(splits)))[:-1]
    V = int(splits.sum())
    G = int(splits.max()) if n_rows else 1
    G = max(G, 1)
    # Reserve at least one fully-padded virtual row at the end: combine
    # padding targets it, and round V up for sublane alignment.
    V_pad = max(_round_up(V + 1, 8), min_virtual_rows)

    idx = np.zeros((V_pad, R), dtype=np.int32)
    val = np.zeros((V_pad, R), dtype=dtype)

    if A.nnz:
        j_within = np.arange(A.nnz, dtype=np.int64) - np.repeat(A.indptr[:-1], nnz_per_row)
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), nnz_per_row)
        vr = base[rows] + j_within // R
        slot = j_within % R
        idx[vr, slot] = A.indices
        val[vr, slot] = A.data.astype(dtype)

    # The combine gather can only be skipped when virtual row == real row
    # exactly, i.e. no row was split AND no row is empty.
    needs_combine = G > 1 or bool((splits == 0).any())
    combine = np.full((max(n_rows, 1), G), V_pad - 1, dtype=np.int32)
    g_idx = np.arange(G, dtype=np.int64)
    mask = g_idx[None, :] < splits[:, None]
    combine_rows = base[:, None] + g_idx[None, :]
    combine[:n_rows][mask] = combine_rows[mask]
    if not needs_combine:
        combine = combine[:, :1]

    return EllMat(
        idx=idx,
        val=val,
        combine=combine,
        n_rows=n_rows,
        n_cols=n_cols,
        needs_combine=needs_combine,
    )


def pad_ell(m: EllMat, virtual_rows: int, slots_per_row: int, combine_width: int) -> EllMat:
    """Zero-pad an EllMat's arrays to the given static sizes (used to make a
    set of blocks stackable along a device axis)."""
    V, R = m.idx.shape
    G = m.combine.shape[1]
    assert virtual_rows >= V and slots_per_row >= R and combine_width >= G
    idx = np.zeros((virtual_rows, slots_per_row), dtype=np.int32)
    val = np.zeros((virtual_rows, slots_per_row), dtype=np.asarray(m.val).dtype)
    idx[:V, :R] = np.asarray(m.idx)
    val[:V, :R] = np.asarray(m.val)
    # Re-target combine padding at the (guaranteed fully-zero) last row.
    old_pad_target = V - 1
    comb_old = np.asarray(m.combine)
    combine = np.full((comb_old.shape[0], combine_width), virtual_rows - 1, dtype=np.int32)
    remapped = np.where(comb_old == old_pad_target, virtual_rows - 1, comb_old)
    combine[:, : comb_old.shape[1]] = remapped
    return EllMat(
        idx=idx,
        val=val,
        combine=combine,
        n_rows=m.n_rows,
        n_cols=m.n_cols,
        needs_combine=combine_width > 1,
    )


def stack_ells(mats: list[EllMat]) -> EllMat:
    """Stack per-device EllMats into one EllMat with a leading device axis,
    padding every member to common static shapes.

    CAUTION: remapping in :func:`pad_ell` assumes a block's last virtual row
    is its combine padding target, which holds for ``ell_from_csr`` output.
    """
    V = max(m.idx.shape[0] for m in mats)
    R = max(m.idx.shape[1] for m in mats)
    G = max(m.combine.shape[1] for m in mats)
    padded = [pad_ell(m, V, R, G) for m in mats]
    return EllMat(
        idx=np.stack([p.idx for p in padded]),
        val=np.stack([p.val for p in padded]),
        combine=np.stack([p.combine for p in padded]),
        n_rows=max(m.n_rows for m in mats),
        n_cols=max(m.n_cols for m in mats),
        needs_combine=G > 1,
    )
