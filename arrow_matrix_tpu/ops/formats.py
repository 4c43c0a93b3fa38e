"""TPU-friendly sparse matrix containers.

The reference's local kernel is row-dynamic CSR (scipy on CPU, cuSPARSE via
CuPy on GPU — reference: arrow/common/sp2cp.py, arrow/arrow_mpi.py:196-272).
Neither maps to XLA: TPU kernels need static shapes and regular access. The
workhorse here is a padded ELL format with *heavy-row splitting*:

* every (virtual) row holds exactly ``R`` (index, value) slots; padding slots
  carry ``val = 0`` so they contribute nothing; empty rows get no virtual row
  at all, so storage scales with nnz, not the row count;
* rows with more than ``R`` nonzeros are split into several virtual rows,
  and a *chain* of arity-8 combine tables sums the partials back — a
  logarithmic segmented-tree reduction. A power-law head row with 1000
  nonzeros costs ~125 virtual rows and 3 tiny combine stages instead of a
  (rows x 125) padded gather (which profiling showed dominating the step);
* the whole SpMM is gather + multiply + reduce — no scatter, no
  data-dependent shapes; everything fuses under XLA.

This subsumes the reference's nnz-column compaction trick
(reference: arrow/arrow_slim_mpi.py:329-350): the ELL gather touches exactly
the needed rows of the dense operand, so compaction is inherent.
"""

from __future__ import annotations

import numpy as np
from scipy import sparse

from flax import struct

COMBINE_ARITY = 8


@struct.dataclass
class EllMat:
    """Padded-ELL sparse matrix (possibly a stack of them).

    Array fields (optionally with a leading ``q`` stacking axis):

    * ``idx``: int32 (V, R) — column index per slot; padding slots point at
      column 0 but carry zero value.
    * ``val``: (V, R) — slot values; 0 in padding slots.
    * ``combine``: tuple of int32 tables — the segmented reduction chain.
      Stage s gathers rows of the previous stage's partial (padded with one
      trailing zero row) and sums groups of up to :data:`COMBINE_ARITY`;
      table entries equal to the previous stage's padded row count select the
      zero row. The final table has shape (n_rows, 1) and maps every output
      row to its single remaining partial (or the zero row for empty rows).

    ``stage_inputs`` records each stage's input row count (static), i.e. the
    zero-row index used by that stage's padding entries.
    """

    idx: np.ndarray
    val: np.ndarray
    combine: tuple
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    stage_inputs: tuple = struct.field(pytree_node=False)

    @property
    def slots_per_row(self) -> int:
        return self.idx.shape[-1]

    @property
    def virtual_rows(self) -> int:
        return self.idx.shape[-2]

    @property
    def needs_combine(self) -> bool:
        return len(self.combine) > 1 or self.combine[0].shape[-1] > 1


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def choose_slot_count(nnz_per_row: np.ndarray, max_r: int = 512) -> int:
    """Pick the per-virtual-row slot count R minimizing total padded slots
    ``sum_rows ceil(nnz/R) * R`` over multiples of 8. Robust to the bimodal
    degree distributions of arrow head panels (a few very heavy rows + many
    light ones), where any quantile heuristic over-pads."""
    nz = nnz_per_row[nnz_per_row > 0]
    if nz.size == 0:
        return 8
    best_r, best_cost = 8, None
    cap = min(max_r, _round_up(int(nz.max()), 8))
    for r in range(8, cap + 8, 8):
        cost = int((-(-nz // r) * r).sum())
        if best_cost is None or cost < best_cost:
            best_r, best_cost = r, cost
    return best_r


def _combine_chain(
    splits: np.ndarray, n_rows: int, v_pad: int, n_stages: int, stage_pads: list | None
):
    """Build the arity-8 segmented-reduction chain for per-row virtual-row
    counts ``splits`` whose rows occupy consecutive ranges.

    :param v_pad: padded input row count of stage 0 (also its zero-row index).
    :param n_stages: number of intermediate stages to emit (excluding the
        final (n_rows, 1) table); stages beyond what's needed are identity
        groups of one.
    :param stage_pads: optional padded output row count per intermediate
        stage (for stacking); defaults to the natural sizes.
    :return: (tables, stage_inputs) — see :class:`EllMat`.
    """
    tables = []
    stage_inputs = []
    counts = splits.astype(np.int64)
    base = np.concatenate(([0], np.cumsum(counts)))[:-1]
    cur_pad = v_pad

    for s in range(n_stages):
        new_counts = -(-counts // COMBINE_ARITY)
        new_base = np.concatenate(([0], np.cumsum(new_counts)))[:-1]
        v_out = int(new_counts.sum())
        v_out_pad = stage_pads[s] if stage_pads is not None else v_out
        assert v_out_pad >= v_out
        table = np.full((max(v_out_pad, 1), COMBINE_ARITY), cur_pad, dtype=np.int32)
        if v_out:
            # Output row new_base[r] + j sums input rows
            # base[r] + ARITY*j ... + min(ARITY*(j+1), counts[r]) - 1.
            r_of_out = np.repeat(np.arange(n_rows), new_counts)
            j_of_out = np.arange(v_out) - np.repeat(new_base, new_counts)
            start = base[r_of_out] + COMBINE_ARITY * j_of_out
            remaining = counts[r_of_out] - COMBINE_ARITY * j_of_out
            width = np.minimum(COMBINE_ARITY, remaining)
            cols = np.arange(COMBINE_ARITY)[None, :]
            vals = start[:, None] + cols
            mask = cols < width[:, None]
            block = np.where(mask, vals, cur_pad).astype(np.int32)
            table[:v_out] = block
        tables.append(table)
        stage_inputs.append(cur_pad)
        counts, base, cur_pad = new_counts, new_base, max(v_out_pad, 1)

    # Final stage: one entry per output row.
    final = np.full((max(n_rows, 1), 1), cur_pad, dtype=np.int32)
    has = counts > 0
    final[: n_rows][has[:, None]] = base[has].astype(np.int32)
    tables.append(final)
    stage_inputs.append(cur_pad)
    return tuple(tables), tuple(stage_inputs)


def _stages_needed(max_splits: int) -> int:
    s = 0
    c = max(int(max_splits), 1)
    while c > 1:
        c = -(-c // COMBINE_ARITY)
        s += 1
    return s


def ell_from_csr(
    A: sparse.csr_matrix,
    slots_per_row: int | None = None,
    dtype=np.float32,
    n_stages: int | None = None,
    v_pad: int | None = None,
    stage_pads: list | None = None,
) -> EllMat:
    """Convert a scipy CSR matrix into :class:`EllMat`.

    Deterministic, vectorized host-side packing: nonzeros keep CSR order; row
    r's j-th nonzero lands in virtual row ``base[r] + j // R``, slot
    ``j % R``. The optional ``n_stages``/``v_pad``/``stage_pads`` force a
    common static structure across blocks destined for one stack.
    """
    A = A.tocsr()
    A.sum_duplicates()
    n_rows, n_cols = A.shape
    nnz_per_row = np.diff(A.indptr).astype(np.int64)

    R = slots_per_row or choose_slot_count(nnz_per_row)
    splits = -(-nnz_per_row // R)  # 0 for empty rows
    base = np.concatenate(([0], np.cumsum(splits)))[:-1]
    V = int(splits.sum())
    V_pad = v_pad if v_pad is not None else max(_round_up(max(V, 1), 8), 8)
    assert V_pad >= V

    idx = np.zeros((V_pad, R), dtype=np.int32)
    val = np.zeros((V_pad, R), dtype=dtype)
    if A.nnz:
        j_within = np.arange(A.nnz, dtype=np.int64) - np.repeat(
            A.indptr[:-1], nnz_per_row
        )
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), nnz_per_row)
        vr = base[rows] + j_within // R
        slot = j_within % R
        idx[vr, slot] = A.indices
        val[vr, slot] = A.data.astype(dtype)

    stages = n_stages if n_stages is not None else _stages_needed(int(splits.max(initial=0)))
    combine, stage_inputs = _combine_chain(splits, n_rows, V_pad, stages, stage_pads)

    return EllMat(
        idx=idx,
        val=val,
        combine=combine,
        n_rows=n_rows,
        n_cols=n_cols,
        stage_inputs=stage_inputs,
    )


def stack_ells_from_csr(
    blocks: list[sparse.csr_matrix],
    slots_per_row: int | None = None,
    dtype=np.float32,
) -> EllMat:
    """Build a (q, ...)-stacked EllMat from CSR blocks with a COMMON static
    structure: shared slot count R (chosen over the pooled rows), shared
    virtual-row padding and combine-chain shapes."""
    all_nnz = np.concatenate(
        [np.diff(b.tocsr().indptr).astype(np.int64) for b in blocks]
    )
    R = slots_per_row or choose_slot_count(all_nnz)

    per_block = []
    for b in blocks:
        nnz = np.diff(b.tocsr().indptr).astype(np.int64)
        per_block.append(-(-nnz // R))
    v_pad = max(max(_round_up(max(int(s.sum()), 1), 8), 8) for s in per_block)
    n_stages = max(_stages_needed(int(s.max(initial=0))) for s in per_block)

    # Common padded output size for every intermediate stage.
    stage_pads = []
    counts = [s.copy() for s in per_block]
    for _ in range(n_stages):
        counts = [-(-c // COMBINE_ARITY) for c in counts]
        stage_pads.append(max(max(int(c.sum()), 1) for c in counts))

    mats = [
        ell_from_csr(
            b,
            slots_per_row=R,
            dtype=dtype,
            n_stages=n_stages,
            v_pad=v_pad,
            stage_pads=stage_pads,
        )
        for b in blocks
    ]
    m0 = mats[0]
    return EllMat(
        idx=np.stack([m.idx for m in mats]),
        val=np.stack([m.val for m in mats]),
        combine=tuple(
            np.stack([m.combine[s] for m in mats]) for s in range(len(m0.combine))
        ),
        n_rows=max(m.n_rows for m in mats),
        n_cols=max(m.n_cols for m in mats),
        stage_inputs=m0.stage_inputs,
    )


def stack_ells(mats: list[EllMat]) -> EllMat:
    """Deprecated shim — rebuild via :func:`stack_ells_from_csr` instead."""
    raise NotImplementedError(
        "stack_ells(EllMat list) was replaced by stack_ells_from_csr(csr list)"
    )
