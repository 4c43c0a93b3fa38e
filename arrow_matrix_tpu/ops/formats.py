"""TPU-friendly sparse matrix containers.

The reference's local kernel is row-dynamic CSR (scipy on CPU, cuSPARSE via
CuPy on GPU — reference: arrow/common/sp2cp.py, arrow/arrow_mpi.py:196-272).
Neither maps to XLA: TPU kernels need static shapes and regular access. Four
gather-friendly containers cover the density spectrum (the Pallas BSR tile
format for MXU-worthy blocks lives in ops/bsr_pallas.py); every SpMM is
gather + multiply + static reduction — no scatter, no dynamic shapes:

* :class:`EllMat` — identity-layout padded ELL with heavy-row splitting,
  the workhorse for whole matrices (cost ~ n_rows * R slots);
* :class:`CompactEll` — row-compressed wrapper for matrices with many empty
  rows (cost ~ occupied_rows * R + a row-expansion gather);
* :class:`PackedEll` — chunk-packed layout for ultra-sparse matrices (rows
  averaging ~1 nonzero): cost ~ nnz slots + two boundary gathers;
* :class:`SumMat` — a sum of per-density parts of one block (e.g. packed
  light rows + compact heavy rows).

The identity-layout details:

* virtual row r < n_rows IS row r: it holds the row's first ``R`` (index,
  value) slots (padding slots carry ``val = 0``), so for the typical row the
  SpMM result needs NO reduction indirection at all — profiling showed that
  gathers from large arrays run far below the gather engine's peak, so the
  per-row combine gather of a classic split-ELL dominated everything;
* rows with more than ``R`` nonzeros place their remaining *extra* chunks
  after the identity region; the extras are reduced by a logarithmic chain
  of arity-8 combine tables over the HEAVY rows only, and a final small
  per-row gather adds each heavy row's settled extras sum onto its identity
  partial (light rows read an appended zero row);
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
      column 0 but carry zero value. Virtual rows [0, n_rows) are the
      identity region (row r's first chunk); rows [n_rows, n_rows + E_pad)
      hold the extra chunks of heavy rows, consecutively per row.
    * ``val``: (V, R) — slot values; 0 in padding slots.
    * ``combine``: tuple of int32 tables — the extras reduction chain.
      Stage s gathers rows of the previous stage's output (stage 0 = the
      extras region, zero-extended by one row) and sums groups of up to
      :data:`COMBINE_ARITY`, covering only rows still holding > 1 chunks.
      The final table has shape (n_rows, 1) and indexes the CONCATENATION of
      all stage outputs (+ one zero row): each heavy row's settled extras
      sum, or the zero row for rows without extras.

    ``stage_inputs`` records each stage's input row count (static):
    ``stage_inputs[0]`` is E_pad, the padded extras count.
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


@struct.dataclass
class CompactEll:
    """Row-compressed ELL: the inner :class:`EllMat` covers only OCCUPIED
    rows, and a final (n_rows,) gather expands to the full row range (empty
    rows read an appended zero row).

    The first-chunk-identity layout of :class:`EllMat` pays ``n_rows * R``
    slots regardless of occupancy — the right trade for one merged matrix,
    but ruinous for arrow *blocks*: a width-25k block with 4 nonzeros would
    gather 200k rows. Here slots are proportional to occupied rows; the
    row-expansion gather reads a small (occupied-rows-sized) source at the
    gather engine's fast rate.
    """

    inner: EllMat
    # (n_rows,) int32 (optionally stacked (q, n_rows)): occupied-row position
    # of each full row, or ``inner.n_rows`` (the appended zero row) if empty.
    row_map: np.ndarray
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)


@struct.dataclass
class PackedEll:
    """Chunk-packed ELL for ULTRA-sparse matrices (rows with <= chunk
    nonzeros): multiple rows share one chunk of slots, so slot count is
    ~nnz (bin-packed), not occupied_rows * R.

    The identity/compact layouts pay R (=8) slots per occupied row — ruinous
    when rows average ~1 nonzero (deep arrow levels at large q measured 6-8x
    slot inflation). Here rows are first-fit-decreasing packed into 8-slot
    chunks (never crossing a chunk boundary); the SpMM computes per-chunk
    prefix sums of the slot contributions and recovers each row's sum as a
    difference of two boundary positions:

        c = val * X[idx]              # (V, 8, k) gather + multiply
        p = cumsum(c, axis=1)         # in-chunk prefix sums
        y[r] = p[end_r] - p[beg_r]    # two (n_rows,) boundary gathers

    ``end_idx[r]`` flat-indexes row r's last slot; ``beg_idx[r]`` the slot
    BEFORE its first (or the appended zero row when the row starts its
    chunk or is empty).
    """

    idx: np.ndarray  # (V, chunk) int32 column per slot (0 for padding)
    val: np.ndarray  # (V, chunk) values (0 for padding)
    end_idx: np.ndarray  # (n_rows,) int32 into flat (V*chunk) + zero row
    beg_idx: np.ndarray  # (n_rows,) int32 into flat (V*chunk) + zero row
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)


def packed_ell_from_csr(A: sparse.csr_matrix, chunk: int = 8) -> PackedEll:
    """Pack a matrix whose rows all have <= ``chunk`` nonzeros.

    Vectorized size-class packing: rows of equal nonzero count s pack
    ``chunk // s`` per chunk (>= 62.5% slot occupancy for chunk=8), with no
    per-row Python loop — plan compilation stays O(nnz) vectorized."""
    A = A.tocsr()
    A.sum_duplicates()
    n_rows, n_cols = A.shape
    nnz_per_row = np.diff(A.indptr).astype(np.int64)
    assert int(nnz_per_row.max(initial=0)) <= chunk, "rows exceed chunk size"

    flat_start = np.zeros(n_rows, dtype=np.int64)  # flat slot of row start
    start_in_chunk = np.zeros(n_rows, dtype=np.int64)
    chunk_offset = 0
    for s in range(1, chunk + 1):
        rows_s = np.flatnonzero(nnz_per_row == s)
        if rows_s.size == 0:
            continue
        per_chunk = chunk // s
        j = np.arange(rows_s.size, dtype=np.int64)
        cid = chunk_offset + j // per_chunk
        pos = (j % per_chunk) * s
        flat_start[rows_s] = cid * chunk + pos
        start_in_chunk[rows_s] = pos
        chunk_offset = int(cid[-1]) + 1
    V = max(chunk_offset, 1)

    idx = np.zeros(V * chunk, dtype=np.int32)
    val = np.zeros(V * chunk, dtype=np.float32)
    if A.nnz:
        j_within = np.arange(A.nnz, dtype=np.int64) - np.repeat(
            A.indptr[:-1].astype(np.int64), nnz_per_row
        )
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), nnz_per_row)
        target = flat_start[rows] + j_within
        idx[target] = A.indices
        val[target] = A.data.astype(np.float32)

    zero_row = V * chunk
    has = nnz_per_row > 0
    end_idx = np.full(n_rows, zero_row, dtype=np.int32)
    beg_idx = np.full(n_rows, zero_row, dtype=np.int32)
    end_idx[has] = (flat_start[has] + nnz_per_row[has] - 1).astype(np.int32)
    interior = has & (start_in_chunk > 0)
    beg_idx[interior] = (flat_start[interior] - 1).astype(np.int32)
    return PackedEll(
        idx=idx.reshape(V, chunk),
        val=val.reshape(V, chunk),
        end_idx=end_idx,
        beg_idx=beg_idx,
        n_rows=n_rows,
        n_cols=n_cols,
    )


@struct.dataclass
class SumMat:
    """A sum of sparse parts applied to the same operand — e.g. chunk-packed
    light rows + identity/compact heavy rows of one block."""

    parts: tuple
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)


def packed_cost_rows(A: sparse.csr_matrix, chunk: int = 8) -> int:
    """Estimated gathered rows for the chunk-packed layout of A (rows with
    more than ``chunk`` nonzeros excluded by the caller): packed slots plus
    the two boundary gathers."""
    nnz_per_row = np.diff(A.tocsr().indptr).astype(np.int64)
    slots = 0
    for s in range(1, chunk + 1):
        m = int((nnz_per_row == s).sum())
        if m:
            per_chunk = chunk // s
            slots += -(-m // per_chunk) * chunk
    return slots + 2 * A.shape[0]


def split_by_row_weight(
    A: sparse.csr_matrix, thresh: int = 8
) -> tuple[sparse.csr_matrix, sparse.csr_matrix]:
    """Split A = light + heavy by row nonzero count (rows <= thresh go to
    light) — light rows take the chunk-packed layout, heavy rows the
    identity/compact layouts."""
    A = A.tocsr()
    nnz_per_row = np.diff(A.indptr)
    light_rows = nnz_per_row <= thresh
    coo = A.tocoo()
    lm = light_rows[coo.row]
    light = sparse.csr_matrix(
        (coo.data[lm], (coo.row[lm], coo.col[lm])), shape=A.shape
    )
    heavy = sparse.csr_matrix(
        (coo.data[~lm], (coo.row[~lm], coo.col[~lm])), shape=A.shape
    )
    return light, heavy


def choose_slot_count(
    nnz_per_row: np.ndarray,
    max_r: int = 512,
    max_virtual_factor: float | None = None,
) -> int:
    """Pick the per-virtual-row slot count R minimizing total slots in the
    first-chunk-identity layout: every row pays R identity slots; rows with
    more than R nonzeros add ``ceil((nnz - R)/R) * R`` extra slots (gathered
    rows == slots, and the gather engine is the bottleneck).

    :param max_virtual_factor: if set, only consider R whose virtual-row
        count (rows + extra chunks) stays below ``factor * rows`` — the
        (V, k) partial array is lane-padded in HBM, so huge matrices must
        bound V, trading a few extra identity slots."""
    nnz_per_row = np.asarray(nnz_per_row, dtype=np.int64)
    n_rows = max(1, nnz_per_row.size)
    mx = int(nnz_per_row.max(initial=0))
    if mx == 0:
        return 8
    # Multiples of 8 only: narrower slot rows save gathers but destroy the
    # FMA-reduce vectorization and blow up the extras chain (profiled).
    # Above 128 only multiples of 128: the (V, R) idx/val arrays lane-pad
    # the minor dimension to the next 128 multiple, so e.g. R = 136
    # physically costs R = 256 (measured 1.9x HBM expansion on the
    # rmat-4M plan — the difference between fitting and OOM).
    cap = min(max_r, _round_up(mx, 8))
    candidates = list(range(8, min(cap, 128) + 8, 8))
    candidates += list(range(256, cap + 128, 128))
    best_r, best_cost = None, None
    fallback_r, fallback_v = None, None
    for r in candidates:
        extra = np.maximum(nnz_per_row - r, 0)
        e_rows = int((-(-extra // r)).sum())
        if fallback_v is None or e_rows < fallback_v:
            fallback_r, fallback_v = r, e_rows
        if (
            max_virtual_factor is not None
            and n_rows + e_rows > max_virtual_factor * n_rows
        ):
            continue
        cost = n_rows * r + e_rows * r
        if best_cost is None or cost < best_cost:
            best_r, best_cost = r, cost
    return best_r if best_r is not None else fallback_r


def _combine_chain(
    splits: np.ndarray, n_rows: int, v_pad: int, n_stages: int, stage_pads: list | None
):
    """Build the arity-8 segmented-reduction chain for per-row virtual-row
    counts ``splits`` whose rows occupy consecutive ranges.

    Stage s only covers rows whose count is still > 1 — rows finished earlier
    keep their single partial in that stage's output and the FINAL table
    gathers from the concatenation of ALL stage outputs (plus one zero row).
    This keeps every stage proportional to the *heavy* rows only; unsplit
    rows (the vast majority) cost exactly one final-gather row.

    :param v_pad: padded row count of the stage-0 partial.
    :param n_stages: number of intermediate stages (excluding the final
        (n_rows, 1) table).
    :param stage_pads: optional padded output row count per intermediate
        stage (for stacking); defaults to the natural sizes.
    :return: (tables, stage_inputs) — see :class:`EllMat`.
    """
    tables = []
    stage_inputs = []
    counts = splits.astype(np.int64)
    # Per-row start inside the current stage's output (stage 0 = partial).
    base = np.concatenate(([0], np.cumsum(counts)))[:-1]
    # Stage in which each row's value settles, and its index there.
    settle_stage = np.zeros(n_rows, dtype=np.int64)
    settle_base = base.copy()
    stage_sizes = [v_pad]
    cur_pad = v_pad

    for s in range(n_stages):
        active = counts > 1
        new_counts = np.where(active, -(-counts // COMBINE_ARITY), 0)
        new_base = np.concatenate(([0], np.cumsum(new_counts)))[:-1]
        v_out = int(new_counts.sum())
        v_out_pad = stage_pads[s] if stage_pads is not None else max(v_out, 1)
        v_out_pad = max(v_out_pad, 1)
        assert v_out_pad >= v_out
        table = np.full((v_out_pad, COMBINE_ARITY), cur_pad, dtype=np.int32)
        if v_out:
            r_of_out = np.repeat(np.arange(n_rows), new_counts)
            j_of_out = np.arange(v_out) - np.repeat(new_base, new_counts)
            start = base[r_of_out] + COMBINE_ARITY * j_of_out
            remaining = counts[r_of_out] - COMBINE_ARITY * j_of_out
            cols = np.arange(COMBINE_ARITY)[None, :]
            vals = start[:, None] + cols
            mask = cols < np.minimum(COMBINE_ARITY, remaining)[:, None]
            table[:v_out] = np.where(mask, vals, cur_pad).astype(np.int32)
        tables.append(table)
        stage_inputs.append(cur_pad)
        stage_sizes.append(v_out_pad)
        # Rows reduced in this stage settle here (until reduced again).
        settle_stage[active] = s + 1
        settle_base[active] = new_base[active]
        counts = np.where(active, new_counts, counts)
        base = np.where(active, new_base, base)
        cur_pad = v_out_pad

    # Final: gather from the concatenation of all stage outputs + zero row.
    offsets = np.concatenate(([0], np.cumsum(stage_sizes)))
    zero_row = int(offsets[-1])
    final = np.full((max(n_rows, 1), 1), zero_row, dtype=np.int32)
    has = splits > 0
    final[:n_rows, 0][has] = (offsets[settle_stage] + settle_base)[has].astype(
        np.int32
    )
    tables.append(final)
    stage_inputs.append(zero_row)
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
    trivial_combine: bool | None = None,
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

    # Huge matrices bound the virtual-row count: the (V, k) partial is
    # lane-padded in HBM (512B/row at k <= 128), so V must stay ~rows.
    R = slots_per_row or choose_slot_count(
        nnz_per_row,
        max_virtual_factor=1.25 if n_rows > 2_000_000 else None,
    )
    n_extras = np.maximum(-(-nnz_per_row // R) - 1, 0)  # extra chunks per row
    ebase = np.concatenate(([0], np.cumsum(n_extras)))[:-1]
    E = int(n_extras.sum())
    E_pad = v_pad if v_pad is not None else max(_round_up(max(E, 1), 8), 8)
    assert E_pad >= E
    V_pad = n_rows + E_pad

    idx = np.zeros((V_pad, R), dtype=np.int32)
    val = np.zeros((V_pad, R), dtype=dtype)
    if A.nnz:
        j_within = np.arange(A.nnz, dtype=np.int64) - np.repeat(
            A.indptr[:-1], nnz_per_row
        )
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), nnz_per_row)
        chunk = j_within // R
        # Chunk 0 sits at virtual row r (identity); chunk j >= 1 at
        # n_rows + ebase[r] + j - 1.
        vr = np.where(chunk == 0, rows, n_rows + ebase[rows] + chunk - 1)
        slot = j_within % R
        idx[vr, slot] = A.indices
        val[vr, slot] = A.data.astype(dtype)

    stages = (
        n_stages
        if n_stages is not None
        else _stages_needed(int(n_extras.max(initial=0)))
    )
    if E == 0 and trivial_combine is not False:
        # Statically no extras: the identity region is the whole answer.
        combine = (np.zeros((1, 1), dtype=np.int32),)
        stage_inputs = (0,)
    else:
        combine, stage_inputs = _combine_chain(
            n_extras, n_rows, E_pad, stages, stage_pads
        )

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

    per_block = []  # extras per row, per block
    for b in blocks:
        nnz = np.diff(b.tocsr().indptr).astype(np.int64)
        per_block.append(np.maximum(-(-nnz // R) - 1, 0))
    v_pad = max(max(_round_up(max(int(s.sum()), 1), 8), 8) for s in per_block)
    n_stages = max(_stages_needed(int(s.max(initial=0))) for s in per_block)

    # Common padded output size for every intermediate stage (active-row
    # rule: only rows with count > 1 occupy a stage).
    stage_pads = []
    counts = [s.copy() for s in per_block]
    for _ in range(n_stages):
        counts = [
            np.where(c > 1, -(-c // COMBINE_ARITY), 0) for c in counts
        ]
        stage_pads.append(max(max(int(c.sum()), 1) for c in counts))
        counts = [np.maximum(c, 1 * (c0 > 0)) for c, c0 in zip(counts, per_block)]

    total_extras = sum(int(s_.sum()) for s_ in per_block)
    # Build ONE leaf at a time and copy it into preallocated stacked arrays
    # (never the whole list of padded leaves + a np.stack copy at once):
    # at billion-nnz scale the leaves of one role total tens of GB, and the
    # build-all-then-stack peak of 2x the stacked size was the allocation
    # that pushed the q=46 full-plan compile past 125 GB (NOTES round 5).
    q = len(blocks)
    idx = val = combines = m0 = None
    n_rows = n_cols = 0
    for j, b in enumerate(blocks):
        m = ell_from_csr(
            b,
            slots_per_row=R,
            dtype=dtype,
            n_stages=n_stages,
            v_pad=v_pad,
            stage_pads=stage_pads,
            trivial_combine=(True if total_extras == 0 else False),
        )
        if idx is None:
            m0 = m
            idx = np.empty((q,) + m.idx.shape, m.idx.dtype)
            val = np.empty((q,) + m.val.shape, m.val.dtype)
            combines = [
                np.empty((q,) + c.shape, c.dtype) for c in m.combine
            ]
        idx[j] = m.idx
        val[j] = m.val
        for s, c in enumerate(m.combine):
            combines[s][j] = c
        n_rows = max(n_rows, m.n_rows)
        n_cols = max(n_cols, m.n_cols)
        del m
    return EllMat(
        idx=idx,
        val=val,
        combine=tuple(combines),
        n_rows=n_rows,
        n_cols=n_cols,
        stage_inputs=m0.stage_inputs,
    )


def _occupied_submatrix(
    A: sparse.csr_matrix, occ_pad: int | None = None
) -> tuple[sparse.csr_matrix, np.ndarray, int]:
    """(occupied-rows submatrix padded to ``occ_pad`` rows, row_map, occ)."""
    A = A.tocsr()
    nnz_per_row = np.diff(A.indptr)
    occ_rows = np.flatnonzero(nnz_per_row)
    occ = occ_rows.size
    pad = occ_pad if occ_pad is not None else max(occ, 1)
    assert pad >= occ
    Ac = A[occ_rows]
    Ac.resize((pad, A.shape[1]))
    row_map = np.full(A.shape[0], pad, dtype=np.int32)  # pad == zero row
    row_map[occ_rows] = np.arange(occ, dtype=np.int32)
    return Ac.tocsr(), row_map, occ


def compact_ell_from_csr(
    A: sparse.csr_matrix,
    slots_per_row: int | None = None,
    dtype=np.float32,
    occ_pad: int | None = None,
    **ell_kw,
) -> CompactEll:
    """Convert a scipy CSR matrix into :class:`CompactEll`."""
    A = A.tocsr()
    Ac, row_map, _ = _occupied_submatrix(A, occ_pad)
    inner = ell_from_csr(Ac, slots_per_row, dtype, **ell_kw)
    return CompactEll(
        inner=inner, row_map=row_map, n_rows=A.shape[0], n_cols=A.shape[1]
    )


def stack_compact_ells_from_csr(
    blocks: list[sparse.csr_matrix],
    slots_per_row: int | None = None,
    dtype=np.float32,
) -> CompactEll:
    """(q, ...)-stacked :class:`CompactEll` with a COMMON static structure
    (shared occupied-row padding, slot count and combine-chain shapes), for
    per-device execution under shard_map."""
    occ_pad = max(
        max(int((np.diff(b.tocsr().indptr) > 0).sum()) for b in blocks), 1
    )
    padded = [_occupied_submatrix(b, occ_pad) for b in blocks]
    inner = stack_ells_from_csr([p[0] for p in padded], slots_per_row, dtype)
    row_maps = np.stack([p[1] for p in padded]).astype(np.int32)
    return CompactEll(
        inner=inner,
        row_map=row_maps,
        n_rows=max(b.shape[0] for b in blocks),
        n_cols=max(b.shape[1] for b in blocks),
    )


def ell_cost_rows(A: sparse.csr_matrix) -> tuple[int, int]:
    """Estimated gathered rows for the full-identity vs compact layouts of
    ``A`` — the gather engine is the bottleneck, so gathered rows ≈ cost.
    Returns (full_rows, compact_rows)."""
    A = A.tocsr()
    nnz_per_row = np.diff(A.indptr).astype(np.int64)
    occ = int((nnz_per_row > 0).sum())

    def slots(rows_nnz, n_rows):
        if n_rows == 0:
            return 0
        R = choose_slot_count(rows_nnz)
        extra = np.maximum(rows_nnz - R, 0)
        return n_rows * R + int((-(-extra // R) * R).sum())

    full = slots(nnz_per_row, A.shape[0])
    compact = slots(nnz_per_row[nnz_per_row > 0], occ) + A.shape[0]
    return full, compact
