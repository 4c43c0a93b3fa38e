"""1-D row-slice partition with static communication tables.

Capability parity with the reference's ``MatrixSlice`` (reference:
arrow/matrix_slice.py): each device owns a contiguous row slice of A (and the
matching rows of X); the columns of its slice that fall outside its own range
determine which remote X rows it needs. The reference learns send tables via
``Alltoall`` of counts + ``Alltoallv`` of indices at setup and exchanges
ragged row sets per iteration (reference: matrix_slice.py:185-273,
arrow/baseline/spmm_petsc.py:105-144). Here everything is derived host-side
at plan time:

* per (owner, requester) pair, the owner-local rows to ship, padded to the
  static pairwise max M — one fixed-shape ``all_to_all`` per iteration;
* ``A_nonlocal``'s column indices are relabeled AT PLAN TIME to point
  directly into the flattened receive buffer (slot ``owner * M + m``), so the
  received rows are consumed in place with zero reshuffling — the reference
  instead permutes received rows into an X_nonlocal scratch every iteration
  (reference: spmm_petsc.py:203-213).

Row slices may be unequal, including empty slices (the reference tests both,
tests/test_spmmPETSc.py:44-71); all slices are padded to the maximum length.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
from scipy import sparse

from flax import struct

from arrow_matrix_tpu.ops.bsr_pallas import (
    preferred_format_blocks,
    stack_bsr_from_csr,
)
from arrow_matrix_tpu.ops.formats import stack_ells_from_csr


@struct.dataclass
class MatrixSlicePlan:
    # (q, ...)-stacked EllMat or BsrMat per role, chosen by the cost model.
    A_local: object  # own-column blocks, columns = local X rows
    A_nonlocal: object  # remote columns, relabeled into recv buffer
    send_idx: np.ndarray  # (q, q, M) owner-local rows per requester, pad=lmax
    lmax: int = struct.field(pytree_node=False)
    max_per_pair: int = struct.field(pytree_node=False)
    n_devices: int = struct.field(pytree_node=False)
    n_rows: int = struct.field(pytree_node=False)
    row_starts: tuple = struct.field(pytree_node=False)


def partition_rows(n_rows: int, n_devices: int) -> List[int]:
    """Even partition (last slice ragged) — the reference's default when no
    hypergraph partition file is given (reference: spmm_petsc.py:424-427)."""
    per = -(-n_rows // n_devices)
    counts = [min(per, max(0, n_rows - d * per)) for d in range(n_devices)]
    return counts


def build_slice_plan(
    A: sparse.csr_matrix,
    row_counts: Sequence[int] | None = None,
    n_devices: int | None = None,
    slots_per_row: int | None = None,
    pad_multiple: int = 8,
    k_hint: int = 32,
    force_format: str | None = None,
    exchange: str = "rows",
) -> MatrixSlicePlan:
    """Build a :class:`MatrixSlicePlan` from a square matrix and a row
    partition (defaults to an even split over ``n_devices``).

    :param exchange: ``"rows"`` ships exactly the needed remote rows (the
        reference's element exchange, arrow/baseline/spmm_petsc.py:147-176);
        ``"ranges"`` ships the contiguous owner-local range covering them
        (the reference's slice exchange, spmm_petsc.py:105-144) — more wire
        bytes when needs are sparse within a range, but the send-side
        gather becomes sequential (band-local plateau rate on the TPU
        gather engine).
    """
    assert exchange in ("rows", "ranges"), exchange
    A = sparse.csr_matrix(A, dtype=np.float32)
    n = A.shape[0]
    assert A.shape[1] == n, "1-D slice partition assumes a square matrix"
    if row_counts is None:
        assert n_devices is not None
        row_counts = partition_rows(n, n_devices)
    q = len(row_counts)
    assert sum(row_counts) == n, "row counts must cover the matrix"
    row_starts = np.concatenate(([0], np.cumsum(row_counts))).astype(np.int64)
    lmax = max(1, max(row_counts))

    # Needed remote rows per device: unique out-of-range nonzero columns
    # (reference: construct_receive_tables, matrix_slice.py:185-227).
    needed: List[np.ndarray] = []
    for d in range(q):
        sl = A[row_starts[d] : row_starts[d + 1]]
        cols = np.unique(sl.tocoo().col)
        outside = cols[(cols < row_starts[d]) | (cols >= row_starts[d + 1])]
        needed.append(outside)

    counts = np.zeros((q, q), dtype=np.int64)  # [owner, requester]
    owner_of = lambda g: np.searchsorted(row_starts, g, side="right") - 1
    needed_owner = [owner_of(nd) for nd in needed]
    for d in range(q):
        o, cnt = np.unique(needed_owner[d], return_counts=True)
        if exchange == "ranges" and o.size:
            # Pair count = contiguous covering range, not the exact rows.
            for oo in o:
                sel = needed[d][needed_owner[d] == oo]
                counts[oo, d] = int(sel.max() - sel.min()) + 1
        else:
            counts[o, d] = cnt
    M = int(counts.max()) if counts.size else 0
    M = max(1, -(-M // pad_multiple) * pad_multiple)

    send_idx = np.full((q, q, M), lmax, dtype=np.int32)
    # Map each needed global row of requester d to its recv-buffer slot.
    recv_slot: List[dict] = [dict() for _ in range(q)]
    for d in range(q):
        owners = needed_owner[d]
        rows = needed[d]
        # Needed rows are sorted; group by owner preserving order.
        for o in np.unique(owners):
            sel = rows[owners == o]
            if exchange == "ranges":
                lo = int(sel.min() - row_starts[o])
                cnt = int(sel.max() - sel.min()) + 1
                send_idx[o, d, :cnt] = np.arange(
                    lo, lo + cnt, dtype=np.int32
                )
                for g in sel:
                    recv_slot[d][int(g)] = (
                        int(o) * M + int(g - row_starts[o]) - lo
                    )
            else:
                send_idx[o, d, : sel.size] = (
                    sel - row_starts[o]
                ).astype(np.int32)
                for m, g in enumerate(sel):
                    recv_slot[d][int(g)] = int(o) * M + m

    local_blocks, nonlocal_blocks = [], []
    for d in range(q):
        sl = A[row_starts[d] : row_starts[d + 1]].tocoo()
        in_range = (sl.col >= row_starts[d]) & (sl.col < row_starts[d + 1])
        loc = sparse.csr_matrix(
            (
                sl.data[in_range],
                (sl.row[in_range], sl.col[in_range] - row_starts[d]),
            ),
            shape=(lmax, lmax),
        )
        slot_map = recv_slot[d]
        far_cols = np.asarray(
            [slot_map[int(g)] for g in sl.col[~in_range]], dtype=np.int64
        )
        far = sparse.csr_matrix(
            (sl.data[~in_range], (sl.row[~in_range], far_cols)),
            shape=(lmax, q * M),
        )
        local_blocks.append(loc)
        nonlocal_blocks.append(far)

    def build_role(blocks):
        # Per-role format: dense-enough slices take the Pallas BSR/MXU path
        # (k = 32 is the reference PETSc default, spmm_petsc_main.py:34);
        # naturally banded slices beyond VMEM residency take the windowed
        # BSR path (calibration-gated — grids arrive banded).
        if force_format == "window":
            from arrow_matrix_tpu.ops.bsr_pallas import stack_windowed_from_csr

            return stack_windowed_from_csr(blocks)
        if force_format is None:
            from arrow_matrix_tpu.ops.dispatch import stacked_windowed_or_none

            wm = stacked_windowed_or_none(blocks, k_hint)
            if wm is not None:
                return wm
        fmt = force_format or preferred_format_blocks(blocks, k_hint)
        if fmt == "bsr":
            return stack_bsr_from_csr(blocks)
        return stack_ells_from_csr(blocks, slots_per_row)

    return MatrixSlicePlan(
        A_local=build_role(local_blocks),
        A_nonlocal=build_role(nonlocal_blocks),
        send_idx=send_idx,
        lmax=lmax,
        max_per_pair=M,
        n_devices=q,
        n_rows=n,
        row_starts=tuple(int(s) for s in row_starts),
    )


def check_comm_tables(plan: MatrixSlicePlan, A: sparse.csr_matrix) -> None:
    """Independent consistency pass over the exchange tables (the
    reference's ``check_comm_tables``, arrow/matrix_slice.py:157-182, which
    cross-validates the Alltoall-learned tables against local needs).

    Re-derives each requester's remote-row needs from ``A`` with set
    arithmetic — deliberately NOT the plan builder's grouping code path —
    and asserts the send tables cover them exactly:

    * every needed (requester, global row) appears in its owner's send
      column for that requester;
    * every non-padding send entry is a valid owner-local row;
    * no pair exceeds the static budget M.

    :raises AssertionError: on any violation.
    """
    A = sparse.csr_matrix(A)
    q, M, lmax = plan.n_devices, plan.max_per_pair, plan.lmax
    starts = np.asarray(plan.row_starts, dtype=np.int64)
    send = np.asarray(plan.send_idx)
    assert send.shape == (q, q, M), (send.shape, q, M)
    for d in range(q):
        sl = A[starts[d] : starts[d + 1]]
        need = set(
            int(c)
            for c in np.unique(sl.tocoo().col)
            if c < starts[d] or c >= starts[d + 1]
        )
        shipped = set()
        for o in range(q):
            rows = send[o, d]
            rows = rows[rows != lmax]
            count_o = starts[o + 1] - starts[o]
            assert ((rows >= 0) & (rows < count_o)).all(), (
                f"send[{o},{d}] references rows outside owner {o}'s slice"
            )
            shipped.update(int(starts[o] + r) for r in rows)
        missing = need - shipped
        assert not missing, (
            f"requester {d}: {len(missing)} needed remote rows not shipped"
        )
