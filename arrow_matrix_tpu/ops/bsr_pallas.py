"""Block-sparse (BSR) SpMM Pallas TPU kernel.

The second of the two sparse formats (SURVEY §7 "two formats: dense-panel
matmul for head blocks, gather+ELL for the band"): the matrix is cut into
(TM x TN) dense tiles, only nonzero tiles are stored (grouped by tile row),
and a Pallas kernel streams them through VMEM while the whole dense operand X
stays resident in VMEM:

* grid = one program per batch of ``TB`` tiles of one tile row; the batched
  A-tile block is double-buffered HBM->VMEM by the Pallas pipeline;
* each tile's X slice is a dynamic sublane slice of the VMEM-resident X —
  no per-tile DMA, no gather;
* partial sums accumulate in a VMEM scratch and are flushed once per tile
  row (scalar-prefetched row ids drive the output index_map).

This replaces the reference's cuSPARSE CSRMM vendor call
(reference: arrow/common/sp2cp.py:6-16) with a custom TPU kernel. It wins
over the gather-ELL path when occupied tiles are dense enough that streaming
tile data beats gathering k-wide rows per nonzero; the plan compiler picks
per block via :func:`preferred_format`.
"""

from __future__ import annotations

import numpy as np
from scipy import sparse

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from flax import struct


@struct.dataclass
class BsrMat:
    """Tile-sparse matrix, grouped by ROW GROUPS of ``rows_per_program``
    consecutive tile rows.

    * ``tiles_data``: (T, TM, TN) — dense tile payloads; per row group the
      tile count is padded to a multiple of the program batch ``TB`` with
      all-zero tiles (their column id is 0, harmless).
    * ``tiles_col``: (T,) int32 — tile column ids.
    * ``tiles_lrow``: (T,) int32 — each tile's LOCAL tile-row index within
      its row group (0..rows_per_program-1); all zero when
      ``rows_per_program == 1``.
    * ``prog_rows``: (T / TB,) int32 — the row-GROUP id of each program's
      batch; programs of one group are consecutive.

    ``rows_per_program > 1`` exists to amortize the fixed per-grid-step cost
    (~0.3 us measured on v5e) over several thin tile rows: banded operators
    after RCM have ~4 occupied tiles per 128-row tile row, so one-row
    programs both pad the tile stream 2x (row counts round up to TB) and pay
    the step cost per 4 tiles. Grouping 4 rows into one program with TB=16
    eliminates the padding AND quarters the step count.
    """

    tiles_data: jnp.ndarray
    tiles_col: jnp.ndarray
    prog_rows: jnp.ndarray
    # Per tile-row occupancy (n_row_tiles,): output blocks of rows without
    # any stored tile are never written by the kernel and must be masked.
    row_occupied: jnp.ndarray
    n_rows: int = struct.field(pytree_node=False)
    n_cols: int = struct.field(pytree_node=False)
    tile_m: int = struct.field(pytree_node=False)
    tile_n: int = struct.field(pytree_node=False)
    n_row_tiles: int = struct.field(pytree_node=False)
    n_col_tiles: int = struct.field(pytree_node=False)
    tiles_per_program: int = struct.field(pytree_node=False)
    tiles_lrow: jnp.ndarray | None = None
    rows_per_program: int = struct.field(pytree_node=False, default=1)
    #: Static shortcut: every tile row holds at least one tile, so the
    #: kernel writes the whole output and the row_occupied mask pass (a
    #: full-output read+write, ~0.26ms at 202k rows) can be skipped.
    all_occupied: bool = struct.field(pytree_node=False, default=False)

    @property
    def n_tiles(self) -> int:
        return self.tiles_data.shape[0]

    @property
    def n_programs(self) -> int:
        return self.prog_rows.shape[0]

    @property
    def n_row_groups(self) -> int:
        return -(-self.n_row_tiles // self.rows_per_program)


#: Measured v5e per-(128,128)-f32-tile streaming cost and fixed per-grid-
#: step cost of the BSR kernels (round-3 TB sweep, tools/bench_bsr_tb.py:
#: t = 111 ns * tiles + 312 ns * programs fits the resident sweep and
#: predicts the windowed grid-202k time within 2%). Used by
#: :func:`choose_program_shape` to pick (tiles_per_program,
#: rows_per_program) and by the executor cost models.
BSR_TILE_STREAM_NS = 111.0
BSR_PROGRAM_NS = 312.0


def resolve_tile_dtype(dtype, values):
    """Resolve the BSR tile-payload dtype, with ``"auto"`` meaning: use
    bfloat16 when every nonzero value is EXACTLY bf16-representable (unit
    edge weights — every generator graph and typical adjacency matrices),
    else float32.

    The kernels upcast each tile to f32 before the MXU dot
    (``a_ref[r].astype(jnp.float32)``), so a lossless bf16 payload yields
    bit-identical results while halving the A-tile HBM stream — the
    dominant term of the windowed step on big banded operators (grid-1M:
    5.47 ms of the 8.32 ms step streams 2.0 GB of f32 tiles at 0.8%
    density). NaNs or non-representable values fall back to f32."""
    if isinstance(dtype, str) and dtype != "auto":
        # Normalize string dtypes up front ("bfloat16", "float32", ...) so
        # an unrecognized name fails HERE with a clear error instead of
        # deep inside a downstream np.zeros call.
        return jnp.dtype(dtype)
    if not (isinstance(dtype, str) and dtype == "auto"):
        return dtype or np.float32
    v = np.asarray(values, dtype=np.float32)
    if v.size and bool(np.all(v == v.astype(jnp.bfloat16).astype(np.float32))):
        return jnp.bfloat16
    return np.float32


def choose_program_shape(
    row_tile_counts: np.ndarray,
    max_tb: int = 16,
    max_rows_per_program: int = 4,
) -> tuple[int, int]:
    """Pick ``(tiles_per_program, rows_per_program)`` minimizing the
    measured cost model ``padded_tiles * BSR_TILE_STREAM_NS + programs *
    BSR_PROGRAM_NS`` over the given per-tile-row occupied-tile counts.

    ``max_tb`` bounds the double-buffered A-tile block at 2*TB*64KB VMEM
    (16 -> 2MB); ``max_rows_per_program`` bounds the accumulator block."""
    counts = np.asarray(row_tile_counts, dtype=np.int64)
    best = None
    for rp in (1, 2, 4, 8):
        if rp > max_rows_per_program:
            break
        pad_rows = (-counts.size) % rp
        gc = np.pad(counts, (0, pad_rows)).reshape(-1, rp).sum(axis=1)
        gc = gc[gc > 0]
        for tb in (2, 4, 8, 16, 32):
            if tb > max_tb:
                break
            padded = int((-(-gc // tb) * tb).sum()) if gc.size else tb
            progs = max(1, padded // tb)
            cost = padded * BSR_TILE_STREAM_NS + progs * BSR_PROGRAM_NS
            if best is None or cost < best[0]:
                best = (cost, tb, rp)
    return best[1], best[2]


def bsr_from_csr(
    A: sparse.csr_matrix,
    tile_m: int = 128,
    tile_n: int = 128,
    dtype=np.float32,
    tiles_per_program: int | None = 8,
    rows_per_program: int = 1,
) -> BsrMat:
    """Pack a scipy CSR matrix into :class:`BsrMat` (host-side, vectorized).

    ``tiles_per_program=None`` picks ``(TB, rows_per_program)`` via
    :func:`choose_program_shape` (the ``rows_per_program`` argument is then
    ignored)."""
    A = A.tocsr()
    A.sum_duplicates()
    n_rows, n_cols = A.shape
    n_row_tiles = max(1, -(-n_rows // tile_m))
    n_col_tiles = max(1, -(-n_cols // tile_n))

    coo = A.tocoo()
    trow = (coo.row // tile_m).astype(np.int64)
    tcol = (coo.col // tile_n).astype(np.int64)
    tile_id = trow * n_col_tiles + tcol
    order = np.argsort(tile_id, kind="stable")
    tid_sorted = tile_id[order]
    uniq, nnz_starts = np.unique(tid_sorted, return_index=True)

    urow = (uniq // n_col_tiles).astype(np.int32)
    ucol = (uniq % n_col_tiles).astype(np.int32)
    row_tile_counts = np.bincount(urow, minlength=n_row_tiles)

    if tiles_per_program is None:
        tiles_per_program, rows_per_program = choose_program_shape(
            row_tile_counts
        )
    TB, RP = tiles_per_program, rows_per_program
    n_groups = -(-n_row_tiles // RP)

    # Tiles per row GROUP, padded per group to a multiple of TB.
    ugroup = urow // RP
    group_tile_counts = np.bincount(ugroup, minlength=n_groups)
    occupied_groups = np.flatnonzero(group_tile_counts)
    padded_counts = np.zeros_like(group_tile_counts)
    padded_counts[occupied_groups] = (
        -(-group_tile_counts[occupied_groups] // TB) * TB
    )
    T_pad = max(TB, int(padded_counts.sum()))

    data = np.zeros((T_pad, tile_m, tile_n), dtype=dtype)
    cols = np.zeros(T_pad, dtype=np.int32)
    lrows = np.zeros(T_pad, dtype=np.int32)
    prog_rows = np.zeros(T_pad // TB, dtype=np.int32)
    row_occupied = np.zeros(n_row_tiles, dtype=bool)

    if uniq.size:
        row_occupied[urow] = True
        group_offsets = np.concatenate(([0], np.cumsum(padded_counts)))
        # Slot of each real tile: group offset + rank within group (tiles
        # are already sorted by (row, col) within the group).
        rank_in_group = np.arange(uniq.size) - np.concatenate(
            ([0], np.cumsum(group_tile_counts)))[ugroup]
        slot = group_offsets[ugroup] + rank_in_group
        cols[slot] = ucol
        lrows[slot] = (urow % RP).astype(np.int32)
        # Program row-group ids.
        pgrp = np.repeat(np.arange(n_groups), padded_counts // TB)
        prog_rows[:] = pgrp.astype(np.int32)
        # Scatter nonzeros into tile payloads.
        slot_of_nnz = slot[np.searchsorted(uniq, tid_sorted)]
        lr = coo.row[order] - (trow[order] * tile_m)
        lc = coo.col[order] - (tcol[order] * tile_n)
        data[slot_of_nnz, lr, lc] = coo.data[order].astype(dtype)

    return BsrMat(
        tiles_data=data,
        tiles_col=cols,
        prog_rows=prog_rows,
        row_occupied=row_occupied,
        n_rows=n_rows,
        n_cols=n_cols,
        tile_m=tile_m,
        tile_n=tile_n,
        n_row_tiles=n_row_tiles,
        n_col_tiles=n_col_tiles,
        tiles_per_program=TB,
        tiles_lrow=lrows,
        rows_per_program=RP,
        all_occupied=bool(row_occupied.all()),
    )


def _tile_dot(a, xb, precision):
    """One (TM, TN) x (TN, k) tile product with f32 accumulation. bf16
    A-tiles against a bf16 operand run the MXU natively (products of bf16
    values are exact in the f32 accumulator — the only rounding in a bf16
    STATE pipeline is the one per-step output round-off); any other dtype
    mix upcasts both sides to f32 (the historical path).

    bf16 inputs must run at DEFAULT precision: Mosaic rejects a bf16 lhs
    under an fp32 contract precision ("Bad lhs type", measured on v5e),
    and the single native MXU pass is already exact for bf16 operands."""
    if a.dtype == jnp.bfloat16 and xb.dtype == jnp.bfloat16:
        return lax.dot_general(
            a,
            xb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.DEFAULT,
        )
    return lax.dot_general(
        a.astype(jnp.float32),
        xb.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _make_kernel(TB: int, TN: int, precision, RP: int = 1, TM: int = 128,
                 KR: int | None = None):
    """``KR``: real feature-column count when the operand rides at the
    lane-padded 128-column physical width (the zero-copy state). The block
    fetch/writeback traffic is 512 B/row regardless, but an MXU dot pays per
    OUTPUT LANE — at k=16 a 128-wide dot does 8x the useful work. With KR
    the dot and accumulator run at KR lanes (operand block sliced
    ``[:, :KR]``) and the flush zero-fills the output block's remaining
    lanes, preserving the "columns beyond k stay zero" state contract."""

    def kernel(prog_rows_ref, cols_ref, lrows_ref, a_ref, x_ref, o_ref,
               acc_ref):
        p = pl.program_id(0)
        n_p = pl.num_programs(0)
        row_here = prog_rows_ref[p]

        is_first = jnp.logical_or(
            p == 0, prog_rows_ref[jnp.maximum(p - 1, 0)] != row_here
        )

        @pl.when(is_first)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for r in range(TB):
            col = cols_ref[p * TB + r]
            xb = (
                x_ref[pl.ds(col * TN, TN), :]
                if KR is None
                else x_ref[pl.ds(col * TN, TN), :KR]
            )
            dot = _tile_dot(a_ref[r], xb, precision)
            if RP == 1:
                acc_ref[:] += dot
            else:
                # Accumulate into this tile's row slot within the group
                # (dynamic 128-aligned sublane offset).
                off = lrows_ref[p * TB + r] * TM
                acc_ref[pl.ds(off, TM), :] += dot

        is_last = jnp.logical_or(
            p == n_p - 1, prog_rows_ref[jnp.minimum(p + 1, n_p - 1)] != row_here
        )

        @pl.when(is_last)
        def _():
            if KR is None:
                o_ref[:] = acc_ref[:].astype(o_ref.dtype)
            else:
                o_ref[:, :KR] = acc_ref[:].astype(o_ref.dtype)
                o_ref[:, KR:] = jnp.zeros_like(o_ref[:, KR:])

    return kernel


def bsr_spmm(
    m: BsrMat,
    x: jnp.ndarray,
    interpret: bool | None = None,
    precision=lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """``Y = A @ X`` for a BsrMat and a dense operand padded to
    ``n_col_tiles * tile_n`` rows; X is held entirely in VMEM.

    Returns (n_row_tiles*tile_m, k) float32; slice to ``m.n_rows``. Rows whose
    tile row holds no tiles are zero. Runs in Pallas interpret mode on CPU
    (tests), compiled on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    k = x.shape[1]
    TB, TM, TN = m.tiles_per_program, m.tile_m, m.tile_n
    RP = m.rows_per_program
    assert x.shape[0] == m.n_col_tiles * TN, (x.shape, m.n_col_tiles * TN)
    lrow = m.tiles_lrow
    if lrow is None:
        lrow = jnp.zeros_like(m.tiles_col)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m.n_programs,),
        in_specs=[
            pl.BlockSpec((TB, TM, TN), lambda p, rows, cols, lrows: (p, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # X fully resident
        ],
        out_specs=pl.BlockSpec(
            (RP * TM, k), lambda p, rows, cols, lrows: (rows[p], 0)
        ),
        scratch_shapes=[pltpu.VMEM((RP * TM, k), jnp.float32)],
    )
    out = pl.pallas_call(
        _make_kernel(TB, TN, precision, RP, TM),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (m.n_row_groups * RP * TM, k), jnp.float32
        ),
        interpret=interpret,
    )(m.prog_rows, m.tiles_col, lrow, m.tiles_data, x)
    out = out[: m.n_row_tiles * TM]
    if m.all_occupied:
        return out
    # Output blocks of unoccupied tile rows are never written by the kernel:
    # mask them to zero (static mask, elementwise select).
    mask = jnp.repeat(m.row_occupied, TM)[:, None]
    return jnp.where(mask, out, 0.0)


def _make_stream_kernel(TB: int, TN: int, precision, RP: int = 1,
                        TM: int = 128, accumulate: bool = False,
                        KR: int | None = None):
    """Streaming-X variant: X lives in HBM; each program DMAs the (TN, k)
    X slices its TB tiles need into a double-buffered VMEM scratch, with the
    NEXT program's slices prefetched while this program's dots run.

    With ``accumulate`` an extra y operand (same block mapping as the
    output, aliased to it in-place) is added at flush time — the fused
    "C += A @ X" the windowed executor uses to fold the residual into the
    window result without a separate full-size add pass."""

    def kernel(
        prog_rows_ref, cols_ref, lrows_ref, a_ref, x_ref, *refs
    ):
        if accumulate:
            y_ref, o_ref, acc_ref, xbuf_ref, sem_ref = refs
        else:
            o_ref, acc_ref, xbuf_ref, sem_ref = refs
        p = pl.program_id(0)
        n_p = pl.num_programs(0)
        slot = lax.rem(p, 2)
        nxt = lax.rem(p + 1, 2)

        def issue(prog, buf):
            for r in range(TB):
                col = cols_ref[prog * TB + r]
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(col * TN, TN), :],
                    xbuf_ref.at[buf, r],
                    sem_ref.at[buf, r],
                ).start()

        @pl.when(p == 0)
        def _():
            issue(0, 0)

        @pl.when(p + 1 < n_p)
        def _():
            issue(p + 1, nxt)

        row_here = prog_rows_ref[p]
        is_first = jnp.logical_or(
            p == 0, prog_rows_ref[jnp.maximum(p - 1, 0)] != row_here
        )

        @pl.when(is_first)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for r in range(TB):
            col = cols_ref[p * TB + r]
            pltpu.make_async_copy(
                x_ref.at[pl.ds(col * TN, TN), :],
                xbuf_ref.at[slot, r],
                sem_ref.at[slot, r],
            ).wait()
            xb = (
                xbuf_ref[slot, r]
                if KR is None
                else xbuf_ref[slot, r][:, :KR]
            )
            dot = _tile_dot(a_ref[r], xb, precision)
            if RP == 1:
                acc_ref[:] += dot
            else:
                off = lrows_ref[p * TB + r] * TM
                acc_ref[pl.ds(off, TM), :] += dot

        is_last = jnp.logical_or(
            p == n_p - 1, prog_rows_ref[jnp.minimum(p + 1, n_p - 1)] != row_here
        )

        @pl.when(is_last)
        def _():
            if KR is None:
                if accumulate:
                    o_ref[:] = (
                        acc_ref[:] + y_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)
                else:
                    o_ref[:] = acc_ref[:].astype(o_ref.dtype)
            elif accumulate:
                # Lanes beyond KR pass the aliased prior result through
                # (the window kernel already zero-filled them).
                o_ref[:, :KR] = (
                    acc_ref[:] + y_ref[:, :KR].astype(jnp.float32)
                ).astype(o_ref.dtype)
                o_ref[:, KR:] = y_ref[:, KR:]
            else:
                o_ref[:, :KR] = acc_ref[:].astype(o_ref.dtype)
                o_ref[:, KR:] = jnp.zeros_like(o_ref[:, KR:])

    return kernel


def _group_mask(m: BsrMat, n_out: int | None = None) -> jnp.ndarray:
    """(n_out, 1) bool mask of rows whose tile row holds at least one tile;
    group-pad tile rows and rows beyond the group grid (never written, i.e.
    uninitialized when ``out_rows`` overhangs) are masked off too."""
    RP, TM = m.rows_per_program, m.tile_m
    n_out = m.n_row_groups * RP * TM if n_out is None else n_out
    occ = jnp.pad(m.row_occupied, (0, n_out // TM - m.n_row_tiles))
    return jnp.repeat(occ, TM)[:, None]


def bsr_spmm_stream(
    m: BsrMat,
    x: jnp.ndarray,
    interpret: bool | None = None,
    precision=lax.Precision.HIGHEST,
    raw: bool = False,
    out_rows: int | None = None,
    accumulate_into: jnp.ndarray | None = None,
    k_real: int | None = None,
) -> jnp.ndarray:
    """``Y = A @ X`` with X STREAMED from HBM per tile (no VMEM residency
    requirement — any operand height). Same contract as :func:`bsr_spmm`.

    ``k_real``: when the operand is the lane-padded 128-column state with
    only the first ``k_real`` columns live, run the dots/accumulator at
    ``k_real`` lanes (see :func:`_make_kernel`); output lanes beyond it are
    zero-filled (or passed through from ``accumulate_into``).

    Per (128,128) tile the kernel moves one 64KB A tile plus one lane-padded
    X slice (64KB for k <= 128) — 2x :func:`bsr_spmm`'s traffic, hidden
    behind the same MXU dots by double-buffered manual DMA; the cost model
    (:func:`preferred_format`) accounts for the re-reads when choosing it.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # bf16 operands pass through (half the X-slice DMA and output writeback
    # bytes — the bf16-STATE pipeline); anything else runs f32. The DMA
    # scratch and the output follow the operand dtype.
    if x.dtype != jnp.bfloat16:
        x = x.astype(jnp.float32)
    out_dtype = x.dtype
    k = x.shape[1]
    TB, TM, TN = m.tiles_per_program, m.tile_m, m.tile_n
    # Taller operands are allowed: tile column ids stay < n_col_tiles, so
    # rows beyond are simply never DMA'd (lets bsr_spmm_window pass its
    # window-padded operand through without a slice copy).
    assert x.shape[0] >= m.n_col_tiles * TN, (x.shape, m.n_col_tiles * TN)
    # Mosaic's memref_slice (the manual DMA source/dest) must be 128-aligned
    # along lanes; a k<128 operand is physically lane-padded to 128 anyway,
    # so pad it logically too and slice the result back — no extra in-kernel
    # DMA traffic (the jnp.pad/out-slice copies outside the kernel are real
    # but fuse away when the caller jits around this, and vanish for k=128).
    kp = -(-k // 128) * 128
    if kp != k:
        x = jnp.pad(x, ((0, 0), (0, kp - k)))

    RP = m.rows_per_program
    group_rows = m.n_row_groups * RP * TM
    # Raw callers may ask for a taller output (the iteration-state height)
    # so the epilogue needs no row pad; rows beyond the group grid are never
    # written by any program (uninitialized) — the caller zeroes/masks them.
    n_out = group_rows if out_rows is None else out_rows
    assert n_out >= group_rows and n_out % (RP * TM) == 0, (
        n_out, group_rows, RP * TM)
    lrow = m.tiles_lrow
    if lrow is None:
        lrow = jnp.zeros_like(m.tiles_col)
    acc = accumulate_into is not None
    if acc:
        # In-place "C += A @ X": the prior result rides as an aliased input
        # with the output's block mapping; unwritten groups keep its values,
        # written groups flush acc + y in the kernel — no full-size add pass.
        assert raw and kp == k, (raw, k, kp)
        assert accumulate_into.shape == (n_out, kp), (
            accumulate_into.shape, n_out, kp)
    if k_real is not None and not (0 < k_real < kp):
        k_real = None
    acc_k = kp if k_real is None else k_real
    y_spec = [
        pl.BlockSpec((RP * TM, kp), lambda p, rows, cols, lrows: (rows[p], 0))
    ] if acc else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m.n_programs,),
        in_specs=[
            pl.BlockSpec((TB, TM, TN), lambda p, rows, cols, lrows: (p, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # X stays in HBM
        ] + y_spec,
        out_specs=pl.BlockSpec(
            (RP * TM, kp), lambda p, rows, cols, lrows: (rows[p], 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((RP * TM, acc_k), jnp.float32),
            pltpu.VMEM((2, TB, TN, kp), out_dtype),
            pltpu.SemaphoreType.DMA((2, TB)),
        ],
    )
    operands = (m.prog_rows, m.tiles_col, lrow, m.tiles_data, x)
    if acc:
        operands = operands + (accumulate_into.astype(out_dtype),)
    out = pl.pallas_call(
        _make_stream_kernel(TB, TN, precision, RP, TM, accumulate=acc,
                            KR=k_real),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, kp), out_dtype),
        # Operand indices count the scalar-prefetch args: 0-2 scalars,
        # 3 tiles, 4 x, 5 y.
        input_output_aliases={5: 0} if acc else {},
        interpret=interpret,
    )(*operands)
    if acc:
        return out
    if raw:
        # Group-padded output for callers that fuse the epilogue themselves
        # (slice/mask/add) — see bsr_spmm_window.
        if kp != k:
            out = out[:, :k]
        if not m.all_occupied:
            out = jnp.where(_group_mask(m, n_out), out, 0.0)
        elif n_out > group_rows:
            # All groups written, but the out_rows overhang is not.
            out = lax.dynamic_update_slice(
                out, jnp.zeros((n_out - group_rows, k), out.dtype),
                (group_rows, 0),
            )
        return out
    out = out[: m.n_row_tiles * TM]
    if kp != k:
        out = out[:, :k]
    if m.all_occupied:
        return out
    mask = jnp.repeat(m.row_occupied, TM)[:, None]
    return jnp.where(mask, out, 0.0)


@struct.dataclass
class WindowedBsr:
    """Banded-matrix BSR with per-tile-row X windows.

    The dense operand stays in HBM; each program's X access goes through a
    Pallas BlockSpec WINDOW of ``window_tiles`` consecutive column tiles,
    selected per program by a scalar-prefetched window id. Consecutive
    programs with the same window id reuse the fetched block (the Pallas
    pipeline skips re-fetch on an unchanged block index), so on a banded
    matrix each X window is fetched ~once TOTAL — vs once per tile in
    :func:`bsr_spmm_stream` — while keeping the no-residency-bound property.

    * ``inner``: tiles whose columns fit their row's aligned window, with
      WINDOW-LOCAL tile column ids;
    * ``prog_win``: (n_programs,) int32 window id per program (all programs
      of one tile row share it);
    * ``residual``: tiles straddling a window boundary (global column ids),
      executed by the streaming kernel and summed — a ~bandwidth/window_rows
      fraction on RCM-banded families.
    """

    inner: BsrMat
    prog_win: jnp.ndarray
    residual: BsrMat | None
    window_tiles: int = struct.field(pytree_node=False)
    n_windows: int = struct.field(pytree_node=False)
    # UNIFIED variant (windowed_bsr_from_csr(unified=True)): ``inner``
    # holds ALL tiles in GLOBAL column ids; per tile, ``tiles_wcol`` is the
    # window-local column (0 for straddlers) and ``tiles_resid`` flags
    # straddlers, which the unified kernel fetches by conditional manual
    # DMA instead of a second streaming launch — one grid, no residual add
    # pass, no aliasing copy. ``residual`` is None.
    tiles_wcol: jnp.ndarray | None = None
    tiles_resid: jnp.ndarray | None = None
    #: Consecutive aligned W-blocks each program may read (paired windows:
    #: span=2 doubles the in-window column reach per program — the band
    #: fits [win*W, (win+2)*W) and the residual empties — at one extra
    #: pipelined window operand).
    window_span: int = struct.field(pytree_node=False, default=1)

    @property
    def n_rows(self) -> int:
        return self.inner.n_rows

    @property
    def n_cols(self) -> int:
        return self.inner.n_cols


#: Default X-window size in column tiles when the caller doesn't pin one:
#: measured on grid-1M (k=128, round 3): W=64 8.19 ms, W=128 7.64,
#: W=256 6.83 (585 M nnz/s) — bigger windows cut both window transitions
#: and straddler tiles at the same total fetch volume. The double-buffered
#: window block costs 2*W*128*k*4 bytes of VMEM (W=256, k=128 -> 32 MB;
#: the windowed pallas_calls raise Mosaic's limit to 100 MB).
DEFAULT_WINDOW_TILES = 256


def auto_window_tiles(n_col_tiles: int) -> int:
    """Largest useful window for an operand: no wider than the (8-rounded)
    column tile count."""
    return max(8, min(DEFAULT_WINDOW_TILES, -(-n_col_tiles // 8) * 8))


def windowed_bsr_from_csr(
    A: sparse.csr_matrix,
    window_tiles: int | None = None,
    tile_m: int = 128,
    tile_n: int = 128,
    dtype=np.float32,
    tiles_per_program: int | None = None,
    rows_per_program: int | None = None,
    residual_shape: tuple[int, int] | None = None,
    unified: bool = False,
    window_span: int = 1,
) -> WindowedBsr:
    """Pack a (banded) CSR matrix into :class:`WindowedBsr`.

    ``unified=True`` packs ALL tiles into one grid with per-tile straddler
    flags (see :class:`WindowedBsr`); requires the apply-time feature width
    to be a multiple of 128 lanes (the manual-DMA path's alignment rule).

    Each ROW GROUP (``rows_per_program`` consecutive tile rows — the unit
    one program serves) gets the aligned window ``floor(median_tile_col /
    window_tiles)`` over its nonzero tiles; nonzeros in tiles outside that
    window go to the residual matrix. Works for any matrix — it just
    degrades to mostly residual when the structure is not banded
    (``windowed_tile_fraction`` is the feasibility probe the cost model
    uses). ``tiles_per_program=None`` (default) picks the program shape via
    :func:`choose_program_shape` on the row tile counts."""
    A = A.tocsr()
    A.sum_duplicates()
    coo = A.tocoo()
    n_col_tiles = max(1, -(-A.shape[1] // tile_n))
    W = (
        window_tiles
        if window_tiles is not None
        else auto_window_tiles(n_col_tiles)
    )
    n_row_tiles = max(1, -(-A.shape[0] // tile_m))
    trow = (coo.row // tile_m).astype(np.int64)
    tcol = (coo.col // tile_n).astype(np.int64)

    if tiles_per_program is None or rows_per_program is None:
        tid = trow * n_col_tiles + tcol
        urow = (np.unique(tid) // n_col_tiles).astype(np.int64)
        counts = np.bincount(urow, minlength=n_row_tiles)
        auto_tb, auto_rp = choose_program_shape(counts)
        if tiles_per_program is None:
            tiles_per_program = auto_tb
        if rows_per_program is None:
            rows_per_program = auto_rp
    RP = rows_per_program

    win_of_group = _group_windows(coo, tile_m, tile_n, W, n_row_tiles, RP)
    w = win_of_group[trow // RP]
    in_win = (tcol >= w * W) & (tcol < (w + window_span) * W)

    def pick(mask, shift_cols):
        cols = coo.col[mask]
        if shift_cols:
            cols = cols - (win_of_group[trow[mask] // RP] * W * tile_n)
        M = sparse.csr_matrix(
            (coo.data[mask], (coo.row[mask], cols)),
            shape=(
                A.shape[0],
                A.shape[1] if not shift_cols else window_span * W * tile_n,
            ),
        )
        M.sum_duplicates()
        return M

    if window_span not in (1, 2):
        raise ValueError("window_span must be 1 or 2")
    if unified and window_span != 1:
        raise ValueError("unified windowed packs support window_span=1 only")
    if unified:
        # ONE BsrMat over ALL tiles in GLOBAL column ids; straddlers are
        # flagged per tile and fetched by conditional manual DMA inside the
        # SAME kernel (no residual matrix, no second launch, no add pass).
        inner = bsr_from_csr(
            A, tile_m, tile_n, dtype, tiles_per_program, rows_per_program=RP
        )
        cols = np.asarray(inner.tiles_col).astype(np.int64)
        groups = np.repeat(
            np.asarray(inner.prog_rows), inner.tiles_per_program
        ).astype(np.int64)
        wg = win_of_group[groups]
        inw = (cols >= wg * W) & (cols < (wg + window_span) * W)
        wcol = np.where(inw, cols - wg * W, 0).astype(np.int32)
        flags = (~inw).astype(np.int32)
        prog_win = win_of_group[np.asarray(inner.prog_rows)].astype(np.int32)
        inner, prog_win, (wcol, flags) = _sort_programs_by_window(
            inner, prog_win, (wcol, flags)
        )
        n_windows = int(win_of_group.max()) + 1 if win_of_group.size else 1
        return WindowedBsr(
            inner=inner,
            prog_win=jnp.asarray(prog_win),
            residual=None,
            window_tiles=W,
            n_windows=n_windows,
            tiles_wcol=jnp.asarray(wcol),
            tiles_resid=jnp.asarray(flags),
            window_span=window_span,
        )

    # The inner matrix lives in window-local coordinates: its column space
    # is exactly one window, so bsr_from_csr emits local tile ids directly
    # (pad tiles get local col 0 — in-bounds, zero payload). Its grouping
    # MUST match the window assignment's (rows_per_program=RP).
    inner = bsr_from_csr(
        pick(in_win, True), tile_m, tile_n, dtype, tiles_per_program,
        rows_per_program=RP,
    )
    # Restore the true dimensions (inner's column space is the window).
    inner = inner.replace(n_cols=A.shape[1], n_col_tiles=n_col_tiles)
    residual = None
    if not in_win.all():
        # The residual MUST share the inner's row grouping so both kernels'
        # group-padded outputs have identical shapes (their add then fuses
        # with the final slice — see bsr_spmm_window); only TB may differ.
        r_tb = residual_shape[0] if residual_shape else None
        residual = bsr_from_csr(
            pick(~in_win, False), tile_m, tile_n, dtype, r_tb,
            rows_per_program=RP,
        )
        if residual.rows_per_program != RP:  # auto chooser overrode it
            residual = bsr_from_csr(
                pick(~in_win, False), tile_m, tile_n, dtype,
                residual.tiles_per_program, rows_per_program=RP,
            )
    prog_win = win_of_group[np.asarray(inner.prog_rows)].astype(np.int32)
    inner, prog_win, _ = _sort_programs_by_window(inner, prog_win)
    n_windows = int(win_of_group.max()) + 1 if win_of_group.size else 1
    return WindowedBsr(
        inner=inner,
        prog_win=jnp.asarray(prog_win),
        residual=residual,
        window_tiles=W,
        n_windows=n_windows,
        window_span=window_span,
    )


def _sort_programs_by_window(
    inner: BsrMat, prog_win: np.ndarray, extra: tuple = ()
) -> tuple[BsrMat, np.ndarray, tuple]:
    """Reorder PROGRAMS (blocks of TB tiles) so equal window ids are
    consecutive: the Pallas pipeline re-fetches the X window block whenever
    ``win[p]`` changes, so a wavy band (window ids oscillating between
    adjacent row groups) would re-DMA ~4MB per program. Output placement is
    index-mapped (``rows[p]``), so program order is free; the stable sort
    keeps each group's programs contiguous (the acc/flush contract).
    ``extra`` are per-TILE arrays reordered alongside."""
    TB = inner.tiles_per_program
    order = np.argsort(prog_win, kind="stable")
    if (order == np.arange(order.size)).all():
        return inner, prog_win, extra
    tidx = (order[:, None] * TB + np.arange(TB)).reshape(-1)
    inner = inner.replace(
        tiles_data=np.asarray(inner.tiles_data)[tidx],
        tiles_col=np.asarray(inner.tiles_col)[tidx],
        prog_rows=np.asarray(inner.prog_rows)[order],
        tiles_lrow=(
            np.asarray(inner.tiles_lrow)[tidx]
            if inner.tiles_lrow is not None
            else None
        ),
    )
    extra = tuple(np.asarray(a)[tidx] for a in extra)
    return inner, prog_win[order], extra


def _group_windows(coo, tile_m, tile_n, W, n_row_tiles, RP=1) -> np.ndarray:
    """Aligned window id per row GROUP (RP consecutive tile rows):
    floor(median tile col of the group's nonzero tiles / W)."""
    n_groups = -(-n_row_tiles // RP)
    win = np.zeros(n_groups, dtype=np.int64)
    if coo.nnz == 0:
        return win
    tgrp = (coo.row // (tile_m * RP)).astype(np.int64)
    tcol = (coo.col // tile_n).astype(np.int64)
    order = np.lexsort((tcol, tgrp))
    tg, tc = tgrp[order], tcol[order]
    starts = np.searchsorted(tg, np.arange(n_groups), side="left")
    ends = np.searchsorted(tg, np.arange(n_groups), side="right")
    occupied = ends > starts
    med = np.zeros(n_groups, dtype=np.int64)
    med[occupied] = tc[(starts + (ends - starts) // 2).clip(max=tc.size - 1)][
        occupied
    ]
    win[occupied] = med[occupied] // W
    return win


def windowed_tile_fraction(
    A: sparse.csr_matrix,
    window_tiles: int | None = None,
    tile_m: int = 128,
    tile_n: int = 128,
) -> float:
    """Fraction of nonzeros whose tile fits its row's aligned window (the
    same nnz-median window choice :func:`windowed_bsr_from_csr` makes, at
    rows_per_program=1 — a slightly optimistic probe for grouped packs) —
    the cost model's cheap feasibility probe for :class:`WindowedBsr`."""
    if window_tiles is None:
        window_tiles = auto_window_tiles(
            max(1, -(-A.shape[1] // tile_n))
        )
    coo = A.tocoo()
    if coo.nnz == 0:
        return 1.0
    n_row_tiles = max(1, -(-A.shape[0] // tile_m))
    win = _group_windows(coo, tile_m, tile_n, window_tiles, n_row_tiles)
    trow = (coo.row // tile_m).astype(np.int64)
    tcol = (coo.col // tile_n).astype(np.int64)
    w = win[trow]
    ok = (tcol >= w * window_tiles) & (tcol < (w + 1) * window_tiles)
    return float(ok.mean())


def _make_window_kernel(TB: int, TN: int, precision, RP: int = 1,
                        TM: int = 128, KR: int | None = None):
    base = _make_kernel(TB, TN, precision, RP, TM, KR)

    def kernel(prog_rows_ref, cols_ref, lrows_ref, win_ref, a_ref, x_ref,
               o_ref, acc_ref):
        # win_ref only drives the X BlockSpec index_map; compute is identical.
        del win_ref
        base(prog_rows_ref, cols_ref, lrows_ref, a_ref, x_ref, o_ref, acc_ref)

    return kernel


def _make_paired_window_kernel(TB: int, TN: int, precision, W: int,
                               RP: int = 1, TM: int = 128):
    """Window-span-2 variant: each program may read its aligned window AND
    the next one (two pipelined X operands), so any band narrower than W
    tiles fits [win*W, (win+2)*W) and the residual matrix empties."""

    def kernel(prog_rows_ref, cols_ref, lrows_ref, win_ref, a_ref, x1_ref,
               x2_ref, o_ref, acc_ref):
        del win_ref
        p = pl.program_id(0)
        n_p = pl.num_programs(0)
        row_here = prog_rows_ref[p]
        is_first = jnp.logical_or(
            p == 0, prog_rows_ref[jnp.maximum(p - 1, 0)] != row_here
        )

        @pl.when(is_first)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for r in range(TB):
            col = cols_ref[p * TB + r]

            def accum(xb):
                dot = lax.dot_general(
                    a_ref[r].astype(jnp.float32),
                    xb,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
                if RP == 1:
                    acc_ref[:] += dot
                else:
                    off = lrows_ref[p * TB + r] * TM
                    acc_ref[pl.ds(off, TM), :] += dot

            # Conditional accumulation per operand (a select over two
            # dynamic VMEM loads failed Mosaic compilation).
            @pl.when(col < W)
            def _():
                accum(x1_ref[pl.ds(jnp.minimum(col, W - 1) * TN, TN), :])

            @pl.when(col >= W)
            def _():
                accum(x2_ref[pl.ds((col - W) * TN, TN), :])

        is_last = jnp.logical_or(
            p == n_p - 1, prog_rows_ref[jnp.minimum(p + 1, n_p - 1)] != row_here
        )

        @pl.when(is_last)
        def _():
            o_ref[:] = acc_ref[:]

    return kernel


def _make_unified_window_kernel(TB: int, TN: int, precision, RP: int = 1,
                                TM: int = 128):
    """One grid over ALL tiles: in-window tiles read the auto-pipelined X
    window block; straddler tiles double-buffer their (TN, k) X slice from
    HBM by manual DMA, issued one program ahead (the streaming kernel's
    scheme, gated per tile by the straddler flag)."""

    def kernel(
        prog_rows_ref, cols_ref, lrows_ref, win_ref, wcols_ref, flags_ref,
        a_ref, xw_ref, xh_ref, o_ref, acc_ref, xbuf_ref, sem_ref
    ):
        del win_ref  # drives the X window BlockSpec index_map only
        p = pl.program_id(0)
        n_p = pl.num_programs(0)
        slot = lax.rem(p, 2)
        nxt = lax.rem(p + 1, 2)

        def issue(prog, buf):
            for r in range(TB):
                @pl.when(flags_ref[prog * TB + r] == 1)
                def _():
                    col = cols_ref[prog * TB + r]
                    pltpu.make_async_copy(
                        xh_ref.at[pl.ds(col * TN, TN), :],
                        xbuf_ref.at[buf, r],
                        sem_ref.at[buf, r],
                    ).start()

        @pl.when(p == 0)
        def _():
            issue(0, 0)

        @pl.when(p + 1 < n_p)
        def _():
            issue(p + 1, nxt)

        row_here = prog_rows_ref[p]
        is_first = jnp.logical_or(
            p == 0, prog_rows_ref[jnp.maximum(p - 1, 0)] != row_here
        )

        @pl.when(is_first)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for r in range(TB):
            fl = flags_ref[p * TB + r]
            col = cols_ref[p * TB + r]

            @pl.when(fl == 1)
            def _():
                pltpu.make_async_copy(
                    xh_ref.at[pl.ds(col * TN, TN), :],
                    xbuf_ref.at[slot, r],
                    sem_ref.at[slot, r],
                ).wait()

            xw = xw_ref[pl.ds(wcols_ref[p * TB + r] * TN, TN), :]
            xb = jnp.where(fl == 1, xbuf_ref[slot, r], xw)
            dot = lax.dot_general(
                a_ref[r].astype(jnp.float32),
                xb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            if RP == 1:
                acc_ref[:] += dot
            else:
                off = lrows_ref[p * TB + r] * TM
                acc_ref[pl.ds(off, TM), :] += dot

        is_last = jnp.logical_or(
            p == n_p - 1, prog_rows_ref[jnp.minimum(p + 1, n_p - 1)] != row_here
        )

        @pl.when(is_last)
        def _():
            o_ref[:] = acc_ref[:]

    return kernel


def bsr_spmm_window(
    m: WindowedBsr,
    x: jnp.ndarray,
    interpret: bool | None = None,
    precision=lax.Precision.HIGHEST,
    raw: bool = False,
    out_rows: int | None = None,
    tail: str = "zero",
    k_real: int | None = None,
) -> jnp.ndarray:
    """``Y = A @ X`` for a banded matrix with X windows streamed from HBM
    (no VMEM residency bound; each window fetched ~once on banded
    structure). Same contract as :func:`bsr_spmm`.

    ``x`` may be pre-padded to the window-padded height
    ``n_windows * window_tiles * tile_n`` (:func:`window_padded_rows`) —
    the zero-copy fast path the single-chip step uses; otherwise it is
    padded here. With ``raw=True`` the group-padded
    (n_row_groups * RP * TM, k) output is returned unsliced so the caller
    can fuse the epilogue (slice + downstream add) into one pass.

    ``tail`` governs the ``out_rows`` overhang beyond the group grid, which
    no program ever writes: ``"zero"`` zeroes it per call (a
    dynamic_update_slice between two custom calls — XLA materializes it as
    a FULL-SIZE buffer copy, measured 1.57 ms at 1M rows); ``"undef"``
    leaves it uninitialized. "undef" is only legal when no dot ever reads
    those rows — true whenever ``n_col_tiles*tile_n <= group_rows`` (square
    merged operators: every dot slices the operand strictly below the
    column-tile bound) — and the caller treats them as garbage. NOTE: in
    interpret mode (CPU tests) unwritten rows happen to read as zeros, so
    only hardware exercises the distinction.

    ``k_real``: the lane-padded-state dot-width optimization (see
    :func:`_make_kernel`) — only the first ``k_real`` of the operand's
    (physical) 128 columns are live; dots/accumulators run that narrow and
    output lanes beyond are zero-filled. Supported on the span-1
    non-unified path (the zero-copy fast path); other variants ignore it.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # bf16 operands run the bf16-STATE pipeline on the span-1 non-unified
    # path (half the window-fetch / writeback / loop-carry bytes; products
    # stay exact in the f32 accumulator, the output rounds once per step).
    # The unified and span-2 variants keep f32-only plumbing.
    if x.dtype != jnp.bfloat16 or m.tiles_resid is not None or (
        m.window_span == 2
    ):
        x = x.astype(jnp.float32)
    k = x.shape[1]
    b = m.inner
    TB, TM, TN, W = b.tiles_per_program, b.tile_m, b.tile_n, m.window_tiles
    # Pad X to whole windows so the last window's block reads stay in
    # bounds — including the span-ahead paired operand (garbage-padded OOB
    # reads could inject inf/NaN into zero-payload dots). Taller pre-padded
    # operands (the state height) pass through untouched.
    n_pad = max((m.n_windows + m.window_span - 1) * W * TN,
                b.n_col_tiles * TN)
    assert x.shape[0] == b.n_col_tiles * TN or x.shape[0] >= n_pad, (
        x.shape, b.n_col_tiles * TN, n_pad)
    if n_pad > x.shape[0]:
        x = jnp.concatenate(
            [x, jnp.zeros((n_pad - x.shape[0], k), x.dtype)], axis=0
        )

    RP = b.rows_per_program
    lrow = b.tiles_lrow
    if lrow is None:
        lrow = jnp.zeros_like(b.tiles_col)
    group_rows = b.n_row_groups * RP * TM
    n_out = group_rows if out_rows is None else out_rows
    assert n_out >= group_rows and n_out % (RP * TM) == 0, (
        n_out, group_rows, RP * TM)
    ku = k
    if m.tiles_resid is not None and k % 128:
        # The unified path's manual DMA needs lane-width k (the lane-padded
        # state satisfies it for free; other callers pay a logical pad and
        # a column slice of the result).
        ku = -(-k // 128) * 128
        x = jnp.pad(x, ((0, 0), (0, ku - k)))
    if m.tiles_resid is not None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(b.n_programs,),
            in_specs=[
                pl.BlockSpec(
                    (TB, TM, TN),
                    lambda p, rows, cols, lrows, win, wc, fl: (p, 0, 0),
                ),
                pl.BlockSpec(
                    (W * TN, ku),
                    lambda p, rows, cols, lrows, win, wc, fl: (win[p], 0),
                ),
                pl.BlockSpec(memory_space=pl.ANY),  # X for straddler DMA
            ],
            out_specs=pl.BlockSpec(
                (RP * TM, ku),
                lambda p, rows, cols, lrows, win, wc, fl: (rows[p], 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((RP * TM, ku), jnp.float32),
                pltpu.VMEM((2, TB, TN, ku), jnp.float32),
                pltpu.SemaphoreType.DMA((2, TB)),
            ],
        )
        out = pl.pallas_call(
            _make_unified_window_kernel(TB, TN, precision, RP, TM),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_out, ku), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            b.prog_rows, b.tiles_col, lrow, m.prog_win, m.tiles_wcol,
            m.tiles_resid, b.tiles_data, x, x,
        )
        if ku != k:
            out = out[:, :k]
    elif m.window_span == 2:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b.n_programs,),
            in_specs=[
                pl.BlockSpec(
                    (TB, TM, TN), lambda p, rows, cols, lrows, win: (p, 0, 0)
                ),
                pl.BlockSpec(
                    (W * TN, k), lambda p, rows, cols, lrows, win: (win[p], 0)
                ),
                pl.BlockSpec(
                    (W * TN, k),
                    lambda p, rows, cols, lrows, win: (win[p] + 1, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (RP * TM, k), lambda p, rows, cols, lrows, win: (rows[p], 0)
            ),
            scratch_shapes=[pltpu.VMEM((RP * TM, k), jnp.float32)],
        )
        out = pl.pallas_call(
            _make_paired_window_kernel(TB, TN, precision, W, RP, TM),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_out, k), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(b.prog_rows, b.tiles_col, lrow, m.prog_win, b.tiles_data, x, x)
    else:
        if k_real is not None and not (0 < k_real < k):
            k_real = None
        acc_k = k if k_real is None else k_real
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b.n_programs,),
            in_specs=[
                pl.BlockSpec(
                    (TB, TM, TN), lambda p, rows, cols, lrows, win: (p, 0, 0)
                ),
                pl.BlockSpec(
                    (W * TN, k), lambda p, rows, cols, lrows, win: (win[p], 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (RP * TM, k), lambda p, rows, cols, lrows, win: (rows[p], 0)
            ),
            scratch_shapes=[pltpu.VMEM((RP * TM, acc_k), jnp.float32)],
        )
        out = pl.pallas_call(
            _make_window_kernel(TB, TN, precision, RP, TM, KR=k_real),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_out, k), x.dtype),
            # The window block double-buffers 2*W*TN*k*4 bytes; the default
            # Mosaic VMEM limit rejects W=128 at k=128 (v5e: 128MB physical).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(b.prog_rows, b.tiles_col, lrow, m.prog_win, b.tiles_data, x)
    if not b.all_occupied:
        out = jnp.where(_group_mask(b, n_out), out, 0.0)
    elif n_out > group_rows and tail == "zero":
        # Zero the never-written tail BEFORE the residual folds in (the
        # residual shares the group grid, so it never writes there either);
        # doing it first keeps the aliased-accumulate chain linear.
        out = lax.dynamic_update_slice(
            out, jnp.zeros((n_out - group_rows, k), out.dtype),
            (group_rows, 0),
        )
    if m.residual is not None:
        if b.all_occupied and k % 128 == 0:
            # Every window group is real, so the residual kernel can
            # accumulate IN-PLACE onto the window result (aliased input):
            # unwritten groups keep the window values, written groups flush
            # acc + y — replacing the separate full-size add pass (2.26 ms
            # at 1M rows) with per-written-group block reads (~0.15 ms).
            out = bsr_spmm_stream(m.residual, x,
                                  interpret=interpret, precision=precision,
                                  raw=True, out_rows=n_out,
                                  accumulate_into=out, k_real=k_real)
        else:
            # The residual shares the inner's row grouping (enforced at
            # pack time), so both outputs have identical group-padded
            # shapes and the add + final slice fuse into ONE elementwise
            # pass.
            r = bsr_spmm_stream(m.residual, x,
                                interpret=interpret, precision=precision,
                                raw=True, out_rows=n_out, k_real=k_real)
            assert r.shape == out.shape, (r.shape, out.shape)
            out = out + r
    if raw:
        return out
    return out[: b.n_row_tiles * TM]


def window_padded_rows(m: WindowedBsr) -> int:
    """Operand (and raw-output) height of the zero-copy windowed fast path:
    the whole-window input bound (the LAST program's furthest window
    operand, span blocks ahead), rounded up to the output's program-group
    unit so the kernel can emit the state height directly (no epilogue row
    pad)."""
    b = m.inner
    unit = b.rows_per_program * b.tile_m
    H = max(
        (m.n_windows + m.window_span - 1) * m.window_tiles * b.tile_n,
        b.n_col_tiles * b.tile_n,
    )
    return -(-H // unit) * unit


def _pad_stack_bsr(mats: list[BsrMat], dtype=np.float32) -> BsrMat:
    """Stack per-device BsrMats with a COMMON static tile count (padding
    tiles are all-zero and repeat a sorted row id), for per-device execution
    under shard_map. Returns the stacked mat plus per-mat program padding
    preserved in prog_rows."""
    tile_m, tile_n = mats[0].tile_m, mats[0].tile_n
    TB = mats[0].tiles_per_program
    RP = mats[0].rows_per_program
    assert all(
        m.tiles_per_program == TB and m.rows_per_program == RP for m in mats
    ), "stacked BsrMats must share one (tiles_per_program, rows_per_program)"
    T = max(m.n_tiles for m in mats)
    P = T // TB
    n_row_tiles = max(m.n_row_tiles for m in mats)

    def pad_mat(m: BsrMat):
        t0 = m.n_tiles
        data = np.zeros((T, tile_m, tile_n), dtype=dtype)
        data[:t0] = np.asarray(m.tiles_data)
        cols = np.zeros(T, dtype=np.int32)
        cols[:t0] = np.asarray(m.tiles_col)
        lrows = np.zeros(T, dtype=np.int32)
        if m.tiles_lrow is not None:
            lrows[:t0] = np.asarray(m.tiles_lrow)
        rows = np.asarray(m.prog_rows)
        prog = np.full(P, rows[-1] if rows.size else 0, dtype=np.int32)
        prog[: rows.size] = rows
        occ = np.zeros(n_row_tiles, dtype=bool)
        occ[: m.n_row_tiles] = np.asarray(m.row_occupied)
        return data, cols, lrows, prog, occ

    padded = [pad_mat(m) for m in mats]
    return BsrMat(
        tiles_data=np.stack([p[0] for p in padded]),
        tiles_col=np.stack([p[1] for p in padded]),
        prog_rows=np.stack([p[3] for p in padded]),
        row_occupied=np.stack([p[4] for p in padded]),
        n_rows=max(m.n_rows for m in mats),
        n_cols=max(m.n_cols for m in mats),
        tile_m=tile_m,
        tile_n=tile_n,
        n_row_tiles=n_row_tiles,
        n_col_tiles=max(m.n_col_tiles for m in mats),
        tiles_per_program=TB,
        tiles_lrow=np.stack([p[2] for p in padded]),
        rows_per_program=RP,
        all_occupied=all(
            m.all_occupied and m.n_row_tiles == n_row_tiles for m in mats
        ),
    )


def _stack_program_shape(blocks, tile_m, tile_n):
    """One (TB, RP) choice for a whole stack of blocks: concatenate every
    block's per-tile-row occupied-tile counts and optimize jointly (stacked
    mats must share one program shape)."""
    all_counts = []
    for b in blocks:
        coo = b.tocoo()
        n_row_tiles = max(1, -(-b.shape[0] // tile_m))
        n_col_tiles = max(1, -(-b.shape[1] // tile_n))
        if coo.nnz:
            tid = (coo.row // tile_m).astype(np.int64) * n_col_tiles + (
                coo.col // tile_n
            )
            urow = (np.unique(tid) // n_col_tiles).astype(np.int64)
            all_counts.append(np.bincount(urow, minlength=n_row_tiles))
        else:
            all_counts.append(np.zeros(n_row_tiles, dtype=np.int64))
    return choose_program_shape(np.concatenate(all_counts))


def stack_bsr_from_csr(
    blocks: list[sparse.csr_matrix],
    tile_m: int = 128,
    tile_n: int = 128,
    dtype=np.float32,
    tiles_per_program: int | None = 8,
    rows_per_program: int | None = None,
) -> BsrMat:
    """Build a (q, ...)-stacked BsrMat from CSR blocks with a COMMON static
    tile count, for per-device execution under shard_map.
    ``tiles_per_program=None`` picks one (TB, RP) for the whole stack."""
    if tiles_per_program is None or rows_per_program is None:
        auto_tb, auto_rp = _stack_program_shape(blocks, tile_m, tile_n)
        if tiles_per_program is None:
            tiles_per_program = auto_tb
        if rows_per_program is None:
            rows_per_program = auto_rp
    mats = [
        bsr_from_csr(b, tile_m, tile_n, dtype, tiles_per_program,
                     rows_per_program)
        for b in blocks
    ]
    return _pad_stack_bsr(mats, dtype)


def stack_windowed_from_csr(
    blocks: list[sparse.csr_matrix],
    window_tiles: int | None = None,
    tile_m: int = 128,
    tile_n: int = 128,
    dtype=np.float32,
    tiles_per_program: int | None = None,
) -> WindowedBsr:
    """Build a (q, ...)-stacked :class:`WindowedBsr` from CSR blocks with
    COMMON static shapes (inner/residual tile counts, window count), for
    per-device execution under shard_map — the no-residency banded kernel at
    production block widths. Residual is kept unless EVERY block's tiles fit
    their windows (an all-zero stacked residual would still stream).
    One (TB, RP) program shape is chosen for the whole stack (stacked mats
    must share it); residuals are packed at the fixed shape (8, 1)."""
    if window_tiles is None:
        window_tiles = auto_window_tiles(
            max(1, -(-max(b.shape[1] for b in blocks) // tile_n))
        )
    auto_tb, auto_rp = _stack_program_shape(blocks, tile_m, tile_n)
    if tiles_per_program is not None:
        auto_tb = tiles_per_program
    wms = [
        windowed_bsr_from_csr(
            b, window_tiles, tile_m, tile_n, dtype,
            tiles_per_program=auto_tb, rows_per_program=auto_rp,
            residual_shape=(8, 1),
        )
        for b in blocks
    ]
    inner = _pad_stack_bsr([w.inner for w in wms], dtype)
    n_windows = max(w.n_windows for w in wms)
    P = inner.prog_rows.shape[1]

    def pad_win(w: WindowedBsr):
        pw = np.asarray(w.prog_win)
        out = np.full(P, pw[-1] if pw.size else 0, dtype=np.int32)
        out[: pw.size] = pw
        return out

    prog_win = jnp.asarray(np.stack([pad_win(w) for w in wms]))
    residual = None
    if any(w.residual is not None for w in wms):
        empty = sparse.csr_matrix(
            (inner.n_rows, inner.n_cols), dtype=np.float32
        )
        residual = _pad_stack_bsr(
            [
                w.residual
                if w.residual is not None
                else bsr_from_csr(empty, tile_m, tile_n, dtype, 8,
                                  rows_per_program=auto_rp)
                for w in wms
            ],
            dtype,
        )
    return WindowedBsr(
        inner=inner,
        prog_win=prog_win,
        residual=residual,
        window_tiles=window_tiles,
        n_windows=n_windows,
    )


def preferred_format_blocks(
    blocks: list[sparse.csr_matrix], k: int, **kw
) -> str:
    """Aggregate format choice for a set of same-role blocks (they must share
    one static format under shard_map)."""
    agg = sparse.vstack([b.tocsr() for b in blocks]).tocsr()
    return preferred_format(agg, k, **kw)


def split_by_tile_density(
    A: sparse.csr_matrix,
    tile_m: int = 128,
    tile_n: int = 128,
    min_nnz_per_tile: int = 32,
) -> tuple[sparse.csr_matrix, sparse.csr_matrix]:
    """Split A = A_dense + A_sparse by tile occupancy: tiles holding at least
    ``min_nnz_per_tile`` nonzeros go to the BSR/MXU part, the scattered rest
    to the gather-ELL part. The hybrid covers matrices with mixed structure
    (dense-ish arrow head panels + scattered band)."""
    A = A.tocsr()
    coo = A.tocoo()
    if coo.nnz == 0:
        return A, A.copy()
    n_col_tiles = max(1, -(-A.shape[1] // tile_n))
    tid = (coo.row // tile_m).astype(np.int64) * n_col_tiles + coo.col // tile_n
    counts = np.bincount(tid)
    dense_mask = counts[tid] >= min_nnz_per_tile
    def pick(mask):
        M = sparse.csr_matrix(
            (coo.data[mask], (coo.row[mask], coo.col[mask])), shape=A.shape
        )
        M.sum_duplicates()
        return M
    return pick(dense_mask), pick(~dense_mask)


def tile_density_stats(A: sparse.csr_matrix, tile_m: int = 128, tile_n: int = 128):
    """(occupied_tiles, nnz, avg nnz per occupied tile) — inputs to the
    format cost model."""
    coo = A.tocoo()
    if coo.nnz == 0:
        return 0, 0, 0.0
    n_col_tiles = max(1, -(-A.shape[1] // tile_n))
    tid = (coo.row // tile_m) * n_col_tiles + (coo.col // tile_n)
    occ = np.unique(tid).size
    return occ, int(coo.nnz), coo.nnz / occ


#: Calibrated v5e cost constants for the BSR execution modes (round-3
#: hardware runs, tools/bench_bsr_stream.py + tools/bench_bsr_tb.py).
#: Resident kernel: the round-3 TB sweep regression gives ~111 ns per
#: (128,128) f32 tile (the round-1 82-85 ns figure was flattered by relay
#: noise on a short kernel).
BSR_NS_PER_TILE = 111.0

#: Gather-ELL cost-model constants shared by every format gate (here, next
#: to the BSR tile constants, so a recalibration updates ALL selectors at
#: once — ops.dispatch and parallel.local import these rather than inlining
#: the numbers).
ELL_NS_PER_SLOT = 2.2
#: Big-source regime (rows above ell.FOLD_SOURCE_ROWS): the gather engine
#: falls off the plateau and the merged plan switches to folded-source
#: gathers — measured end-to-end 6.3 ns/nnz on BA-1M (158.7 M nnz/s,
#: round 2). Selectors must price big merged operators with THIS rate, not
#: the plateau rate, or they pick gather-ELL where the windowed kernel is
#: 3-6x faster (observed on the 1.09M-row roadNet surrogate: modeled 8.5 ms
#: ELL, measured 52 ms).
ELL_NS_PER_SLOT_BIG = 6.0
ELL_SLOT_PAD_FACTOR = 1.25

#: Measured slot-rate RAMP vs source rows (round-5, tools/probe_ell_rate.py,
#: natural-order grids, fori-differenced): the physical source footprint is
#: 512 B/row lane-padded, so a 202.5k-row source is already 104 MB —
#: off-cache well below the 262k folding cliff. Anchors (rows, ns/slot):
#: 40k 2.03, 90k 2.39, 202.5k 2.62, 302.5k 3.92 (490k measured 3.65,
#: within relay noise of 302k — held flat), 1M+ ~6.0 (the roadNet-surrogate
#: end-to-end rate, round 3). Selectors that price a gather-ELL alternative
#: must use :func:`ell_slot_ns` with the REAL slot count
#: (``formats.ell_cost_rows`` — R rounds up to the einsum minimum of 8, so
#: low-degree rows carry 2x the nnz in slots and a flat nnz*1.25 underprices
#: the grid family ~1.6x; that mispricing is exactly what made the windowed
#: auto-gate rate near-cliff ELL "a wash" where it measures 1.8x slower).
ELL_SLOT_NS_ANCHORS = (
    (40_000, 2.0),
    (90_000, 2.4),
    (202_500, 2.63),
    (302_500, 3.9),
    (490_000, 3.9),
    (1_048_576, 6.0),
)


def ell_slot_ns(n_rows: int) -> float:
    """Gather-ELL ns/slot for a source of ``n_rows`` rows: log-linear
    interpolation between the measured anchors (clamped at the ends)."""
    import math

    pts = ELL_SLOT_NS_ANCHORS
    if n_rows <= pts[0][0]:
        return pts[0][1]
    if n_rows >= pts[-1][0]:
        return pts[-1][1]
    for (r0, v0), (r1, v1) in zip(pts, pts[1:]):
        if n_rows <= r1:
            t = (math.log(n_rows) - math.log(r0)) / (
                math.log(r1) - math.log(r0))
            return v0 + t * (v1 - v0)
    return pts[-1][1]
#: Pre-calibration estimate of the streaming kernel relative to the
#: windowed kernel (stream re-fetches X per tile; windowed fetches each
#: window ~once on banded operators).
BSR_STREAM_FALLBACK_FACTOR = 4.0
#: Measured round 3 (v5e, ER 8192^2 phase-a): 317 ns/tile at TB=8/RP=1
#: (2.19x the resident kernel — the per-tile X slice DMA is not fully
#: hidden behind the dots).
BSR_STREAM_NS_PER_TILE: float | None = 320.0
#: ns/tile of the windowed kernel's in-window tiles (X window amortized),
#: measured round 3 on the zero-copy step at the auto program shape
#: (TB=16, RP=4): grid-1M 5.47 ms / 31.3k tiles = 175 ns/tile, grid-202k
#: 1.58 ms all-in / 6.7k = 230 (includes window DMA, output writes, and
#: the grid-step overhead the shape chooser already minimizes). 200 is the
#: mid-range; it also tie-breaks near-equal windowed-vs-stream calls
#: toward windowed (single launch, each X window fetched ~once vs per-tile
#: re-fetch — observed decisive on the 1.09M-row roadNet surrogate).
BSR_WINDOW_NS_PER_TILE: float | None = 200.0


#: SMEM budget for the BSR kernels' scalar-prefetch operands (tiles_col,
#: tiles_lrow, prog_rows, prog_win — int32 each). The chip exposes 1 MB;
#: keep margin for Mosaic's own scalars. Measured failure mode: the rmat-4M
#: hybrid dense-peel built ~660k tiles -> 2.65 MB prefetched SMEM operand
#: -> compile error ("Allocation would exceed memory (size=1048576)").
BSR_SMEM_PREFETCH_BUDGET = 768 * 1024


def bsr_smem_ok(n_tiles: int, tiles_per_program: int = 8) -> bool:
    """Whether a BSR-family kernel with this many tiles fits the SMEM
    scalar-prefetch budget (2 per-tile + 2 per-program int32 arrays)."""
    progs = -(-max(1, n_tiles) // max(1, tiles_per_program))
    return 4 * (2 * n_tiles + 2 * progs) <= BSR_SMEM_PREFETCH_BUDGET


def preferred_format(
    A: sparse.csr_matrix,
    k: int,
    tile_m: int = 128,
    tile_n: int = 128,
    bsr_ns_per_tile: float = BSR_NS_PER_TILE,
    ell_ns_per_slot: float = ELL_NS_PER_SLOT,
    slot_pad_factor: float = ELL_SLOT_PAD_FACTOR,
    x_vmem_budget_bytes: int = 8 << 20,
    bsr_stream_ns_per_tile: float | None = None,
) -> str:
    """Time-based cost model choosing 'ell' or 'bsr' per matrix, calibrated
    on v5e: the BSR Pallas kernel streams one (128,128) f32 tile in ~82ns at
    HBM bandwidth (measured up to 33 Gnnz/s on dense-ish blocks), while the
    gather-ELL path costs ~1.4-3 ns per slot on the gather engine. Breakeven
    sits near ~30 nonzeros per occupied tile.

    When the dense operand overflows the VMEM residency budget, BSR runs
    k-TILED (``ops.dispatch.bsr_apply``): the A tiles re-stream once per
    feature tile, so the BSR cost multiplies by the tile count — BSR is
    still chosen when it wins despite the re-streams (the memory-capacity
    analogue of the reference's GPU tiling, spmm_petsc.py:323-395)."""
    from arrow_matrix_tpu.ops.tiling import plan_feature_tiles, vmem_resident_bytes

    if bsr_stream_ns_per_tile is None:
        bsr_stream_ns_per_tile = BSR_STREAM_NS_PER_TILE

    occ, nnz, _ = tile_density_stats(A, tile_m, tile_n)
    if nnz == 0:
        return "ell"
    if not bsr_smem_ok(occ):
        return "ell"  # scalar-prefetch arrays would overflow SMEM
    n_col_pad = max(1, -(-A.shape[1] // tile_n)) * tile_n
    tile_scale = (tile_m * tile_n) / (128 * 128)
    stream_ns = (
        occ * bsr_stream_ns_per_tile * tile_scale
        if bsr_stream_ns_per_tile is not None
        else None
    )
    # Feasibility is set by PHYSICAL (lane-padded) bytes: a narrow-k operand
    # still occupies rows x 128 lanes, so k-tiling only helps above 128
    # columns (measured: f32 (200064, 8) -> ~99MB scoped VMEM).
    k_t = plan_feature_tiles(
        n_col_pad, k, needs_vmem_residency=True, vmem_budget=x_vmem_budget_bytes
    )
    if vmem_resident_bytes(n_col_pad, min(k, k_t)) > x_vmem_budget_bytes:
        # Resident kernel infeasible at any feature tile: only the
        # streaming kernel can run BSR here.
        if stream_ns is None:
            return "ell"
        bsr_ns = stream_ns
    else:
        n_k_tiles = -(-k // k_t)
        bsr_ns = occ * bsr_ns_per_tile * tile_scale * n_k_tiles
        if stream_ns is not None:
            bsr_ns = min(bsr_ns, stream_ns)
    ell_ns = nnz * slot_pad_factor * ell_ns_per_slot
    return "bsr" if bsr_ns < ell_ns else "ell"
