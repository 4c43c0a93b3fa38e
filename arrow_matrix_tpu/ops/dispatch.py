"""Shared sparse-block dispatch for all runners.

Strips device-stacked leading axes and applies the right kernel — gather-ELL,
row-compressed CompactEll, or the Pallas BSR kernel with AUTOMATIC feature
(k) tiling when the dense operand would overflow the VMEM residency budget
(the memory-capacity analogue of the reference's GPU tiling,
reference: arrow/baseline/spmm_petsc.py:323-395, spmm_15d.py:371-449).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from scipy import sparse

from arrow_matrix_tpu.ops.bsr_pallas import (
    BsrMat,
    WindowedBsr,
    bsr_from_csr,
    bsr_spmm,
    bsr_spmm_stream,
    bsr_spmm_window,
    preferred_format,
)
from arrow_matrix_tpu.ops.ell import compact_ell_spmm, ell_spmm, packed_ell_spmm
from arrow_matrix_tpu.ops.formats import (
    CompactEll,
    PackedEll,
    SumMat,
    compact_ell_from_csr,
    ell_cost_rows,
    ell_from_csr,
    packed_cost_rows,
    packed_ell_from_csr,
    split_by_row_weight,
)
from arrow_matrix_tpu.ops.tiling import (
    DEFAULT_VMEM_BUDGET,
    plan_feature_tiles,
    tiled_apply,
)


def _ell_or_compact(b: sparse.csr_matrix):
    full, compact = ell_cost_rows(b)
    if compact < full:
        return compact_ell_from_csr(b)
    return ell_from_csr(b)


#: Minimum in-window tile fraction for the windowed kernel to be considered.
#: Below ~half the tiles in-window the residual stream matrix dominates and
#: plain streaming is usually as good; the time model (which prices the
#: residual at the stream rate) makes the final call, so this is only a
#: cheap structural pre-filter. Lowered from 0.8 in round 3: the roadNet
#: surrogate (planar, frac 0.72) was hard-rejected despite the windowed
#: plan being ~3.5x faster than the chosen gather-ELL.
WINDOW_FRACTION_MIN = 0.45


def _windowed_gate(agg: sparse.csr_matrix, k_hint: int, build):
    """Shared calibration/structure/time gate for the windowed-BSR kernels.

    Fires only when the windowed kernel is calibrated, the dense operand is
    beyond the VMEM residency bound (otherwise the resident kernel competes
    through :func:`preferred_format`), the structure is banded enough, and
    the time model beats BOTH alternatives in that regime — the gather floor
    and the per-tile streaming kernel. The final decision re-checks on the
    BUILT matrix's actual in-window/residual split (the builder's nnz-median
    window choice can differ from the probe's estimate). Returns the built
    windowed matrix or None."""
    import arrow_matrix_tpu.ops.bsr_pallas as _bp
    import arrow_matrix_tpu.ops.tiling as _tiling
    from arrow_matrix_tpu.ops.bsr_pallas import (
        BSR_STREAM_FALLBACK_FACTOR,
        ell_slot_ns,
        tile_density_stats,
        windowed_tile_fraction,
    )
    from arrow_matrix_tpu.ops.tiling import vmem_resident_bytes

    if _bp.BSR_WINDOW_NS_PER_TILE is None:
        return None
    if (
        vmem_resident_bytes(agg.shape[1], min(k_hint, 128))
        <= _tiling.DEFAULT_VMEM_BUDGET
    ):
        return None  # the resident kernel is available; let the model pick
    if windowed_tile_fraction(agg) < WINDOW_FRACTION_MIN:
        return None
    occ, nnz, _ = tile_density_stats(agg)
    if not _bp.bsr_smem_ok(occ):
        return None  # scalar-prefetch arrays would overflow SMEM
    # Price the ELL alternative by its REAL slot count (``ell_cost_rows`` —
    # R rounds up to the einsum minimum of 8, so low-degree rows carry ~2x
    # their nnz in slots) at the measured source-size-dependent rate (the
    # physical source is 512 B/row lane-padded: near-cliff sources are
    # off-cache well below the 262k folding boundary). The previous flat
    # nnz*1.25*plateau pricing made grid-202k ELL look a wash where it
    # measures 1.8x slower than windowed (round-5 recalibration,
    # tools/probe_ell_rate.py). The gather SOURCE is the X operand —
    # agg.shape[1] rows (for the stacked-role aggregate shape[0] is q x
    # the per-device height, which would overprice the per-device gather).
    ell_ns = min(ell_cost_rows(agg)) * ell_slot_ns(agg.shape[1])
    # Residual tiles always run on the streaming kernel inside
    # bsr_spmm_window; estimate its rate pre-calibration. As a selectable
    # ALTERNATIVE the stream kernel only competes once calibrated.
    stream_tile_ns = (
        _bp.BSR_STREAM_NS_PER_TILE
        if _bp.BSR_STREAM_NS_PER_TILE is not None
        else BSR_STREAM_FALLBACK_FACTOR * _bp.BSR_WINDOW_NS_PER_TILE
    )
    alt_ns = ell_ns
    if _bp.BSR_STREAM_NS_PER_TILE is not None:
        alt_ns = min(alt_ns, occ * _bp.BSR_STREAM_NS_PER_TILE)
    if occ * _bp.BSR_WINDOW_NS_PER_TILE >= alt_ns:
        return None
    wm = build()

    def built_tiles(m):
        # Stacked mats carry (q, T, tm, tn) payloads; padding tiles execute
        # on every device, so the total is q * T (vs the aggregate alt_ns).
        if m is None:
            return 0
        td = m.tiles_data
        return int(td.shape[0] * td.shape[1]) if td.ndim == 4 else int(td.shape[0])

    if not (
        _bp.bsr_smem_ok(built_tiles(wm.inner), wm.inner.tiles_per_program)
        and (
            wm.residual is None
            or _bp.bsr_smem_ok(
                built_tiles(wm.residual), wm.residual.tiles_per_program
            )
        )
    ):
        return None
    win_ns = (
        built_tiles(wm.inner) * _bp.BSR_WINDOW_NS_PER_TILE
        + built_tiles(wm.residual) * stream_tile_ns
    )
    if win_ns < alt_ns:
        return wm
    return None


def maybe_windowed(b: sparse.csr_matrix, k_hint: int, dtype=None,
                   window_tiles=None):
    """Calibration-gated windowed-BSR choice for a banded matrix beyond the
    VMEM residency bound (see :func:`_windowed_gate`). Callers check this
    BEFORE dispatching on :func:`preferred_format`'s ell/bsr verdict.
    ``window_tiles`` overrides the auto X-window size (512 measured +3.8%
    under a bf16 state at grid-1M; the auto 256 is the f32-regime best)."""
    import numpy as np

    from arrow_matrix_tpu.ops.bsr_pallas import windowed_bsr_from_csr

    return _windowed_gate(
        b, k_hint,
        lambda: windowed_bsr_from_csr(
            b, dtype=dtype or np.float32, window_tiles=window_tiles
        ),
    )


def stacked_windowed_or_none(blocks, k_hint: int, dtype=None):
    """Calibration-gated stacked :class:`WindowedBsr` choice for a ROLE's
    per-device blocks (identical static programs under shard_map): the
    per-block analogue of :func:`maybe_windowed`, gated on the row-stacked
    aggregate (each block's rows are separate tile rows, so bandedness and
    the window fraction are preserved). Fires only beyond the VMEM residency
    bound — production block widths (reference decompose default 5M,
    scripts/decomposition_main.py:123) on banded families."""
    import numpy as np

    from arrow_matrix_tpu.ops.bsr_pallas import stack_windowed_from_csr

    agg = sparse.vstack([b.tocsr() for b in blocks]).tocsr()
    return _windowed_gate(
        agg,
        k_hint,
        lambda: stack_windowed_from_csr(blocks, dtype=dtype or np.float32),
    )


def build_block_format(
    b: sparse.csr_matrix, k_hint: int, packed_slots_cap: int | None = None
):
    """Per-block format choice: None (empty), BSR (dense-ish tiles),
    windowed BSR (banded beyond residency, once calibrated), or the
    cheapest gather layout by estimated gathered rows — full-identity ELL,
    row-compressed :class:`CompactEll`, or chunk-packed :class:`PackedEll`
    for the light rows (optionally summed with a compact part for the heavy
    rows).

    :param packed_slots_cap: skip the chunk-packed layout when its prefix-sum
        buffer would exceed this many rows — the PackedEll boundary gathers
        read that buffer, and sources beyond the gather-engine cliff
        (~256k rows lane-padded) drop to ~0.4x the plateau rate.
    """
    if b.nnz == 0:
        return None
    wm = maybe_windowed(b, k_hint)
    if wm is not None:
        return wm
    if preferred_format(b, k_hint) == "bsr":
        return bsr_from_csr(b)
    full, compact = ell_cost_rows(b)
    best = min(full, compact)
    light, heavy = split_by_row_weight(b, 8)
    if light.nnz:
        hybrid = packed_cost_rows(light)
        packed_slots = hybrid - 2 * light.shape[0]
        if packed_slots_cap is not None and packed_slots > packed_slots_cap:
            hybrid = None
        if heavy.nnz and hybrid is not None:
            hf, hc = ell_cost_rows(heavy)
            hybrid += min(hf, hc)
        if hybrid is not None and hybrid < best:
            parts = [packed_ell_from_csr(light)]
            if heavy.nnz:
                parts.append(_ell_or_compact(heavy))
            if len(parts) == 1:
                return parts[0]
            return SumMat(
                parts=tuple(parts), n_rows=b.shape[0], n_cols=b.shape[1]
            )
    return _ell_or_compact(b)


def format_nnz(m) -> int:
    """Stored nonzeros of any block format (stacked or not): the structural
    count every bench normalizes by."""
    import numpy as np

    if m is None:
        return 0
    if isinstance(m, WindowedBsr):
        return format_nnz(m.inner) + format_nnz(m.residual)
    if isinstance(m, SumMat):
        return sum(format_nnz(p) for p in m.parts)
    if isinstance(m, BsrMat):
        return int((np.asarray(m.tiles_data) != 0).sum())
    if isinstance(m, CompactEll):
        return format_nnz(m.inner)
    return int((np.asarray(m.val) != 0).sum())


def local_slice(m):
    """Strip the per-device leading axis of size 1 inside shard_map."""
    if isinstance(m, WindowedBsr):
        return m.replace(
            inner=local_slice(m.inner),
            prog_win=m.prog_win[0],
            residual=local_slice(m.residual) if m.residual is not None else None,
        )
    if isinstance(m, BsrMat):
        return m.replace(
            tiles_data=m.tiles_data[0],
            tiles_col=m.tiles_col[0],
            prog_rows=m.prog_rows[0],
            row_occupied=m.row_occupied[0],
            tiles_lrow=(
                m.tiles_lrow[0] if m.tiles_lrow is not None else None
            ),
        )
    if isinstance(m, CompactEll):
        return m.replace(inner=local_slice(m.inner), row_map=m.row_map[0])
    return m.replace(
        idx=m.idx[0],
        val=m.val[0],
        combine=tuple(t[0] for t in m.combine),
    )


def take_block(m, j: int):
    """Block j's slice of a (q, ...)-stacked matrix."""
    if isinstance(m, WindowedBsr):
        return m.replace(
            inner=take_block(m.inner, j),
            prog_win=m.prog_win[j],
            residual=take_block(m.residual, j) if m.residual is not None else None,
        )
    if isinstance(m, BsrMat):
        return m.replace(
            tiles_data=m.tiles_data[j],
            tiles_col=m.tiles_col[j],
            prog_rows=m.prog_rows[j],
            row_occupied=m.row_occupied[j],
            tiles_lrow=(
                m.tiles_lrow[j] if m.tiles_lrow is not None else None
            ),
        )
    if isinstance(m, CompactEll):
        return m.replace(inner=take_block(m.inner, j), row_map=m.row_map[j])
    return m.replace(
        idx=m.idx[j],
        val=m.val[j],
        combine=tuple(t[j] for t in m.combine),
    )


def bsr_apply(
    m: BsrMat,
    x: jnp.ndarray,
    n_rows_out: int,
    vmem_budget: int = DEFAULT_VMEM_BUDGET,
    stream: bool | None = None,
) -> jnp.ndarray:
    """BSR SpMM with row padding of the operand, choosing the execution
    mode: the X-resident kernel with automatic k-tiling (the A tiles
    re-stream once per k-tile), or the streaming-X kernel when residency is
    infeasible / re-streams make it cheaper. ``stream=None`` decides by the
    same calibrated constants ``preferred_format`` uses; pass True/False to
    force."""
    from arrow_matrix_tpu.ops.tiling import vmem_resident_bytes

    n_pad = m.n_col_tiles * m.tile_n
    k = x.shape[1]
    k_t = plan_feature_tiles(
        n_pad, k, needs_vmem_residency=True, vmem_budget=vmem_budget
    )
    if stream is None:
        # Read the calibration constants LIVE off the module (the same
        # late-bound convention preferred_format/maybe_windowed use), so
        # runtime calibration keeps format choice and execution mode in sync.
        import arrow_matrix_tpu.ops.bsr_pallas as _bp

        infeasible = vmem_resident_bytes(n_pad, min(k, k_t)) > vmem_budget
        if _bp.BSR_STREAM_NS_PER_TILE is None:
            stream = False
        elif infeasible:
            stream = True
        else:
            n_k_tiles = -(-k // k_t)
            stream = _bp.BSR_STREAM_NS_PER_TILE < _bp.BSR_NS_PER_TILE * n_k_tiles

    def pad_rows(xt: jnp.ndarray) -> jnp.ndarray:
        pad = n_pad - xt.shape[0]
        if pad > 0:
            xt = jnp.concatenate(
                [xt, jnp.zeros((pad, xt.shape[1]), xt.dtype)], axis=0
            )
        return xt

    if stream:
        return bsr_spmm_stream(m, pad_rows(x))[:n_rows_out].astype(x.dtype)

    def one(xt: jnp.ndarray) -> jnp.ndarray:
        return bsr_spmm(m, pad_rows(xt))[:n_rows_out]

    return tiled_apply(one, x, k_t).astype(x.dtype)


def windowed_apply(
    m: WindowedBsr, x: jnp.ndarray, n_rows_out: int
) -> jnp.ndarray:
    """Windowed-BSR SpMM with row padding of the operand (no VMEM residency
    bound; X windows stream from HBM, fetched ~once each on banded
    structure). Features beyond 128 columns run in lane-width k-tiles so the
    double-buffered window blocks stay within VMEM.

    The operand is padded ONCE to the window-padded height (covering both
    the column-tile and whole-window bounds) so bsr_spmm_window adds no
    second pad copy."""
    from arrow_matrix_tpu.ops.bsr_pallas import window_padded_rows

    n_pad = window_padded_rows(m)
    pad = n_pad - x.shape[0]
    if pad > 0:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    dtype = x.dtype

    def one(xt: jnp.ndarray) -> jnp.ndarray:
        return bsr_spmm_window(m, xt)[:n_rows_out]

    from arrow_matrix_tpu.ops.tiling import LANES

    return tiled_apply(one, x, min(x.shape[1], LANES)).astype(dtype)


def apply_mat(m, x: jnp.ndarray, n_rows_out: int) -> Optional[jnp.ndarray]:
    """Apply one (unstacked) block matrix to (n_cols, k) features; None
    blocks contribute nothing."""
    if m is None:
        return None
    if isinstance(m, WindowedBsr):
        return windowed_apply(m, x, n_rows_out)
    if isinstance(m, SumMat):
        out = None
        for part in m.parts:
            y = apply_mat(part, x, n_rows_out)
            out = y if out is None else out + y
        return out
    if isinstance(m, BsrMat):
        return bsr_apply(m, x, n_rows_out)
    if isinstance(m, CompactEll):
        return compact_ell_spmm(m, x)
    if isinstance(m, PackedEll):
        return packed_ell_spmm(m, x)
    return ell_spmm(m, x)
