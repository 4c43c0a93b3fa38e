"""Speed-of-light accounting for the compiled single-chip executors.

Computes the HBM bytes one iterated step MUST move — state streams, sparse
payloads, index tables, output writebacks — straight from a compiled
:class:`~arrow_matrix_tpu.parallel.local.LocalArrowPlan`, and prices a
modeled step time from the same calibrated constants the format gates use.
Two consumers:

* the BASELINE.md roofline table (achieved GB/s = bytes / measured step
  vs the v5e HBM peak) — the accounting the reference never needed because
  its kernel was a vendor call (reference: arrow/common/sp2cp.py:6-16);
* :mod:`arrow_matrix_tpu.plan.tune` — ranking candidate plan compilations
  without touching hardware.

All byte counts are PHYSICAL (the (8,128) tiled layout lane-pads the minor
dimension, so a (N, k<=128) f32 row costs 512 B regardless of k — see
NOTES.md "Unifying bandwidth model").
"""

from __future__ import annotations

import numpy as np

#: v5e HBM peak (GB/s) — the roofline ceiling for every HBM-streaming
#: executor on this chip.
V5E_HBM_GBPS = 819.0

#: Fixed per-program grid-step cost of the Pallas BSR-family kernels
#: (measured round 3, tools/bench_bsr_tb.py regression: ~312 ns).
BSR_NS_PER_PROGRAM = 312.0

LANES = 128


def _state_row_bytes(itemsize: int) -> int:
    # One feature row: 128 lanes x itemsize, any k <= 128.
    return LANES * itemsize


def _tile_count(m) -> int:
    if m is None:
        return 0
    td = np.asarray(m.tiles_data)
    return int(td.shape[0] * td.shape[1]) if td.ndim == 4 else int(td.shape[0])


def _tile_bytes(m) -> int:
    if m is None:
        return 0
    td = np.asarray(m.tiles_data)
    return int(td.size) * td.dtype.itemsize


def _prog_count(m) -> int:
    if m is None:
        return 0
    return int(np.asarray(m.prog_rows).shape[0])


def _window_fetches(wm) -> int:
    """Number of X-window HBM fetches per step: the Pallas pipeline
    re-fetches only when consecutive programs change window id."""
    pw = np.asarray(wm.prog_win)
    if pw.size == 0:
        return 0
    return int(1 + (pw[1:] != pw[:-1]).sum())


def _ell_inner(m):
    # CompactEll wraps an EllMat; PackedEll/EllMat expose idx directly.
    return m.inner if hasattr(m, "inner") and hasattr(m.inner, "idx") else m


def _windowed_level_bytes(wm, H: int, state_itemsize: int) -> dict:
    k_rows = wm.window_tiles * wm.inner.tile_n  # window rows of X
    window_read = _window_fetches(wm) * k_rows * _state_row_bytes(
        state_itemsize)
    tiles = _tile_bytes(wm.inner)
    out_write = H * _state_row_bytes(state_itemsize)
    resid = 0
    if wm.residual is not None:
        # Stream kernel: per-tile X slice re-fetch + payload + the aliased
        # accumulate's read+write of the residual programs' output blocks.
        r = wm.residual
        resid_rows = _prog_count(r) * r.rows_per_program * r.tile_m
        resid = (
            _tile_bytes(r)
            + _tile_count(r) * r.tile_n * _state_row_bytes(state_itemsize)
            + 2 * resid_rows * _state_row_bytes(state_itemsize)
        )
    return {
        "window_reads": int(window_read),
        "tile_payloads": int(tiles),
        "output_writes": int(out_write),
        "residual": int(resid),
        "total": int(window_read + tiles + out_write + resid),
    }


def _ell_level_bytes(m, H: int, state_itemsize: int) -> dict:
    inner = _ell_inner(m)
    idx = np.asarray(inner.idx)
    slots = int(idx.size)
    # Each gathered slot fetches one PHYSICAL feature row (lane-padded).
    gathers = slots * _state_row_bytes(state_itemsize)
    tables = slots * 4 + int(np.asarray(inner.val).size) * np.asarray(
        inner.val).dtype.itemsize
    out_write = H * _state_row_bytes(state_itemsize)
    return {
        "slot_gathers": int(gathers),
        "tables": int(tables),
        "output_writes": int(out_write),
        "total": int(gathers + tables + out_write),
    }


def _bsr_level_bytes(m, H: int, state_itemsize: int) -> dict:
    # Resident kernel: X read once into VMEM + tile payloads + writes.
    x_read = m.n_col_tiles * m.tile_n * _state_row_bytes(state_itemsize)
    tiles = _tile_bytes(m)
    out_write = H * _state_row_bytes(state_itemsize)
    return {
        "x_reads": int(x_read),
        "tile_payloads": int(tiles),
        "output_writes": int(out_write),
        "total": int(x_read + tiles + out_write),
    }


def step_bytes(plan, k: int, state_dtype="float32") -> dict:
    """HBM bytes per iterated step of a merged/level
    :class:`LocalArrowPlan`, by component. ``k`` is accepted for interface
    symmetry; physical row bytes are k-independent at k <= 128."""
    del k
    # Any bf16 spelling (string, jnp.bfloat16, np.dtype) -> 2 bytes;
    # everything else is the f32 default.
    itemsize = 2 if "bfloat16" in str(state_dtype) else 4
    H = plan.padded_rows
    levels = []
    total = 0
    for lvl in plan.levels:
        if lvl.fmt == "window":
            b = _windowed_level_bytes(lvl.mat, H, itemsize)
        elif lvl.fmt == "bsr":
            b = _bsr_level_bytes(lvl.mat, H, itemsize)
        elif lvl.fmt == "hybrid":
            b1 = _bsr_level_bytes(lvl.mat, H, itemsize)
            b2 = _ell_level_bytes(lvl.mat_sparse, H, itemsize)
            b = {"bsr": b1, "ell": b2, "total": b1["total"] + b2["total"]}
        else:
            b = _ell_level_bytes(lvl.mat, H, itemsize)
        if lvl.dst_to_src is not None:
            # Level routing: one assembly gather each way over cut rows.
            b = dict(b)
            b["routing"] = 2 * lvl.cut * _state_row_bytes(itemsize)
            b["total"] += b["routing"]
        levels.append({"fmt": lvl.fmt, **b})
        total += b["total"]
    return {"levels": levels, "total": int(total)}


def model_step_ns(plan, k: int, state_dtype="float32") -> float:
    """Modeled step time: the max of the HBM-byte bound and the calibrated
    per-op bound (slots/tiles/programs at the measured rates) — the scorer
    :mod:`plan.tune` ranks candidate compilations with."""
    import arrow_matrix_tpu.ops.bsr_pallas as _bp
    from arrow_matrix_tpu.ops.bsr_pallas import ell_slot_ns

    byte_ns = step_bytes(plan, k, state_dtype)["total"] / V5E_HBM_GBPS
    op_ns = 0.0
    for lvl in plan.levels:
        if lvl.fmt == "window":
            wm = lvl.mat
            op_ns += (
                _tile_count(wm.inner) * _bp.BSR_WINDOW_NS_PER_TILE
                + _tile_count(wm.residual)
                * (_bp.BSR_STREAM_NS_PER_TILE or 320.0)
                + (_prog_count(wm.inner) + _prog_count(wm.residual))
                * BSR_NS_PER_PROGRAM
            )
        elif lvl.fmt == "bsr":
            op_ns += (
                _tile_count(lvl.mat) * _bp.BSR_NS_PER_TILE
                + _prog_count(lvl.mat) * BSR_NS_PER_PROGRAM
            )
        else:
            m = lvl.mat
            if lvl.fmt == "hybrid":
                m = lvl.mat_sparse
                op_ns += (
                    _tile_count(lvl.mat) * _bp.BSR_NS_PER_TILE
                    + _prog_count(lvl.mat) * BSR_NS_PER_PROGRAM
                )
            slots = int(np.asarray(_ell_inner(m).idx).size)
            op_ns += slots * ell_slot_ns(plan.padded_rows)
    return max(byte_ns, op_ns)


def roofline_report(plan, k: int, state_dtype="float32",
                    measured_ms: float | None = None) -> dict:
    """Bytes/step breakdown + modeled step; with ``measured_ms``, achieved
    GB/s and the fraction of the v5e HBM peak."""
    b = step_bytes(plan, k, state_dtype)
    rep = {
        "bytes_per_step": b,
        "modeled_step_ms": model_step_ns(plan, k, state_dtype) / 1e6,
        "hbm_peak_gbps": V5E_HBM_GBPS,
    }
    if measured_ms is not None:
        gbps = b["total"] / (measured_ms * 1e6)
        rep["measured_step_ms"] = measured_ms
        rep["achieved_gbps"] = gbps
        rep["fraction_of_peak"] = gbps / V5E_HBM_GBPS
    return rep
