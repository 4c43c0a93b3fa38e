"""Fit the blocked-executor per-part overhead from measured step times
(VERDICT r4 item 6 / weak #3): the slot/tile work alone under-predicts the
blocked (distributed-program-on-one-chip) step, and the gap scales with the
number of per-stripe program instances (q_i x levels x parts). The fitted
per-instance cost feeds tools/mesh_projection.py so multi-chip efficiency
projections degrade honestly instead of assuming slot-count-only scaling.

Measured inputs (fori-differenced, v5e):
  ba-200k blocked 152.1 M nnz/s (BENCH_r04)  -> 10.52 ms at 1.6M nnz
  ba-1m   blocked  77.4 M nnz/s (tools/probe_bf16_blocked.py) -> 103.4 ms

Model: measured = sum(part work at calibrated rates) + routing work
                 + OVH * instances
and OVH is reported per config (the spread is the honest error bar).
"""

import json
import sys

import numpy as np

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert
from arrow_matrix_tpu.ops.bsr_pallas import (
    BSR_NS_PER_TILE,
    BSR_STREAM_NS_PER_TILE,
    BSR_WINDOW_NS_PER_TILE,
    BsrMat,
    WindowedBsr,
    ell_slot_ns,
)
from arrow_matrix_tpu.parallel.blocked import compile_blocked_plan
from arrow_matrix_tpu.plan.roofline import BSR_NS_PER_PROGRAM

MEASURED_MS = {200_000: 10.52, 1_000_000: 103.4}


def _tiles(m):
    data = np.asarray(m.tiles_data)
    return int((np.abs(data).sum(axis=(-2, -1)) > 0).sum())


def part_ns(m, source_rows: int) -> float:
    """Calibrated compute of one stripe part (window-bounded sources run at
    the small-source plateau)."""
    from arrow_matrix_tpu.ops.formats import CompactEll, PackedEll, SumMat

    if m is None:
        return 0.0
    if isinstance(m, WindowedBsr):
        ns = _tiles(m.inner) * (BSR_WINDOW_NS_PER_TILE or 200.0)
        if m.residual is not None:
            ns += _tiles(m.residual) * (BSR_STREAM_NS_PER_TILE or 320.0)
        return ns
    if isinstance(m, BsrMat):
        return (
            _tiles(m) * BSR_NS_PER_TILE
            + _tiles(m) / max(1, m.tiles_per_program) * BSR_NS_PER_PROGRAM
        )
    if isinstance(m, SumMat):
        return sum(part_ns(p, source_rows) for p in m.parts)
    if isinstance(m, (CompactEll, PackedEll)) or hasattr(m, "idx") or hasattr(m, "inner"):
        inner = m.inner if hasattr(m, "inner") and hasattr(m.inner, "idx") else m
        slots = int((np.asarray(inner.val) != 0).sum())
        return slots * ell_slot_ns(source_rows)
    raise TypeError(type(m))


def main():
    out = {}
    for n in ([int(sys.argv[1])] if len(sys.argv) > 1 else [200_000, 1_000_000]):
        A = barabasi_albert(n, 4, seed=1)
        width = 25_000
        decomp = arrow_decomposition(
            A, width, max_number_of_levels=100, block_diagonal=True, seed=2
        )
        plan = compile_blocked_plan(decomp, width, k_hint=16)
        work_ns = 0.0
        instances = 0
        for lvl in plan.levels:
            q_i = len(lvl.parts)
            for stripe_parts, stripe_wins in zip(lvl.parts, lvl.windows):
                for part, wins in zip(stripe_parts, stripe_wins):
                    if part is None:
                        continue
                    instances += 1
                    src_rows = (
                        len([w for w in wins if w is not None]) * plan.width
                        if wins and wins[0] is not None
                        else q_i * plan.width
                    )
                    work_ns += part_ns(part, src_rows)
            # Per-level window materialization + assembly gathers: ~3
            # width-rows of plateau-rate gather per level (same accounting
            # as the mesh projection's routing term; the blocked executor
            # materializes windows on EVERY level, so no route guard).
            work_ns += 3 * plan.width * ell_slot_ns(plan.width)
        measured_ms = MEASURED_MS.get(n)
        row = {
            "n": n,
            "modeled_work_ms": work_ns / 1e6,
            "instances": instances,
            "levels": len(plan.levels),
            "q": plan.n_blocks,
        }
        if measured_ms:
            row["measured_ms"] = measured_ms
            row["overhead_ms"] = measured_ms - work_ns / 1e6
            row["overhead_us_per_instance"] = (
                (measured_ms - work_ns / 1e6) * 1e3 / max(1, instances)
            )
        out[f"ba-{n}"] = row
        print(json.dumps(row), flush=True)
    print(json.dumps({"metric": "stripe_overhead_fit", "configs": out}))


if __name__ == "__main__":
    main()
