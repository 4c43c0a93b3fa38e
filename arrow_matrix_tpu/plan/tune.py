"""Plan-time (width/q, window size) auto-tuner for the single-chip
executor (VERDICT r4 item 4).

Given the problem — matrix, feature count, intended state dtype — search
candidate arrow widths, compile each, and rank the compiled plans with the
calibrated roofline model (:func:`plan.roofline.model_step_ns`). The state
dtype also sets the X-window size (bf16 -> 512 tiles) inside
:func:`compile_single_chip`.

Measured context (round 5, recorded in NOTES.md): for MERGED single-chip
plans the width search is usually a no-op — ``merge_levels_to_matrix`` +
RCM refinement normalize the layout, and grid-202k compiles to the
IDENTICAL windowed plan for every width in q=7..10 (the round-4
"q=8 vs q=9 mistune" was the since-eliminated carry copy plus
probe-vs-plan offsets, not plan structure). The tuner therefore
early-stops as soon as two candidates produce the same plan signature;
its value is (a) the dtype-aware window size, (b) catching the cases the
normalization does NOT cover (level-count changes at small widths,
region/ELL fallbacks), and (c) replacing hand-set widths in the bench
basket with a compiler choice. The reference exposes width as a raw user
knob instead (reference: scripts/decomposition_main.py:123).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np


def plan_signature(plan) -> tuple:
    """Structural identity of a compiled plan: executor, heights, and
    per-level op counts — equal signatures mean equal device programs."""
    from arrow_matrix_tpu.parallel.region import RegionPlan
    from arrow_matrix_tpu.plan.roofline import (
        _ell_inner,
        _prog_count,
        _tile_count,
    )

    if isinstance(plan, RegionPlan):
        return ("region", plan.padded_rows, len(plan.stripes))
    sig = ["local", plan.padded_rows]
    for lvl in plan.levels:
        if lvl.fmt == "window":
            wm = lvl.mat
            sig.append((
                "window", lvl.cut, wm.window_tiles,
                _tile_count(wm.inner), _tile_count(wm.residual),
                _prog_count(wm.inner), _prog_count(wm.residual),
            ))
        elif lvl.fmt in ("bsr", "hybrid"):
            sig.append((lvl.fmt, lvl.cut, _tile_count(lvl.mat)))
        else:
            sig.append((
                "ell", lvl.cut,
                int(np.asarray(_ell_inner(lvl.mat).idx).size),
            ))
    return tuple(sig)


def candidate_widths(n: int, base_width: Optional[int] = None,
                     spread: int = 1) -> list[int]:
    """Widths to try: ``ceil(n/q)`` for q around the base block count
    (from ``base_width`` when given, else the ~25k-row default block)."""
    if base_width:
        q0 = max(1, -(-n // base_width))
    else:
        q0 = max(1, round(n / 25_000))
    qs = sorted({max(1, q0 + d) for d in range(-spread, spread + 1)})
    return sorted({-(-n // q) for q in qs}, reverse=True)


@dataclass
class TuneResult:
    width: int
    plan: Any
    step_fn: Callable
    decomposition: Any
    model_ms: float
    #: per-candidate {width, model_ms, signature, chosen} rows
    report: list = field(default_factory=list)
    #: True when the merged-plan normalization made candidates identical
    normalized: bool = False


def tune_single_chip(
    A,
    k: int = 16,
    state_dtype=None,
    widths: Optional[list[int]] = None,
    base_width: Optional[int] = None,
    seed: int = 2,
    max_levels: int = 100,
    early_stop: bool = True,
    refine: str = "auto",
) -> TuneResult:
    """Decompose/compile candidate widths and return the model-best plan.

    ``early_stop``: stop the search once two consecutive candidates compile
    to the same :func:`plan_signature` (the merged-plan normalization —
    further widths would only repeat it)."""
    from arrow_matrix_tpu.decomposition import arrow_decomposition
    from arrow_matrix_tpu.parallel.local import compile_single_chip
    from arrow_matrix_tpu.plan.roofline import model_step_ns

    n = A.shape[0]
    cands = widths or candidate_widths(n, base_width)
    rows = []
    best = None
    prev_sig = None
    normalized = False
    sd = "bfloat16" if (
        state_dtype is not None and "bfloat16" in str(state_dtype)
    ) else "float32"
    for width in cands:
        decomp = arrow_decomposition(
            A, width, max_number_of_levels=max_levels,
            block_diagonal=True, seed=seed,
        )
        plan, step_fn = compile_single_chip(
            decomp, width, k_hint=k, state_dtype=state_dtype, refine=refine,
        )
        sig = plan_signature(plan)
        try:
            ms = model_step_ns(plan, k, sd) / 1e6
        except AttributeError:
            # Region plans have no roofline model yet; rank them after any
            # modeled candidate (they only win where no windowed/merged
            # candidate compiles).
            ms = float("inf")
        rows.append({"width": width, "model_ms": ms, "signature": sig})
        if best is None or ms < best.model_ms:
            best = TuneResult(
                width=width, plan=plan, step_fn=step_fn,
                decomposition=decomp, model_ms=ms,
            )
        if early_stop and sig == prev_sig:
            normalized = True
            break
        prev_sig = sig
    for r in rows:
        r["chosen"] = r["width"] == best.width
    best.report = rows
    best.normalized = normalized
    return best
