"""Per-device HBM footprint accounting for the distributed arrow program.

Why this exists: the reference's FAT layout (2q-1 ranks per matrix with
separate row/column ranks, reference: arrow/arrow_mpi.py:26-93) exists to
halve per-rank memory — row ranks hold only the head panel ``A_0i``, column
ranks hold ``A_ii``/``A_i0`` (+ band blocks). Round 1 folded fat into the
slim layout (one device per block row holding all three panels, reference:
arrow/arrow_slim_mpi.py:298-326) with a qualitative rationale; this module
supplies the quantitative side:

* :func:`arrow_hbm_footprint` — exact per-device HBM bytes of a compiled
  :class:`~arrow_matrix_tpu.plan.compile.ArrowPlan` plus the step's runtime
  state and dominant transients, under the TPU tiled layout;
* :func:`slim_fat_model` — an analytic model parameterized by (width, q, k,
  nnz) that evaluates the production configuration (width = 5,000,000, the
  reference's decomposition default, reference:
  scripts/decomposition_main.py:123) against a device HBM budget and prices
  what the fat split would save.

TPU layout rule (measured, see NOTES.md "VMEM is lane-padded"): arrays are
stored in (8, 128) f32 tiles — the minor dimension pads to a multiple of 128
lanes, the second-minor to a multiple of 8 sublanes. A (N, 16) f32 array
therefore occupies N x 128 x 4 physical bytes (8x its logical size); wide
(k = 128) features carry zero padding. 1-D arrays are modeled as (8, ceil)
tiles (conservative).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import numpy as np

LANE = 128
SUBLANE = 8
HBM_BUDGET_V5E = 16 * 1024**3  # bytes per chip


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def tpu_padded_bytes(shape, itemsize: int = 4) -> int:
    """Physical HBM bytes of an array under the (8, 128) tiled layout.

    The minor dim pads to 128 lanes and the second-minor to 8 sublanes
    (itemsize-4 tile; bf16's (16, 128) tile halves the sublane waste, which
    this conservative model ignores). Scalars and 1-D arrays occupy whole
    tiles.
    """
    shape = tuple(int(s) for s in shape)
    if len(shape) == 0:
        return SUBLANE * LANE * itemsize
    if len(shape) == 1:
        return SUBLANE * _ceil_to(shape[0], LANE) * itemsize
    lanes = _ceil_to(shape[-1], LANE)
    subs = _ceil_to(shape[-2], SUBLANE)
    rest = math.prod(shape[:-2]) if len(shape) > 2 else 1
    return rest * subs * lanes * itemsize


def _tree_device_bytes(tree) -> int:
    """Per-device physical bytes of a device-stacked pytree: every array
    leaf's leading axis is the block/device axis, so one device holds
    ``leaf[0]``."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        arr = np.asarray(leaf)
        total += tpu_padded_bytes(arr.shape[1:], arr.dtype.itemsize)
    return total


def arrow_hbm_footprint(plan, k: int, state_itemsize: int = 4) -> Dict[str, float]:
    """Exact per-device HBM bytes for ``ArrowSpmm.step`` on ``plan``.

    :param state_itemsize: bytes per element of the iteration state — 2 for
        ``ArrowSpmm(state_dtype=jnp.bfloat16)``. The state, the all_gathered
        head replica, the routing exchange stacks and the assembly buffer
        ride the state dtype; the per-block kernel operand/result pair stays
        f32 (kernels upcast and accumulate in f32).

    Categories:

    * ``matrix_bytes`` — the resident sparse-format tensors (head / diag /
      col / band panels across all levels); they are placed once and stay in
      HBM (unlike the reference's per-call host->GPU staging, reference:
      arrow/arrow_mpi.py:246-270);
    * ``route_bytes`` — the static routing index tables;
    * ``state_bytes`` — the iteration state, ``(w_q + width, k)`` rows per
      device, double-counted once for the donated output;
    * ``transient_bytes`` — the largest per-level working set the step
      materializes (the all_gathered head replica, the routing send/recv
      stacks and the assembly concat buffer). Levels run sequentially, so
      XLA reuses this allocation across levels (peak, not sum).
    """
    q, w = plan.n_blocks, plan.width
    w_q = -(-w // q)
    w0 = q * w_q

    matrix = 0
    route = 0
    transient_peak = 0
    for lvl in plan.levels:
        for panel in (lvl.head, lvl.diag, lvl.col, lvl.band_lo, lvl.band_hi):
            if panel is not None:
                matrix += _tree_device_bytes(panel)
        # Always live while any level runs: the level's X replica (w0, k)
        # and this device's block features/result (width, k) x2.
        lvl_transient = tpu_padded_bytes((w0, k), state_itemsize) + 2 * tpu_padded_bytes((w, k))
        if lvl.route is not None:
            route += _tree_device_bytes(lvl.route)
            rt = lvl.route
            mf = int(rt.max_fwd)
            mb = int(rt.max_bwd)
            # send stack + its all_to_all receive, forward and backward
            # (not simultaneously live; take the larger), plus the assembly
            # concat buffer [local ; replica ; received ; zero].
            exch = 2 * tpu_padded_bytes((q, max(mf, mb), k), state_itemsize)
            asm = tpu_padded_bytes(
                (w + w0 + q * max(mf, mb) + 1, k), state_itemsize
            )
            lvl_transient += exch + asm
        transient_peak = max(transient_peak, lvl_transient)

    state = 2 * tpu_padded_bytes((w_q + w, k), state_itemsize)  # in + out
    total = matrix + route + state + transient_peak
    return {
        "q": q,
        "width": w,
        "k": k,
        "levels": len(plan.levels),
        "matrix_bytes": float(matrix),
        "route_bytes": float(route),
        "state_bytes": float(state),
        "transient_bytes": float(transient_peak),
        "total_bytes": float(total),
        "fits_v5e": total <= HBM_BUDGET_V5E,
    }


def slim_fat_model(
    width: int,
    q: int,
    k: int,
    nnz_per_block: float,
    n_levels: int = 1,
    head_frac: float = 1 / 3,
    diag_frac: float = 1 / 3,
    ell_pad_factor: float = 1.3,
    hbm_budget: int = HBM_BUDGET_V5E,
) -> Dict[str, float]:
    """Analytic per-device HBM model: slim layout (q devices, reference:
    arrow/arrow_slim_mpi.py:298-326) vs the reference's fat split (2q-1
    devices, reference: arrow/arrow_mpi.py:26-93) at parameterized scale.

    Sparse panels are priced as gather-ELL: ``nnz x pad x (4B idx + 4B val)``
    (both 1-lane-padded slot streams in the packed layout, whose slot arrays
    are (V, chunk)-shaped and pad only the chunk dim — negligible at scale).
    Dense feature rows cost 512 B each for k <= 128 f32 (lane padding).

    :param nnz_per_block: nonzeros in ONE device's share of one level
        (head + diag + col together).
    :param head_frac: fraction of those nonzeros in the head panel ``A_0j``
        (power-law graphs concentrate mass here — the regime where the fat
        split pays).
    :param diag_frac: fraction in the diagonal/band panel.
    :return: per-device byte totals for slim devices and for fat row/column
        devices, whether each fits ``hbm_budget``, and the fat saving.
    """
    # Per-row bytes of an (N, k) f32 array for large N: lane padding only
    # (sublane padding amortizes over N rows) — 512 B for any k <= 128.
    row_bytes = _ceil_to(k, LANE) * 4
    slot_bytes = 8.0 * ell_pad_factor
    w_q = -(-width // q)
    w0 = q * w_q
    col_frac = max(0.0, 1.0 - head_frac - diag_frac)

    nnz_head = nnz_per_block * head_frac
    nnz_diag = nnz_per_block * diag_frac
    nnz_col = nnz_per_block * col_frac

    # Runtime rows: state (w_q + w) x2, head replica (w0), block transients
    # (2w), head-partial stack (w0).
    slim_rows = 2 * (w_q + width) + w0 + 2 * width + w0
    slim = (
        n_levels * nnz_per_block * slot_bytes + slim_rows * row_bytes
    )

    # Fat row device: head panel only + the X_j it multiplies + its (w0, k)
    # partial and psum buffer.
    fat_row_rows = width + 2 * w0
    fat_row = n_levels * nnz_head * slot_bytes + fat_row_rows * row_bytes
    # Fat column device: diag + col (+ band) panels + state + X_0 replica.
    fat_col_rows = 2 * (w_q + width) + w0 + 2 * width
    fat_col = (
        n_levels * (nnz_diag + nnz_col) * slot_bytes + fat_col_rows * row_bytes
    )

    fat_max = max(fat_row, fat_col)
    return {
        "width": width,
        "q": q,
        "k": k,
        "n_levels": n_levels,
        "slim_bytes": slim,
        "fat_row_bytes": fat_row,
        "fat_col_bytes": fat_col,
        "fat_max_bytes": fat_max,
        "slim_fits": slim <= hbm_budget,
        "fat_fits": fat_max <= hbm_budget,
        "fat_saving_frac": 1.0 - fat_max / slim if slim else 0.0,
        # The fat split spends 2q-1 devices to hold q blocks; per-FLOP it
        # only pays when slim exceeds the budget and fat does not.
        "fat_needed": slim > hbm_budget and fat_max <= hbm_budget,
    }
