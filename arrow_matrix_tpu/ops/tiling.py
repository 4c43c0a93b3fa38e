"""Feature-column (k) tiling planner — the memory-capacity analogue of the
reference's GPU tiling (reference: arrow/baseline/spmm_petsc.py:323-395
``compute_gpu_tiling_size``, arrow/baseline/spmm_15d.py:371-449).

The reference splits the dense operand's columns so each tile fits GPU
memory. On TPU the binding constraints are (a) VMEM residency for the BSR
Pallas kernel's dense operand and (b) HBM working set for very wide feature
matrices. ``plan_feature_tiles`` returns a static tile width; ``tiled_apply``
runs any SpMM-like function tile by tile and concatenates.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

#: Usable VMEM for a resident dense operand (half of the ~16MB/core budget,
#: leaving room for pipeline buffers and accumulators).
DEFAULT_VMEM_BUDGET = 8 << 20
#: HBM working-set guard for intermediate gather buffers.
DEFAULT_HBM_BUDGET = 4 << 30


LANES = 128  # VMEM lane width: the minor dimension pads to 128 elements


def vmem_resident_bytes(
    n_rows: int, k: int, bytes_per_elem: int = 4
) -> int:
    """PHYSICAL VMEM footprint of an (n_rows, k) operand: the minor
    dimension is lane-padded to 128, so a narrow-k operand still costs
    ``n_rows * 128`` elements (measured: an f32 (200064, 8) operand
    allocates ~99MB of scoped VMEM). Feature tiling below 128 columns
    therefore saves NOTHING in VMEM."""
    return n_rows * max(1, -(-k // LANES)) * LANES * bytes_per_elem


def plan_feature_tiles(
    n_rows_padded: int,
    k: int,
    bytes_per_elem: int = 4,
    vmem_budget: int = DEFAULT_VMEM_BUDGET,
    needs_vmem_residency: bool = False,
    hbm_budget: int = DEFAULT_HBM_BUDGET,
    slots: int | None = None,
    lane_multiple: int = 8,
) -> int:
    """Static feature-tile width k_t <= k.

    :param needs_vmem_residency: True for the BSR Pallas kernel (the whole
        (n_rows_padded, k_t) operand sits in VMEM, lane-padded — tiles are
        only useful in multiples of 128 columns there).
    :param slots: ELL slot count; bounds the (slots, k_t) gather intermediate
        against the HBM budget.
    :return: k_t (a multiple of ``lane_multiple``, or k itself if smaller).
    """
    k_t = k
    if needs_vmem_residency:
        if k > LANES:
            fit = (vmem_budget // (n_rows_padded * bytes_per_elem)) // LANES * LANES
            k_t = min(k_t, max(LANES, fit))
        # k <= 128: lane padding makes any narrower tile the same size.
    if slots:
        k_t = min(k_t, max(1, hbm_budget // (slots * bytes_per_elem)))
    if k_t >= k:
        return k
    return max(lane_multiple, (k_t // lane_multiple) * lane_multiple)


def tiled_apply(fn: Callable, x: jnp.ndarray, tile_k: int) -> jnp.ndarray:
    """Apply ``fn`` over column tiles of x and concatenate the results.
    Static Python loop — tile count is a plan-time constant."""
    k = x.shape[-1]
    if tile_k >= k:
        return fn(x)
    outs = [fn(x[:, i : min(i + tile_k, k)]) for i in range(0, k, tile_k)]
    return jnp.concatenate(outs, axis=-1)
