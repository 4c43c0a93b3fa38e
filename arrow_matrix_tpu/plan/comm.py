"""Exact per-device communication-volume accounting.

The reference's headline claim is a *communication volume* guarantee:
``O(width * k)`` per rank per iteration for the arrow algorithm, a polynomial
reduction vs dense-style algorithms (1.5D) on planar / minor-excluded graph
families (reference: README.md:3). The reference never measures it; this
module computes exact per-device bytes per iteration from the compiled plans'
static shapes, using the standard ring cost model for each collective
actually issued:

* ``psum`` (allreduce) of S elements over q devices: each device sends
  ``2 * (q-1)/q * S`` (reduce-scatter + all-gather);
* ``all_gather`` of an s-element shard over q devices: sends ``(q-1) * s``;
* ``all_to_all`` with per-pair payload M rows: sends ``(q-1) * M * k``;
* ``ppermute``: sends its full payload.

Two numbers are reported for the routing exchanges: ``padded`` (what the
static-shape program actually sends, M rounded up) and ``occupied`` (the
information-theoretic rows, the reference's ragged ``Ialltoallv`` counts —
reference: arrow/arrow_dec_mpi.py:325-367).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from arrow_matrix_tpu.plan.compile import ArrowPlan
from arrow_matrix_tpu.plan.routing import sharded_routed_rows_per_pair

BYTES = 4  # float32 payloads


def arrow_comm_volume(plan: ArrowPlan, k: int) -> Dict[str, float]:
    """Max-over-devices bytes sent per iteration by ``ArrowSpmm.step``
    (sharded-head program; reference analogue:
    arrow/arrow_slim_mpi.py:78-156 + arrow/arrow_dec_mpi.py:404-610).

    Per level: ``all_gather`` of the block-0 shards (Bcast) + ``psum_scatter``
    of the head partials (Reduce) — ``(q-1)/q * w0 * k`` sent each, the
    reference's ~2·width·k per-rank volume — plus the forward/backward
    routing all_to_all for deeper levels.

    :return: dict with ``total_bytes`` (padded, as executed),
        ``occupied_bytes`` (ragged-equivalent), and a per-phase breakdown.
    """
    q, w = plan.n_blocks, plan.width
    w_q = -(-w // q)
    w0 = q * w_q
    head = 0.0
    routing_padded = 0.0
    routing_occupied = 0.0
    halo = 0.0
    for lvl in plan.levels:
        # all_gather(X_0 shards) + psum_scatter(head partials).
        head += 2 * (q - 1) / q * w0 * k * BYTES
        if lvl.route is not None:
            if lvl.route.rounds_mode:
                # Round-decomposed exchange: a device sends only in rounds
                # where it owns an edge, padded to each round's max edge.
                from arrow_matrix_tpu.plan.routing import (
                    round_exchange_padded_rows,
                )

                routing_padded += (
                    round_exchange_padded_rows(lvl.route) * k * BYTES
                )
            else:
                Mf, Mb = lvl.route.max_fwd, lvl.route.max_bwd
                routing_padded += (q - 1) * (Mf + Mb) * k * BYTES
            fwd, bwd = sharded_routed_rows_per_pair(lvl.route)
            for occ in (fwd, bwd):
                off = occ.copy()
                np.fill_diagonal(off, 0)
                routing_occupied += off.sum(axis=1).max(initial=0) * k * BYTES
        if lvl.band_lo is not None:
            halo += 2 * w * k * BYTES  # two ppermute shifts of (w, k)
    total = head + routing_padded + halo
    return {
        "q": q,
        "width": w,
        "k": k,
        "levels": len(plan.levels),
        "head_bytes": head,
        "routing_bytes_padded": routing_padded,
        "routing_bytes_occupied": routing_occupied,
        "halo_bytes": halo,
        "total_bytes": total,
        "occupied_bytes": head + routing_occupied + halo,
    }


def spmm_15d_comm_volume(
    n_rows: int,
    n_cols: int,
    k: int,
    p_div_c: int,
    c: int,
) -> Dict[str, float]:
    """Per-device bytes sent per product by ``Spmm15D.spmm`` (reference
    analogue: the X Bcast rounds + Y Allreduce,
    arrow/baseline/spmm_15d.py:312-368).

    Shapes mirror ``Spmm15D.__init__``: X shard ``s_in`` rows per device,
    all-gathered over the row axis; Y partial ``lNI`` rows, psum'd over the
    replication axis.
    """
    s_in = -(-n_cols // (p_div_c * c))
    lNI = c * (-(-n_rows // (p_div_c * c)))
    all_gather = (p_div_c - 1) * s_in * k * BYTES
    psum = 2 * (c - 1) / c * lNI * k * BYTES
    return {
        "p_div_c": p_div_c,
        "c": c,
        "k": k,
        "all_gather_bytes": all_gather,
        "psum_bytes": psum,
        "total_bytes": all_gather + psum,
    }


def petsc_comm_volume(plan, k: int) -> Dict[str, float]:
    """Per-device bytes sent per iteration by the PETSc-style 1-D baseline
    (reference analogue: the bulk X-row exchange,
    arrow/baseline/spmm_petsc.py:105-144 — one message per peer carrying the
    X rows the peer's nonlocal columns touch).

    :param plan: a :class:`arrow_matrix_tpu.baselines.matrix_slice.MatrixSlicePlan`.
    :return: dict with ``padded`` (the static all_to_all's per-pair max M)
        and ``occupied`` (the reference's ragged per-pair counts) bytes for
        the busiest device.
    """
    send_idx = np.asarray(plan.send_idx)  # (q, q, M), pad == plan.lmax
    q, _, M = send_idx.shape
    occupied = (send_idx != plan.lmax).sum(axis=2).astype(np.float64)
    np.fill_diagonal(occupied, 0.0)
    per_dev_occ = occupied.sum(axis=1).max(initial=0.0) * k * BYTES
    padded = (q - 1) * M * k * BYTES
    return {
        "q": q,
        "k": k,
        "max_per_pair": M,
        "total_bytes": padded,
        "occupied_bytes": per_dev_occ,
    }
