"""Single-device execution of an :class:`ArrowPlan` (no collectives).

The distributed step in ``arrow_spmm.py`` is the production path; this module
runs the same compiled plan on ONE chip: block-stacked ELL SpMMs via ``vmap``,
head reduction as a plain sum, inter-level routing as local gathers. Used for
the single-chip benchmark and as the flagship jittable forward step
(the reference's 1-rank fast paths: arrow/arrow_dec_mpi.py:446-458,
arrow/arrow_slim_mpi.py with comm size 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arrow_matrix_tpu.ops.ell import ell_spmm
from arrow_matrix_tpu.ops.formats import EllMat
from arrow_matrix_tpu.plan.compile import ArrowPlan, LevelPlan


def _vmapped_spmm(stacked: EllMat, x_blocks: jnp.ndarray) -> jnp.ndarray:
    """Apply a (q, ...)-stacked EllMat to (q, w, k) feature blocks."""

    def one(idx, val, comb, xb):
        m = EllMat(
            idx=idx,
            val=val,
            combine=comb,
            n_rows=stacked.n_rows,
            n_cols=stacked.n_cols,
            stage_inputs=stacked.stage_inputs,
        )
        return ell_spmm(m, xb)

    return jax.vmap(one)(stacked.idx, stacked.val, stacked.combine, x_blocks)


def _level_spmm_local(lvl: LevelPlan, x_blocks: jnp.ndarray, width: int) -> jnp.ndarray:
    """(q, w, k) level-ordered feature blocks -> (q, w, k) result blocks."""
    q = x_blocks.shape[0]
    head_partials = _vmapped_spmm(lvl.head, x_blocks)  # (q, w, k)
    c0 = head_partials.sum(axis=0)  # == Reduce(C_0)
    x0 = jnp.broadcast_to(x_blocks[0], x_blocks.shape)  # == Bcast(X_0)
    cj = _vmapped_spmm(lvl.diag, x_blocks) + _vmapped_spmm(lvl.col, x0)
    if lvl.band_lo is not None:
        zero = jnp.zeros_like(x_blocks[:1])
        x_lo = jnp.concatenate([zero, x_blocks[:-1]], axis=0)
        x_hi = jnp.concatenate([x_blocks[1:], zero], axis=0)
        cj = cj + _vmapped_spmm(lvl.band_lo, x_lo)
        cj = cj + _vmapped_spmm(lvl.band_hi, x_hi)
    return jnp.concatenate([c0[None], cj[1:]], axis=0)


def local_step(plan: ArrowPlan, x: jnp.ndarray) -> jnp.ndarray:
    """One iteration ``X <- A X`` on a single device.

    :param x: (padded_rows, k) features in level-0 permuted order.
    """
    q, w = plan.n_blocks, plan.width
    k = x.shape[1]
    x_blocks = x.reshape(q, w, k)

    c = _level_spmm_local(plan.levels[0], x_blocks, w).reshape(q * w, k)
    for lvl in plan.levels[1:]:
        rt = lvl.route
        cut = rt.cut
        # Forward: gather rows into the level's order (truncated to cut).
        src = rt.dst_to_src[:cut]
        x_lvl = jnp.zeros((q * w, k), dtype=x.dtype).at[:cut].set(x[src])
        c_lvl = _level_spmm_local(lvl, x_lvl.reshape(q, w, k), w).reshape(q * w, k)
        # Backward: scatter-add the level's partial result back.
        c = c.at[src].add(c_lvl[:cut])
    return c
