"""Single-chip execution of the DISTRIBUTED arrow program (blocked executor).

``blocked_step`` runs the exact program of ``arrow_spmm.step`` — per-block
head/diagonal/column SpMMs, the fused Bcast+Reduce head psum, the banded
halo, and the inter-level routing exchanges — on ONE device, with every
collective replaced by its on-chip equivalent (psum -> sum over the block
axis, all_to_all -> axis transpose, ppermute -> block shift). Two reasons it
exists:

1. *Hardware measurement of the distributed path.* Real multi-chip meshes are
   not always available; the blocked executor is the distributed program
   minus the ICI transfers, so profiling it on one chip measures the routing
   gathers, level structure, and per-block kernels the multi-chip program
   executes (VERDICT round-1 item 1).
2. *The big-source gather regime.* The merged single-chip plan
   (``parallel/local.py``) gathers from the FULL feature matrix; for large
   matrices (1M+ rows) those gathers fall off the gather engine's fast path
   (measured ~0.1-0.16 G rows/s from multi-10MB sources vs ~0.7 G rows/s
   from width-sized sources). The blocked executor's gathers all read
   width-sized blocks — the structure the distributed path gets from the
   mesh, available single-chip (VERDICT round-1 item 6).

Unlike the shard_map plan — whose per-device programs must be identical, so
every role is padded to a COMMON static format — one chip serializes the
blocks, so each block gets its own optimal format: full-identity ELL,
row-compressed :class:`CompactEll` (arrow blocks are mostly sparse in rows),
Pallas BSR for dense-ish blocks, and nothing at all for empty ones.

Semantics match ``ArrowSpmm.step`` exactly; both mirror the reference's
``ArrowDecompositionMPI.step`` (reference: arrow/arrow_dec_mpi.py:283-307).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from scipy import sparse

from arrow_matrix_tpu.ops.bsr_pallas import (
    BsrMat,
    bsr_from_csr,
    bsr_spmm,
    preferred_format,
)
from arrow_matrix_tpu.ops.ell import compact_ell_spmm, ell_spmm
from arrow_matrix_tpu.ops.formats import (
    CompactEll,
    compact_ell_from_csr,
    ell_cost_rows,
    ell_from_csr,
)
from arrow_matrix_tpu.plan.routing import RouteTables


@struct.dataclass
class BlockedLevel:
    """Per-level, per-block matrices (tuples of length q_i; entries may be
    None for structurally empty blocks)."""

    head: tuple
    diag: tuple
    col: tuple
    band_lo: Optional[tuple]
    band_hi: Optional[tuple]
    route: Optional[RouteTables]
    n_active_blocks: int = struct.field(pytree_node=False)


@struct.dataclass
class BlockedPlan:
    levels: tuple
    width: int = struct.field(pytree_node=False)
    n_blocks: int = struct.field(pytree_node=False)
    n_rows: int = struct.field(pytree_node=False)
    block_diagonal: bool = struct.field(pytree_node=False)
    permutations: tuple = ()

    @property
    def padded_rows(self) -> int:
        return self.width * self.n_blocks


def _build_block(b: sparse.csr_matrix, k_hint: int):
    """Per-block format choice: None (empty), BSR (dense-ish tiles), or the
    cheaper of full-identity / row-compressed ELL by gathered-row count."""
    if b.nnz == 0:
        return None
    if preferred_format(b, k_hint) == "bsr":
        return bsr_from_csr(b)
    full, compact = ell_cost_rows(b)
    if compact < full:
        return compact_ell_from_csr(b)
    return ell_from_csr(b)


def compile_blocked_plan(
    decomposition,
    width: int,
    n_blocks: int | None = None,
    block_diagonal: bool = True,
    k_hint: int = 16,
    routing_pad_multiple: int = 8,
) -> BlockedPlan:
    """Compile a decomposition for the blocked single-chip executor: the same
    block cut and routing tables as the distributed :func:`compile_plan`,
    with per-block independent formats."""
    from arrow_matrix_tpu.io.graphio import as_csr
    from arrow_matrix_tpu.plan.compile import extract_levels

    n = as_csr(decomposition[0][0]).shape[0]
    q = n_blocks or max(1, -(-n // width))
    raw_levels, padded_perms, n = extract_levels(
        decomposition, width, q, block_diagonal, routing_pad_multiple
    )

    levels = []
    for raw in raw_levels:
        q_i = raw.n_active_blocks

        def role(blocks):
            return tuple(_build_block(b, k_hint) for b in blocks[:q_i])

        levels.append(
            BlockedLevel(
                head=role(raw.head),
                diag=role(raw.diag),
                col=role(raw.col),
                band_lo=role(raw.band_lo) if raw.band_lo is not None else None,
                band_hi=role(raw.band_hi) if raw.band_hi is not None else None,
                route=raw.route,
                n_active_blocks=q_i,
            )
        )

    return BlockedPlan(
        levels=tuple(levels),
        width=width,
        n_blocks=q,
        n_rows=n,
        block_diagonal=block_diagonal,
        permutations=padded_perms,
    )


def _apply(m, x: jnp.ndarray, width: int) -> Optional[jnp.ndarray]:
    """Apply one block matrix; None blocks contribute nothing."""
    if m is None:
        return None
    if isinstance(m, BsrMat):
        pad = m.n_col_tiles * m.tile_n - x.shape[0]
        if pad > 0:
            x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
        return bsr_spmm(m, x)[:width].astype(x.dtype)
    if isinstance(m, CompactEll):
        return compact_ell_spmm(m, x)
    return ell_spmm(m, x)


def _acc(a: Optional[jnp.ndarray], b: Optional[jnp.ndarray]):
    if a is None:
        return b
    if b is None:
        return a
    return a + b


def _level_spmm_blocked(lvl: BlockedLevel, xq: jnp.ndarray, width: int) -> jnp.ndarray:
    """Per-block level SpMM; xq is (q_i, width, k) feature blocks in the
    level's order; returns (q_i, width, k) result blocks. Mirrors
    ``arrow_spmm._level_spmm`` with the psum unrolled into an on-chip sum
    and empty blocks skipped."""
    q_i, _, k = xq.shape
    zero = jnp.zeros((width, k), xq.dtype)

    c_0 = None
    for j in range(q_i):
        c_0 = _acc(c_0, _apply(lvl.head[j], xq[j], width))
    c_0 = c_0 if c_0 is not None else zero
    x_0 = xq[0]

    outs = [c_0]
    for j in range(1, q_i):
        c_j = _acc(
            _apply(lvl.diag[j], xq[j], width), _apply(lvl.col[j], x_0, width)
        )
        if lvl.band_lo is not None:
            if j >= 2:
                c_j = _acc(c_j, _apply(lvl.band_lo[j], xq[j - 1], width))
            if j < q_i - 1:
                c_j = _acc(c_j, _apply(lvl.band_hi[j], xq[j + 1], width))
        outs.append(c_j if c_j is not None else zero)
    return jnp.stack(outs)


def _exchange(blocks: jnp.ndarray, idx: jnp.ndarray, n_dst: int) -> jnp.ndarray:
    """The all_to_all of ``arrow_spmm._route_forward`` on-chip: per source
    block s gather its slots for every destination, then swap the (src, dst)
    axes. Returns (n_dst, q*M, k) receive regions.

    :param blocks: (q, width, k) per-block rows.
    :param idx: (q, n_dst_tab, M) slot tables (``width`` = padding).
    """
    q, width, k = blocks.shape
    padded = jnp.concatenate(
        [blocks, jnp.zeros((q, 1, k), blocks.dtype)], axis=1
    )
    send = jax.vmap(lambda xs, t: jnp.take(xs, t, axis=0))(
        padded, idx[:, :n_dst]
    )  # (q_src, n_dst, M, k)
    recv = jnp.swapaxes(send, 0, 1)  # (n_dst, q_src, M, k)
    return recv.reshape(n_dst, -1, k)


def _route_forward_blocked(
    rt: RouteTables, xq: jnp.ndarray, q_i: int
) -> jnp.ndarray:
    """Features level-0 order -> level order, per block
    (``arrow_spmm._route_forward`` with the collective emulated)."""
    q, width, k = xq.shape
    recv = _exchange(xq, rt.send_idx, q_i)  # (q_i, q*M, k)
    bufs = jnp.concatenate(
        [xq[:q_i], recv, jnp.zeros((q_i, 1, k), xq.dtype)], axis=1
    )
    (bufs,) = jax.lax.optimization_barrier((bufs,))
    return jax.vmap(lambda b, g: jnp.take(b, g, axis=0))(bufs, rt.fwd_gather[:q_i])


def _route_backward_add_blocked(
    rt: RouteTables, c_level: jnp.ndarray, c_accum: jnp.ndarray
) -> jnp.ndarray:
    """Partial results level order -> level-0 order, accumulated
    (``arrow_spmm._route_backward_add`` with the collective emulated)."""
    q, width, k = c_accum.shape
    q_i = c_level.shape[0]
    if q_i < q:
        c_full = jnp.concatenate(
            [c_level, jnp.zeros((q - q_i, width, k), c_level.dtype)], axis=0
        )
    else:
        c_full = c_level
    # Backward exchange: destination blocks (level order, only q_i active)
    # send each forward slot's result back to its source block.
    recv_back = _exchange(c_full, rt.recv_idx, q)  # (q, q*M, k)
    bufs = jnp.concatenate(
        [c_full, recv_back, jnp.zeros((q, 1, k), c_level.dtype)], axis=1
    )
    (bufs,) = jax.lax.optimization_barrier((bufs,))
    add = jax.vmap(lambda b, g: jnp.take(b, g, axis=0))(bufs, rt.bwd_gather)
    return c_accum + add


def blocked_step(plan: BlockedPlan, x: jnp.ndarray) -> jnp.ndarray:
    """One iteration ``X <- A X`` of the distributed program on one device.

    :param x: (n_blocks * width, k) features in level-0 permuted order
        (same layout as :func:`arrow_matrix_tpu.parallel.local.local_step`).
    """
    q, width = plan.n_blocks, plan.width
    k = x.shape[1]
    xq = x.reshape(q, width, k)
    q0 = plan.levels[0].n_active_blocks
    c = _level_spmm_blocked(plan.levels[0], xq[:q0], width)
    if q0 < q:
        c = jnp.concatenate([c, jnp.zeros((q - q0, width, k), x.dtype)], axis=0)
    for lvl in plan.levels[1:]:
        q_i = lvl.n_active_blocks
        x_i = _route_forward_blocked(lvl.route, xq, q_i)
        c_i = _level_spmm_blocked(lvl, x_i, width)
        c = _route_backward_add_blocked(lvl.route, c_i, c)
    return c.reshape(q * width, k)
