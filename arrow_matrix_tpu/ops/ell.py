"""Gather-based padded-ELL SpMM (the XLA compute path).

``Y = A @ X`` for an :class:`EllMat` A and dense tall-skinny X:

    partial[v] = sum_r val[v, r] * X[idx[v, r]]          (gather + FMA)
    partial    = stage_s(partial)  for each combine stage (segmented tree)
    Y[row]     = partial[final[row, 0]]

Everything is static-shaped gathers and reductions — no scatter, no dynamic
control flow — so XLA fuses it into a single pass. The combine chain reduces
split heavy rows in O(log nnz) arity-8 stages whose total size is ~V/7,
instead of a (rows x max_splits) padded gather (profiling showed the latter
dominating iteration time on power-law head panels).

Replaces the reference's scipy-CSR / cuSPARSE local kernel
(reference: arrow/arrow_mpi.py:196-272, arrow/common/sp2cp.py:6-16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arrow_matrix_tpu.ops.formats import CompactEll, EllMat, PackedEll


def _zero_row(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x, jnp.zeros((1, x.shape[1]), dtype=x.dtype)], axis=0)


#: Slot count above which the gather+FMA pass runs in virtual-row chunks:
#: the (V*R, k) gather intermediate is lane-padded to 128 in its T(8,128)
#: layout (512B per slot at k <= 128), so a 128M-nonzero matrix would
#: otherwise allocate ~70GB and OOM 16GB HBM at compile.
MAX_GATHER_SLOTS = 16_000_000


def _chunked_partial(A: EllMat, x: jnp.ndarray, precision) -> jnp.ndarray:
    """Gather + FMA-reduce over virtual-row chunks (sequential ``lax.map``),
    bounding the materialized intermediate to one chunk."""
    V, R = A.idx.shape
    k = x.shape[-1]
    vc = max(8, (MAX_GATHER_SLOTS // R) // 8 * 8)
    n_chunks = -(-V // vc)
    pad = n_chunks * vc - V
    idxp = jnp.pad(A.idx, ((0, pad), (0, 0)))  # pad slots: col 0, val 0
    valp = jnp.pad(A.val, ((0, pad), (0, 0)))

    def one(i):
        idc = jax.lax.dynamic_slice_in_dim(idxp, i * vc, vc)
        vlc = jax.lax.dynamic_slice_in_dim(valp, i * vc, vc)
        g = jnp.take(x, idc.reshape(-1), axis=0).reshape(vc, R, k)
        return jnp.einsum(
            "vr,vrk->vk",
            vlc.astype(jnp.float32),
            g.astype(jnp.float32),
            precision=precision,
        )

    parts = jax.lax.map(one, jnp.arange(n_chunks))
    return parts.reshape(n_chunks * vc, k)[:V]


def ell_spmm(A: EllMat, x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Multiply a (single, unstacked) EllMat by a dense (n_cols, k) matrix.

    Returns (n_rows, k) in ``x.dtype`` with float32 accumulation.
    """
    assert A.idx.ndim == 2, "use vmap/shard_map for stacked EllMats"
    k = x.shape[-1]
    if A.idx.size > MAX_GATHER_SLOTS:
        partial = _chunked_partial(A, x, precision)
    else:
        gathered = jnp.take(x, A.idx.reshape(-1), axis=0)  # (V*R, k)
        gathered = gathered.reshape(A.idx.shape + (k,))  # (V, R, k)
        partial = jnp.einsum(
            "vr,vrk->vk",
            A.val.astype(jnp.float32),
            gathered.astype(jnp.float32),
            precision=precision,
        )
    # First-chunk-identity layout: virtual row r < n_rows IS row r, so the
    # light-row result is `base` with no indirection. The extras of heavy
    # rows are reduced by the arity-8 chain (tiny arrays, cache-resident) and
    # a final small-source gather adds each row's settled extras sum.
    base = partial[: A.n_rows]
    if len(A.combine) == 1 and A.combine[-1].shape[0] <= 1:
        return base.astype(x.dtype)
    extras = partial[A.n_rows :]
    outputs = [extras]
    for table in A.combine[:-1]:
        p = _zero_row(outputs[-1])
        g = jnp.take(p, table.reshape(-1), axis=0)
        outputs.append(g.reshape(table.shape + (k,)).sum(axis=1))
    final = A.combine[-1]
    buf = jnp.concatenate(outputs + [jnp.zeros((1, k), jnp.float32)], axis=0)
    # Materialize the concat: a gather whose source is a fused concatenate
    # lowers to per-element operand selection and runs ~10x slower (profiled).
    (buf,) = jax.lax.optimization_barrier((buf,))
    y = base + jnp.take(buf, final[:, 0], axis=0)
    return y.astype(x.dtype)


def packed_ell_spmm(A: PackedEll, x: jnp.ndarray) -> jnp.ndarray:
    """Multiply a (single, unstacked) :class:`PackedEll` by a dense
    (n_cols, k) matrix: gather + multiply per slot, in-chunk prefix sums,
    then each row's sum is the difference of two boundary gathers —
    slot count ~ nnz even when rows average one nonzero."""
    k = x.shape[-1]
    gathered = jnp.take(x, A.idx.reshape(-1), axis=0).reshape(A.idx.shape + (k,))
    c = A.val.astype(jnp.float32)[..., None] * gathered.astype(jnp.float32)
    p = jnp.cumsum(c, axis=1).reshape(-1, k)  # (V*chunk, k)
    pz = _zero_row(p)
    (pz,) = jax.lax.optimization_barrier((pz,))
    y = jnp.take(pz, A.end_idx, axis=0) - jnp.take(pz, A.beg_idx, axis=0)
    return y.astype(x.dtype)


def compact_ell_spmm(A: CompactEll, x: jnp.ndarray) -> jnp.ndarray:
    """Multiply a (single, unstacked) :class:`CompactEll` by a dense
    (n_cols, k) matrix: inner SpMM over occupied rows, then a row-expansion
    gather to (n_rows, k) (empty rows read the appended zero row)."""
    y = ell_spmm(A.inner, x)  # (occ_pad, k)
    yz = _zero_row(y)
    (yz,) = jax.lax.optimization_barrier((yz,))
    return jnp.take(yz, A.row_map, axis=0)
