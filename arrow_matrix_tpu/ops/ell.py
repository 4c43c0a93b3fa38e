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


#: Source row count above which row-gathers run FOLDED. The v5e gather
#: engine serves lane-padded (N, k<=16) sources at ~0.39 G rows/s up to
#: ~200k rows (~100MB physical: every row pads to 128 lanes x 4B) and drops
#: to ~0.15 G at >= 400k rows, independent of index order (measured,
#: tools/bench_gather_cliff.py). Folding f = 128//k logical rows into one
#: dense 128-lane physical row shrinks the footprint f-fold; the slot's
#: sub-row is recovered by an in-register one-hot select fused into the
#: consuming einsum. Measured at 1M rows, k=16: folded 0.26-0.27 G rows/s
#: vs plain 0.15 G (1.7x), flat in index pattern; below the cliff plain
#: wins (0.39 vs 0.27), so folding engages only past this threshold.
FOLD_SOURCE_ROWS = 262_144


def _fold_source(x: jnp.ndarray):
    """Fold a big (N, k) source into ((N/f), f*k) dense-lane rows, or return
    ``None`` when folding does not apply (source on the gather plateau, or
    k does not divide 128 into f >= 8 sub-rows)."""
    n, k = x.shape
    if n <= FOLD_SOURCE_ROWS or k > 16 or 128 % k:
        return None
    f = 128 // k
    pad = (-n) % f
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, k), x.dtype)], axis=0)
    return x.reshape((n + pad) // f, f * k)


#: Sub-row select formulation:
#:
#: * 'smatmul' — multiply the gathered (n, 128) rows by the per-slot weight
#:   broadcast over its 16-lane group, then contract with a STATIC 0/1
#:   (128, k) matrix summing the f lane groups. No (n, f, k) reshape at all,
#:   so XLA's layout assignment keeps the gather output row-major (the
#:   batched-einsum form inserts a full transposed copy of the gathered
#:   array — 17 ms at 11M slots, profiled); the weight broadcast fuses into
#:   the dot's input.
#: * 'einsum' — batched (n, f) x (n, f, k) dot.
#: * 'elementwise' — lane-slice select chain.
#:
#: NOTE: a (V, R, f, k) 4-D einsum is NOT an option: its lowering
#: materializes the operand lane-padded 8x and OOMs at scale; all
#: formulations here stay at the flat (V*R,) level.
FOLD_SELECT = "smatmul"


def _folded_select(xf, flat_idx, k: int, weights=None) -> jnp.ndarray:
    """Gather folded rows and select each slot's sub-row.

    Returns (n, k) float32: ``w_i * x[flat_idx_i]`` (``w`` defaults to 1)."""
    f = (xf.shape[1] // k)
    g = jnp.take(xf, flat_idx // f, axis=0)  # (n, f*k)
    m = flat_idx % f
    if FOLD_SELECT == "smatmul":
        # w broadcast over each slot's 16-lane group, then a static 0/1
        # (f*k, k) contraction sums the lane groups: out = (g * wrep) @ S.
        lane_group = jnp.arange(f * k, dtype=jnp.int32) // k  # (f*k,)
        hit = m[:, None] == lane_group[None, :]  # (n, f*k)
        w = (
            jnp.where(hit, weights[:, None], 0.0).astype(jnp.float32)
            if weights is not None
            else hit.astype(jnp.float32)
        )
        S = (
            jnp.arange(f * k, dtype=jnp.int32)[:, None] % k
            == jnp.arange(k, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)
        return jax.lax.dot(
            g.astype(jnp.float32) * w, S, precision=jax.lax.Precision.HIGHEST
        )
    if FOLD_SELECT == "einsum":
        sel = m[:, None] == jnp.arange(f, dtype=jnp.int32)[None, :]
        w = (
            jnp.where(sel, weights[:, None], 0.0).astype(jnp.float32)
            if weights is not None
            else sel.astype(jnp.float32)
        )
        n = flat_idx.shape[0]
        return jnp.einsum(
            "nj,njk->nk", w, g.reshape(n, f, k).astype(jnp.float32)
        )
    out = None
    for j in range(f):
        hit = m == j
        w = (
            jnp.where(hit, weights, 0.0).astype(jnp.float32)
            if weights is not None
            else hit.astype(jnp.float32)
        )
        t = w[:, None] * g[:, j * k : (j + 1) * k].astype(jnp.float32)
        out = t if out is None else out + t
    return out


def big_take(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``jnp.take(x, idx, axis=0)`` that switches to the folded-source
    gather when ``x`` is beyond the gather-engine cliff (see
    :data:`FOLD_SOURCE_ROWS`). ``idx`` may have any shape; the result is
    ``idx.shape + (k,)``. Exact — the sub-row select multiplies by 0/1."""
    xf = _fold_source(x)
    if xf is None:
        return jnp.take(x, idx, axis=0)
    k = x.shape[1]
    out = _folded_select(xf, idx.reshape(-1), k)
    return out.reshape(idx.shape + (k,)).astype(x.dtype)


#: Slot count above which the gather+FMA pass runs in virtual-row chunks:
#: the (V*R, k) gather intermediate is lane-padded to 128 in its T(8,128)
#: layout (512B per slot at k <= 128), so a 128M-nonzero matrix would
#: otherwise allocate ~70GB and OOM 16GB HBM at compile.
MAX_GATHER_SLOTS = 16_000_000

#: Per-chunk slot bound for the chunked pass. Kept well below
#: MAX_GATHER_SLOTS: a chunk materializes slots*512B of HBM temp, and at
#: 16M slots that is 7.6GiB — measured OOM on a 4M-vertex/128M-nnz RMAT
#: alongside the resident plan buffers. 4M slots bounds the temp at 2GiB;
#: the extra lax.map iterations are dynamic-slice launches, amortized by
#: the gather itself.
CHUNK_GATHER_SLOTS = 4_000_000


def _slot_partial(idx, val, x, precision) -> jnp.ndarray:
    """(V, R) slots -> (V, k) partial: gather + FMA-reduce, switching to the
    folded-source gather (sub-row one-hot select fused into the einsum) when
    the source is beyond the gather cliff."""
    V, R = idx.shape
    k = x.shape[-1]
    xf = _fold_source(x)
    if xf is None:
        gathered = jnp.take(x, idx.reshape(-1), axis=0).reshape(V, R, k)
        return jnp.einsum(
            "vr,vrk->vk",
            val.astype(jnp.float32),
            gathered.astype(jnp.float32),
            precision=precision,
        )
    slot = _folded_select(xf, idx.reshape(-1), k, val.reshape(-1))  # (V*R, k)
    # Splitting the major dim is layout-trivial (k stays minor), so the
    # reduce reads the fused select directly.
    return slot.reshape(V, R, k).sum(axis=1)


def _chunked_partial(A: EllMat, x: jnp.ndarray, precision) -> jnp.ndarray:
    """Gather + FMA-reduce over virtual-row chunks (sequential ``lax.map``),
    bounding the materialized intermediate to one chunk."""
    V, R = A.idx.shape
    k = x.shape[-1]
    vc = max(8, (CHUNK_GATHER_SLOTS // R) // 8 * 8)
    n_chunks = -(-V // vc)
    pad = n_chunks * vc - V
    idxp = jnp.pad(A.idx, ((0, pad), (0, 0)))  # pad slots: col 0, val 0
    valp = jnp.pad(A.val, ((0, pad), (0, 0)))

    def one(i):
        idc = jax.lax.dynamic_slice_in_dim(idxp, i * vc, vc)
        vlc = jax.lax.dynamic_slice_in_dim(valp, i * vc, vc)
        return _slot_partial(idc, vlc, x, precision)

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
        partial = _slot_partial(A.idx, A.val, x, precision)
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
        g = big_take(p, table.reshape(-1))
        outputs.append(g.reshape(table.shape + (k,)).sum(axis=1))
    final = A.combine[-1]
    buf = jnp.concatenate(outputs + [jnp.zeros((1, k), jnp.float32)], axis=0)
    # Materialize the concat: a gather whose source is a fused concatenate
    # lowers to per-element operand selection and runs ~10x slower (profiled).
    (buf,) = jax.lax.optimization_barrier((buf,))
    y = base + big_take(buf, final[:, 0])
    return y.astype(x.dtype)


def packed_ell_spmm(A: PackedEll, x: jnp.ndarray) -> jnp.ndarray:
    """Multiply a (single, unstacked) :class:`PackedEll` by a dense
    (n_cols, k) matrix: gather + multiply per slot, in-chunk prefix sums,
    then each row's sum is the difference of two boundary gathers —
    slot count ~ nnz even when rows average one nonzero."""
    k = x.shape[-1]
    xf = _fold_source(x)
    if xf is None:
        gathered = jnp.take(x, A.idx.reshape(-1), axis=0).reshape(
            A.idx.shape + (k,)
        )
        c = A.val.astype(jnp.float32)[..., None] * gathered.astype(jnp.float32)
    else:
        V, chunk = A.idx.shape
        slot = _folded_select(
            xf, A.idx.reshape(-1), k, A.val.reshape(-1)
        )
        c = slot.reshape(V, chunk, k)
    p = jnp.cumsum(c, axis=1).reshape(-1, k)  # (V*chunk, k)
    pz = _zero_row(p)
    (pz,) = jax.lax.optimization_barrier((pz,))
    y = big_take(pz, A.end_idx) - big_take(pz, A.beg_idx)
    return y.astype(x.dtype)


def compact_ell_spmm(A: CompactEll, x: jnp.ndarray) -> jnp.ndarray:
    """Multiply a (single, unstacked) :class:`CompactEll` by a dense
    (n_cols, k) matrix: inner SpMM over occupied rows, then a row-expansion
    gather to (n_rows, k) (empty rows read the appended zero row)."""
    y = ell_spmm(A.inner, x)  # (occ_pad, k)
    yz = _zero_row(y)
    (yz,) = jax.lax.optimization_barrier((yz,))
    return big_take(yz, A.row_map)
