"""Region-partitioned single-chip executor for matrices beyond the gather
cliff.

The merged single-chip plan (``parallel/local.py``) issues every gather
against the FULL feature matrix. The v5e gather engine serves sources up to
~200k lane-padded rows (~100MB physical) at its plateau rate (~0.39 G
rows/s random, faster band-local) and then falls off a hard cliff to
~0.15 G rows/s at >= 400k rows — measured, independent of index order
(sorted/banded patterns do NOT rescue big sources, and lazily sliced
sources fuse back into the big buffer). At 1M+ rows the merged plan is
therefore gather-source-bound.

This executor keeps the merged (single-matrix, zero-routing) structure but
partitions it into (row stripe) x (column region) parts with regions sized
UNDER the cliff:

* the step first materializes each column region of the features as its own
  buffer (explicit ``optimization_barrier`` copies — sequential,
  bandwidth-trivial);
* part (h, g) holds the merged matrix's nonzeros with rows in stripe h and
  columns in region g, stored with REGION-LOCAL column indices in the
  per-block format chooser's best gather layout
  (:func:`arrow_matrix_tpu.ops.dispatch.build_block_format`);
* stripe h's output is the sum of its parts' contributions — every gather
  in the step reads a plateau-sized source.

This is the single-chip answer to the big-source regime (round-1 VERDICT
item 6); the distributed mesh gets the same structure for free because each
device holds only width-sized feature blocks. The reference has no analogue
(its scipy/cuSPARSE kernels are cache-blocked by the vendor); region
partitioning is the TPU gather engine's equivalent of cache blocking.

Semantics match ``local_step`` exactly: one iteration ``X <- A X`` with A
the summed levels in level-0 order (reference semantics:
arrow/arrow_dec_mpi.py:283-307 collapsed onto one rank).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from arrow_matrix_tpu.ops.dispatch import apply_mat, build_block_format

#: Largest lane-padded source (rows) still on the gather-engine plateau.
#: Measured on v5e: 200k rows (102MB physical at 128 lanes x 4B) runs at
#: ~0.39 G rows/s random; 400k rows at ~0.15 G. The default region size
#: stays safely below the cliff.
GATHER_CLIFF_ROWS = 262_144
DEFAULT_REGION_ROWS = 196_608  # 1.5 * 128k, comfortably on the plateau

#: PackedEll prefix-sum buffers are gather sources too — cap their size so
#: the boundary gathers stay on the plateau.
PACKED_SLOTS_CAP = 240_000

#: Region size at which every part's dense operand is VMEM-resident
#: (rows x 512B lane-padded = the 8MB budget in ``preferred_format``), so
#: the per-part format chooser can put dense-enough parts on the BSR/MXU
#: path. Used by the auto single-chip executor for RCM-banded matrices.
BSR_REGION_ROWS = 16_384


@struct.dataclass
class RegionPlan:
    """Stripe-major parts of the merged matrix, region-local columns."""

    stripes: tuple  # stripe h -> tuple of part matrices
    sources: tuple = struct.field(pytree_node=False)  # h -> region ids
    stripe_rows: tuple = struct.field(pytree_node=False)  # h -> row count
    region_row_starts: tuple = struct.field(pytree_node=False)
    region_rows: tuple = struct.field(pytree_node=False)  # g -> row count
    width: int = struct.field(pytree_node=False)
    n_blocks: int = struct.field(pytree_node=False)
    n_rows: int = struct.field(pytree_node=False)
    cut: int = struct.field(pytree_node=False)
    padded_rows: int = struct.field(pytree_node=False)
    permutations: tuple = ()


def compile_region_plan(
    decomposition,
    width: int,
    n_blocks: int | None = None,
    k_hint: int = 16,
    region_rows: int | None = None,
    refine: str = "auto",
) -> RegionPlan:
    """Compile a decomposition into a :class:`RegionPlan`: merge all levels
    into one matrix in level-0 order (exactly the merged local plan's
    operator), optionally RCM-refine the merged layout
    (:func:`arrow_matrix_tpu.plan.refine.rcm_refine_merged` — on banded
    families it collapses the region grid to near-block-tridiagonal), then
    cut it into plateau-sized stripes x regions."""
    from arrow_matrix_tpu.io.graphio import as_csr
    from arrow_matrix_tpu.parallel.local import merge_levels_to_matrix
    from arrow_matrix_tpu.plan.compile import pad_permutation

    mats = [as_csr(d[0]) for d in decomposition]
    perms = [np.asarray(d[1], dtype=np.int64) for d in decomposition]
    n = mats[0].shape[0]
    q = n_blocks or max(1, -(-n // width))
    n_pad = q * width

    padded_perms = [pad_permutation(p, n_pad) for p in perms]
    inv_perm0 = np.argsort(padded_perms[0])
    Bt, cut = merge_levels_to_matrix(mats, padded_perms, inv_perm0, width, q)
    from arrow_matrix_tpu.plan.refine import rcm_refine_merged

    Bt, padded_perms, _ = rcm_refine_merged(Bt, padded_perms, refine)
    return region_plan_from_merged(
        Bt, cut, padded_perms, width, q, n, k_hint, region_rows
    )


def region_plan_from_merged(
    Bt,
    cut: int,
    padded_perms,
    width: int,
    q: int,
    n: int,
    k_hint: int = 16,
    region_rows: int | None = None,
) -> RegionPlan:
    """Build a :class:`RegionPlan` from an already-merged (and possibly
    refined) ``(cut, cut)`` operator in level-0 order."""
    n_pad = q * width
    R = region_rows or min(cut, DEFAULT_REGION_ROWS)
    n_regions = max(1, -(-cut // R))
    starts = [g * R for g in range(n_regions)]
    sizes = [min(R, cut - s) for s in starts]

    stripes, sources, stripe_rows = [], [], []
    for h in range(n_regions):
        h0, hn = starts[h], sizes[h]
        stripe = Bt[h0 : h0 + hn]
        parts, srcs = [], []
        for g in range(n_regions):
            g0, gn = starts[g], sizes[g]
            blk = stripe[:, g0 : g0 + gn]
            if blk.nnz == 0:
                continue
            mat = build_block_format(
                blk.tocsr(), k_hint, packed_slots_cap=PACKED_SLOTS_CAP
            )
            parts.append(mat)
            srcs.append(g)
        stripes.append(tuple(parts))
        sources.append(tuple(srcs))
        stripe_rows.append(hn)

    return RegionPlan(
        stripes=tuple(stripes),
        sources=tuple(sources),
        stripe_rows=tuple(stripe_rows),
        region_row_starts=tuple(starts),
        region_rows=tuple(sizes),
        width=width,
        n_blocks=q,
        n_rows=n,
        cut=cut,
        padded_rows=n_pad,
        permutations=tuple(padded_perms),
    )


def region_step(plan: RegionPlan, x: jnp.ndarray) -> jnp.ndarray:
    """One iteration ``X <- A X`` on a single device.

    :param x: (padded_rows, k) features in level-0 permuted order (the same
        layout as :func:`arrow_matrix_tpu.parallel.local.local_step`).
    """
    k = x.shape[1]
    # Materialize each column region as its own buffer: gathers from a lazy
    # slice fuse back into the full-feature source and fall off the cliff
    # (profiled); the explicit barriered copies are bandwidth-trivial.
    regions = tuple(
        x[s : s + r] for s, r in zip(plan.region_row_starts, plan.region_rows)
    )
    regions = jax.lax.optimization_barrier(regions)

    outs = []
    for parts, srcs, hn in zip(plan.stripes, plan.sources, plan.stripe_rows):
        y = None
        for mat, g in zip(parts, srcs):
            c = apply_mat(mat, regions[g], hn)
            y = c if y is None else y + c
        outs.append(y if y is not None else jnp.zeros((hn, k), x.dtype))
    c = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    pad = plan.padded_rows - plan.cut
    if pad:
        c = jnp.concatenate([c, jnp.zeros((pad, k), x.dtype)], axis=0)
    # Preserve the state dtype so iterated fori_loop carries stay stable
    # under a bf16 STATE (the BSR parts emit f32 partials).
    return c.astype(x.dtype)
