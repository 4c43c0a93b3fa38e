"""Single-device execution of an arrow decomposition (no collectives).

The distributed step in ``arrow_spmm.py`` partitions every level into
per-device blocks; on ONE chip that partitioning — and the level structure
itself — is pure communication machinery, so the default local plan merges
ALL levels into one matrix in level-0 order and the step is a single SpMM
(gather-ELL, Pallas BSR, or a hybrid tile-density split, chosen by the
calibrated cost model). A faithful level-by-level mirror remains available
for validating plan semantics — mirroring the reference's single-rank fast
paths (reference: arrow/arrow_dec_mpi.py:446-458, 1-rank ArrowSlimMPI).
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
from scipy import sparse

import jax
import jax.numpy as jnp
from flax import struct

from arrow_matrix_tpu.ops.bsr_pallas import (
    BsrMat,
    bsr_from_csr,
    preferred_format,
    split_by_tile_density,
    tile_density_stats,
)
from arrow_matrix_tpu.ops.dispatch import bsr_apply
from arrow_matrix_tpu.ops.ell import big_take, ell_spmm
from arrow_matrix_tpu.ops.formats import EllMat, ell_from_csr


@struct.dataclass
class LocalLevel:
    mat: Union[EllMat, BsrMat]
    # Hybrid mode: scattered remainder as ELL alongside a BSR `mat`.
    mat_sparse: Optional[EllMat]
    # Truncated destination->source map (cut,) into the padded feature rows;
    # None for level 0 (identity on [0, cut)).
    dst_to_src: Optional[jnp.ndarray]
    # Inverse map (padded_rows,): the level position holding each level-0
    # row's contribution, or ``cut`` (a zero row) when unrouted. The merge is
    # a gather through this table — TPU scatters serialize.
    src_to_dst: Optional[jnp.ndarray]
    cut: int = struct.field(pytree_node=False)
    fmt: str = struct.field(pytree_node=False)  # 'ell' | 'bsr' | 'hybrid'


@struct.dataclass
class LocalArrowPlan:
    levels: tuple
    width: int = struct.field(pytree_node=False)
    n_rows: int = struct.field(pytree_node=False)
    padded_rows: int = struct.field(pytree_node=False)
    # Real feature-column count when the state rides lane-padded to 128
    # columns (the windowed zero-copy fast path): with 0 < state_k < 128 the
    # kernels dot only the first state_k lanes and zero-fill the rest.
    # MEASURED NEGATIVE on v5e (round 4): narrowing the dot to 16 lanes is
    # SLOWER than the 128-lane dot (grid-202k 1.56 vs 1.48 ms, grid-1M 7.42
    # vs 6.76 — Mosaic gains nothing from narrow RHS widths and the flush
    # lane-split costs extra), so compile_single_chip leaves this 0; the
    # mechanism stays as an opt-in knob with tests.
    state_k: int = struct.field(pytree_node=False, default=0)
    permutations: tuple = ()


def merge_levels_to_matrix(mats, padded_perms, inv_perm0, width, q):
    """Sum all levels into ONE matrix in level-0 order
    (``sum_i P_rel_i^T B_i P_rel_i = P_0 A P_0^T``), truncated to the
    occupied block square. Returns ``(csr (cut, cut), cut)``.

    Each level is relabeled as a CSR transform (C-speed row gather +
    column relabel + per-row index sort) and the levels are summed with
    scipy's sorted-merge add — 4x faster than the previous global COO sort
    at 31M nonzeros (3.9s vs 15.3s measured)."""
    from arrow_matrix_tpu.plan.compile import number_of_blocks

    n_pad = q * width
    Btot = None
    for i, B in enumerate(mats):
        B = B.tocsr()
        # g maps level-i position -> level-0 position (injective).
        g = inv_perm0[padded_perms[i][: B.shape[0]]]
        order = np.argsort(g, kind="stable")
        Bp = B[order]
        counts = np.zeros(n_pad, dtype=np.int64)
        counts[g] = np.diff(B.indptr)
        indptr = np.concatenate(([0], np.cumsum(counts)))
        M = sparse.csr_matrix(
            (Bp.data, g[Bp.indices].astype(Bp.indices.dtype), indptr),
            shape=(n_pad, n_pad),
        )
        M.sort_indices()
        Btot = M if Btot is None else Btot + M
    Btot.sum_duplicates()
    cut = min(number_of_blocks(Btot, width), q) * width
    return Btot[:cut, :cut].tocsr(), cut


def compile_local_plan(
    decomposition,
    width: int,
    n_blocks: int | None = None,
    k_hint: int = 16,
    slots_per_row: int | None = None,
    force_format: str | None = None,
    block_diagonal: bool = True,
    merge_levels: bool = True,
    matrix_dtype=np.float32,
    refine: str = "auto",
) -> LocalArrowPlan:
    """Compile a decomposition for single-chip execution.

    With ``merge_levels`` (default): the permutations and level structure
    exist only to bound COMMUNICATION, and a single chip has none — so all
    levels are summed into ONE matrix in level-0 order
    (``sum_i P_rel_i^T B_i P_rel_i = P_0 A P_0^T``), keeping the level-0
    linearization's locality for the gather engine, with no routing at all.

    With ``merge_levels=False``: each level is one truncated (cut x cut)
    matrix in its own permuted order plus routing gathers — the faithful
    mirror of the distributed execution, useful for validating plan
    semantics (``cut`` is the reference's zero-block truncation,
    arrow_dec_mpi.py:728-731).

    ``refine``: merged-layout RCM refinement mode (``"never"`` | ``"auto"``
    | ``"always"``, see :func:`arrow_matrix_tpu.plan.refine.rcm_refine_merged`);
    only applies when ``merge_levels``.
    """
    from arrow_matrix_tpu.plan.compile import (
        localize_level_rows,
        number_of_blocks,
        pad_permutation,
    )

    from arrow_matrix_tpu.io.graphio import as_csr

    mats = [as_csr(d[0]) for d in decomposition]
    perms = [np.asarray(d[1], dtype=np.int64) for d in decomposition]
    n = mats[0].shape[0]
    q = n_blocks or max(1, -(-n // width))
    n_pad = q * width

    padded_perms = [pad_permutation(p, n_pad) for p in perms]
    inv_perm0 = np.argsort(padded_perms[0])

    if merge_levels:
        Bt, cut = merge_levels_to_matrix(
            mats, padded_perms, inv_perm0, width, q
        )
        from arrow_matrix_tpu.plan.refine import rcm_refine_merged

        Bt, padded_perms, _ = rcm_refine_merged(Bt, padded_perms, refine)
        return local_plan_from_merged(
            Bt, cut, padded_perms, width, q, n,
            k_hint=k_hint, slots_per_row=slots_per_row,
            force_format=force_format, matrix_dtype=matrix_dtype,
        )

    levels = []
    for i, B in enumerate(mats):
        if B.shape[0] < n_pad:
            B = sparse.csr_matrix(
                (B.data, B.indices, np.pad(B.indptr, (0, n_pad - B.shape[0]), mode="edge")),
                shape=(n_pad, n_pad),
            )
        if i > 0 and block_diagonal:
            B, padded_perms[i] = localize_level_rows(
                B, padded_perms[i], inv_perm0, width
            )
        q_i = min(number_of_blocks(B, width), q)
        cut = q_i * width
        Bt = B[:cut, :cut].tocsr()
        if Bt.nnz != B.nnz:
            raise ValueError(
                f"level {i}: {B.nnz - Bt.nnz} nonzeros outside the truncated "
                f"{q_i}-block square; decomposition inconsistent with width {width}"
            )
        fmt, mat, mat_sparse = _choose_format(
            Bt, k_hint, slots_per_row, force_format, matrix_dtype
        )
        dst_to_src = None
        src_to_dst = None
        if i > 0:
            d2s = inv_perm0[padded_perms[i][:cut]].astype(np.int64)
            s2d = np.full(n_pad, cut, dtype=np.int32)  # cut == zero row
            s2d[d2s] = np.arange(cut, dtype=np.int32)
            dst_to_src = jnp.asarray(d2s.astype(np.int32))
            src_to_dst = jnp.asarray(s2d)
        levels.append(
            LocalLevel(
                mat=mat,
                mat_sparse=mat_sparse,
                dst_to_src=dst_to_src,
                src_to_dst=src_to_dst,
                cut=cut,
                fmt=fmt,
            )
        )

    return LocalArrowPlan(
        levels=tuple(levels),
        width=width,
        n_rows=n,
        padded_rows=n_pad,
        permutations=tuple(padded_perms),
    )


def local_plan_from_merged(
    Bt,
    cut: int,
    padded_perms,
    width: int,
    q: int,
    n: int,
    k_hint: int = 16,
    slots_per_row: int | None = None,
    force_format: str | None = None,
    matrix_dtype=np.float32,
    window_tiles: int | None = None,
) -> LocalArrowPlan:
    """Build the merged :class:`LocalArrowPlan` from an already-merged (and
    possibly refined) ``(cut, cut)`` operator in level-0 order."""
    fmt, mat, mat_sparse = _choose_format(
        Bt, k_hint, slots_per_row, force_format, matrix_dtype,
        window_tiles=window_tiles,
    )
    return LocalArrowPlan(
        levels=(
            LocalLevel(
                mat=mat,
                mat_sparse=mat_sparse,
                dst_to_src=None,
                src_to_dst=None,
                cut=cut,
                fmt=fmt,
            ),
        ),
        width=width,
        n_rows=n,
        padded_rows=q * width,
        permutations=tuple(padded_perms),
    )


def windowed_merged_plan(
    Bt,
    cut: int,
    padded_perms,
    width: int,
    q: int,
    n: int,
    k_hint: int = 16,
    matrix_dtype="auto",
    window_tiles: int | None = None,
    min_padded: int = 0,
    wm=None,
) -> LocalArrowPlan | None:
    """Windowed merged plan with the zero-copy state height, or None when
    the calibrated gate rejects the operator.

    The state lives at the window-padded height (rounded to the kernel's
    program-group unit) so :func:`local_step`'s zero-copy fast path engages
    (identity-padded permutations keep the layout contract).
    ``min_padded`` forces a taller state — used by
    :class:`~arrow_matrix_tpu.parallel.operator.ArrowOperator` to align the
    forward and transpose plans on ONE state layout. ``wm`` passes an
    already-built windowed format (skips the gate probe and the pack — the
    pack does not depend on the padding)."""
    from arrow_matrix_tpu.ops.bsr_pallas import (
        resolve_tile_dtype,
        window_padded_rows,
    )
    from arrow_matrix_tpu.ops.dispatch import maybe_windowed
    from arrow_matrix_tpu.plan.compile import pad_permutation

    if wm is None:
        wm = maybe_windowed(
            Bt, k_hint, dtype=resolve_tile_dtype(matrix_dtype, Bt.data),
            window_tiles=window_tiles,
        )
    if wm is None:
        return None
    unit = wm.inner.rows_per_program * wm.inner.tile_m
    padded = max(min_padded, q * width, window_padded_rows(wm))
    padded = -(-padded // unit) * unit
    return LocalArrowPlan(
        levels=(
            LocalLevel(
                mat=wm,
                mat_sparse=None,
                dst_to_src=None,
                src_to_dst=None,
                cut=cut,
                fmt="window",
            ),
        ),
        width=width,
        n_rows=n,
        padded_rows=padded,
        permutations=tuple(
            pad_permutation(p, padded) for p in padded_perms
        ),
    )


def compile_single_chip(
    decomposition,
    width: int,
    n_blocks: int | None = None,
    k_hint: int = 16,
    refine: str = "auto",
    region_rows: int | None = None,
    matrix_dtype="auto",
    window_tiles: int | None = None,
    state_dtype=None,
):
    """Compile the best single-chip executor and return ``(plan, step_fn)``.

    Selection rule (measured on v5e): when the RCM refinement reveals banded
    structure (``applied``) on a matrix whose dense operand cannot be
    VMEM-resident (``cut`` above the BSR residency bound), the
    region-partitioned executor with VMEM-sized regions wins — every part's
    operand fits VMEM, so dense-enough parts run on the BSR/MXU path
    (grid-202k: 300 vs 193 M nnz/s; grid-1M: 271 vs 134). Otherwise the
    merged local plan is best (scattered families: region partitioning pays
    partial-sum traffic for nothing; small matrices: the merged format
    chooser already picks BSR directly).

    ``matrix_dtype``: BSR tile-payload dtype; the default ``"auto"`` uses
    bfloat16 for the HBM-streaming windowed format when every value is
    exactly bf16-representable (bit-identical results, half the tile DMA —
    see :func:`arrow_matrix_tpu.ops.bsr_pallas.resolve_tile_dtype`).

    ``state_dtype``: the ITERATION-state dtype the caller intends to run
    (the plan itself is dtype-generic). Declaring bfloat16 here picks the
    512-tile X window instead of the f32-regime 256 default when
    ``window_tiles`` is not forced: halving the state itemsize halves the
    VMEM double-buffer and the straddler residual shrinks, measured +3.8%
    at grid-1M bf16 (round-4 sweep, tools/probe_bf16_window_size.py).
    """
    from arrow_matrix_tpu.io.graphio import as_csr
    from arrow_matrix_tpu.plan.compile import pad_permutation
    from arrow_matrix_tpu.plan.refine import rcm_refine_merged
    from arrow_matrix_tpu.parallel.region import (
        BSR_REGION_ROWS,
        region_plan_from_merged,
        region_step,
    )

    if window_tiles is None and state_dtype is not None and (
        jnp.dtype(state_dtype) == jnp.bfloat16
    ):
        window_tiles = 512

    mats = [as_csr(d[0]) for d in decomposition]
    perms = [np.asarray(d[1], dtype=np.int64) for d in decomposition]
    n = mats[0].shape[0]
    q = n_blocks or max(1, -(-n // width))

    padded_perms = [pad_permutation(p, q * width) for p in perms]
    inv_perm0 = np.argsort(padded_perms[0])
    Bt, cut = merge_levels_to_matrix(mats, padded_perms, inv_perm0, width, q)
    Bt, padded_perms, applied = rcm_refine_merged(Bt, padded_perms, refine)

    if applied and cut > BSR_REGION_ROWS:
        # Once the windowed kernel is calibrated it supersedes the region
        # executor on banded operators (single launch, no region copies, no
        # partial-sum traffic). Probe the gate directly — building a full
        # merged plan just to inspect its chosen format would pay the whole
        # format build (windowed pack + ELL chunking over the merged nnz)
        # even when the region executor wins.
        plan = windowed_merged_plan(
            Bt, cut, padded_perms, width, q, n, k_hint=k_hint,
            matrix_dtype=matrix_dtype, window_tiles=window_tiles,
        )
        if plan is not None:
            return plan, local_step
        plan = region_plan_from_merged(
            Bt, cut, padded_perms, width, q, n,
            k_hint=k_hint, region_rows=region_rows or BSR_REGION_ROWS,
        )
        return plan, region_step
    plan = local_plan_from_merged(
        Bt, cut, padded_perms, width, q, n, k_hint=k_hint,
        matrix_dtype=matrix_dtype, window_tiles=window_tiles,
    )
    return plan, local_step


def _choose_format(Bt, k_hint, slots_per_row, force_format, dtype=np.float32,
                   window_tiles=None):
    """Pick 'ell', 'bsr', 'window', or 'hybrid' for a level matrix and build
    it. ``dtype`` sets the BSR tile payload: ``"auto"`` (resolve_tile_dtype)
    uses bfloat16 when it is LOSSLESS — every value exactly
    bf16-representable, so the upcast-before-dot kernels return
    bit-identical results with half the tile DMA stream. Explicit
    ``jnp.bfloat16`` also halves the ELL value traffic (values rounded;
    accumulation stays float32). Measured on v5e round 2: bf16 payloads do
    NOT speed up the dense VMEM-resident regimes (the MXU's
    HIGHEST-precision passes dominate, not the tile stream) — the win is
    the HBM-streaming windowed path."""
    from arrow_matrix_tpu.ops.bsr_pallas import (
        resolve_tile_dtype,
        windowed_bsr_from_csr,
    )
    from arrow_matrix_tpu.ops.dispatch import maybe_windowed

    tile_dtype = resolve_tile_dtype(dtype, Bt.data)
    # Under "auto" only the HBM-STREAMING windowed payloads switch: resident
    # BSR re-streams tiles from VMEM (bf16 measured neutral there, round 2)
    # and ELL value traffic is minor next to the gathered rows (512 B/row
    # regardless of k) — nothing to win, so both stay f32 unless the caller
    # asks explicitly.
    explicit = np.float32 if isinstance(dtype, str) else (dtype or np.float32)
    ell_dtype = resident_dtype = explicit
    if force_format == "window":
        return "window", windowed_bsr_from_csr(Bt, dtype=tile_dtype), None
    if force_format is None:
        # Calibrated windowed kernel beats both the gather floor and the
        # streaming kernel on banded operators beyond VMEM residency
        # (gate in ops.dispatch.maybe_windowed).
        wm = maybe_windowed(Bt, k_hint, dtype=tile_dtype,
                            window_tiles=window_tiles)
        if wm is not None:
            return "window", wm, None
    fmt = force_format or preferred_format(Bt, k_hint)
    if fmt == "ell" and force_format is None:
        # Mixed structure: peel dense tiles onto the MXU when they hold a
        # meaningful share of the nonzeros — but ONLY when the dense part
        # can run the RESIDENT kernel. With the streaming kernel calibrated
        # (round 3) preferred_format also answers "bsr" for VMEM-infeasible
        # peels, where hybrid measured 2x SLOWER than pure gather-ELL on
        # BA-200k (12.66 vs 6.63 ms): the per-tile X re-streams plus the
        # extra combine pass eat the win the model predicted.
        import arrow_matrix_tpu.ops.tiling as _tiling
        from arrow_matrix_tpu.ops.tiling import vmem_resident_bytes

        dense, rest = split_by_tile_density(Bt)
        if (
            dense.nnz >= max(16384, Bt.nnz // 8)
            and vmem_resident_bytes(
                -(-Bt.shape[1] // 128) * 128, min(k_hint, 128)
            )
            <= _tiling.DEFAULT_VMEM_BUDGET
            and preferred_format(dense, k_hint) == "bsr"
        ):
            return (
                "hybrid",
                bsr_from_csr(dense, dtype=resident_dtype),
                ell_from_csr(rest, slots_per_row, dtype=ell_dtype),
            )
    if fmt == "bsr":
        return fmt, bsr_from_csr(Bt, dtype=resident_dtype), None
    return "ell", ell_from_csr(Bt, slots_per_row, dtype=ell_dtype), None


def state_cols(plan, k: int) -> int:
    """Feature-axis width of the iteration state for a merged plan.

    The windowed fast path runs the state at the full 128-lane physical
    width: an f32 ``(N, k<=128)`` array is ALREADY lane-padded to 128 on
    TPU, so the wider logical state costs zero extra bytes while removing
    the per-step logical lane pads the streaming kernel's manual DMA needs
    (measured 2 x 1.56 ms per step at 1M rows). Callers zero-fill columns
    beyond k; ``A @ 0 == 0`` keeps them zero across iterations."""
    if (
        isinstance(plan, LocalArrowPlan)
        and len(plan.levels) == 1
        and plan.levels[0].fmt == "window"
        and k <= 128
    ):
        return 128
    return k


def _apply(lvl: LocalLevel, x_lvl: jnp.ndarray) -> jnp.ndarray:
    if lvl.fmt == "window":
        from arrow_matrix_tpu.ops.dispatch import windowed_apply

        return windowed_apply(lvl.mat, x_lvl, lvl.cut)
    if lvl.fmt == "bsr":
        return bsr_apply(lvl.mat, x_lvl, lvl.cut)
    if lvl.fmt == "hybrid":
        return bsr_apply(lvl.mat, x_lvl, lvl.cut) + ell_spmm(lvl.mat_sparse, x_lvl)
    return ell_spmm(lvl.mat, x_lvl)


def local_step(plan: LocalArrowPlan, x: jnp.ndarray) -> jnp.ndarray:
    """One iteration ``X <- A X`` on a single device.

    :param x: (padded_rows, k) features in level-0 permuted order.
    """
    k = x.shape[1]
    lvl0 = plan.levels[0]
    if len(plan.levels) == 1 and lvl0.fmt == "window" and k <= 128:
        from arrow_matrix_tpu.ops.bsr_pallas import (
            bsr_spmm_window,
            window_padded_rows,
        )

        unit = lvl0.mat.inner.rows_per_program * lvl0.mat.inner.tile_m
        if (
            x.shape[0] == plan.padded_rows
            and x.shape[0] >= window_padded_rows(lvl0.mat)
            and x.shape[0] % unit == 0
        ):
            # Zero-copy fast path for the merged windowed plan: the state
            # lives at the window-padded height (compile_single_chip sets
            # padded_rows accordingly), the kernel consumes it directly AND
            # emits the state height (out_rows), so the step has no
            # full-size plumbing copies at all. The generic path below
            # costs three extra full-size copies per step (operand pad +
            # output slice + result pad — ~5ms of a 15ms step at 1M rows,
            # profiled in tools/profile_window.py). state_k narrows the
            # dots to the real feature count (lanes beyond it are zero by
            # the state contract and stay zero).
            kr = plan.state_k if 0 < plan.state_k < k else None
            raw = bsr_spmm_window(
                lvl0.mat, x, raw=True, out_rows=plan.padded_rows, k_real=kr
            )
            return raw.astype(x.dtype)
    c0 = _apply(lvl0, x[: lvl0.cut])
    pad0 = plan.padded_rows - lvl0.cut
    c = (
        jnp.concatenate([c0, jnp.zeros((pad0, k), x.dtype)], axis=0)
        if pad0
        else c0
    )
    for lvl in plan.levels[1:]:
        x_lvl = big_take(x, lvl.dst_to_src)
        c_lvl = _apply(lvl, x_lvl)
        # Gather-based merge: level position of each level-0 row (or the
        # appended zero row for unrouted rows). The barrier materializes the
        # concat so the gather reads a plain contiguous source (profiled).
        c_pad = jnp.concatenate([c_lvl, jnp.zeros((1, k), x.dtype)], axis=0)
        (c_pad,) = jax.lax.optimization_barrier((c_pad,))
        c = c + big_take(c_pad, lvl.src_to_dst)
    # Preserve the state dtype so iterated fori_loop carries stay stable
    # under a bf16 STATE (the bsr/hybrid branches emit f32 partials).
    return c.astype(x.dtype)
