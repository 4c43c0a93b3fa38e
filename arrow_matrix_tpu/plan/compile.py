"""Decomposition → static execution plan compiler.

Replaces the reference's runtime scatter of CSR blocks and permutation slices
over MPI ranks (reference: arrow/arrow_dec_mpi.py:629-887
``load_decomposition_new`` + per-rank ``load_sparse_matrix_from_blocks``,
arrow/arrow_slim_mpi.py:298-326) with an ahead-of-time compiler: the ragged,
rank-by-rank distribution becomes one pytree of uniformly padded, device-axis
stacked tensors plus routing tables, which a single ``shard_map``-ed step
function consumes. Everything dynamic in the reference (block counts, ragged
all-to-all counts, nnz column lists) is static here — fixed by the
decomposition — which is exactly what XLA's compilation model wants.

Level folding: the reference assigns disjoint rank groups to each level of
the decomposition (sum_i q_i ranks, reference: arrow_dec_mpi.py:131-160),
leaving every group idle while other levels communicate. Here ALL levels are
folded onto one block axis of q = n_blocks[0] devices: device j holds block j
of every level, levels execute within one jit step, and XLA overlaps their
independent collectives. Per-device communication stays O(width · k) per
level, matching the reference's headline bound (reference: README.md:3).
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence

import numpy as np
from scipy import sparse

from flax import struct

from arrow_matrix_tpu.ops.bsr_pallas import (
    preferred_format_blocks,
    stack_bsr_from_csr,
)
from arrow_matrix_tpu.ops.formats import (
    ell_cost_rows,
    stack_compact_ells_from_csr,
    stack_ells_from_csr,
)
from arrow_matrix_tpu.plan.routing import (
    ShardedRouteTables,
    build_route_tables,
    build_sharded_route_tables,
)


@struct.dataclass
class LevelPlan:
    """Per-level, device-stacked arrow blocks (slim layout: device j holds the
    head-row panel block A_0j, the diagonal block A_jj and the head-column
    panel block A_j0, reference: arrow/arrow_slim_mpi.py:298-326; in banded
    mode additionally the sub/super-diagonal blocks A_j,j∓1, reference:
    arrow/arrow_mpi.py:438-474)."""

    # Each role is a device-stacked EllMat or BsrMat (one static format per
    # role, chosen by the calibrated cost model).
    head: object  # (q, ...) A_0j
    diag: object  # (q, ...) A_jj (device 0 entry empty)
    col: object  # (q, ...) A_j0 (device 0 entry empty)
    band_lo: Optional[object]  # (q, ...) A_j,j-1 for j >= 2, banded mode only
    band_hi: Optional[object]  # (q, ...) A_j,j+1 for 1 <= j <= q-2
    route: Optional[ShardedRouteTables]  # None for level 0
    n_active_blocks: int = struct.field(pytree_node=False)


@struct.dataclass
class ArrowPlan:
    levels: tuple  # tuple[LevelPlan, ...]
    width: int = struct.field(pytree_node=False)
    n_blocks: int = struct.field(pytree_node=False)  # q = mesh size
    n_rows: int = struct.field(pytree_node=False)  # original matrix dimension
    block_diagonal: bool = struct.field(pytree_node=False)
    # Fat layout: panels row-split over this many devices per block
    # (leaves stacked q*row_split half-major; see compile_plan).
    row_split: int = struct.field(pytree_node=False, default=1)
    # Padded per-level permutations (data leaves; used host-side for
    # distribute/collect, tiny on device).
    permutations: tuple = ()

    @property
    def padded_rows(self) -> int:
        return self.width * self.n_blocks

    def nnz(self) -> int:
        from arrow_matrix_tpu.ops.dispatch import format_nnz

        total = 0
        for lvl in self.levels:
            for m in (lvl.head, lvl.diag, lvl.col, lvl.band_lo, lvl.band_hi):
                total += format_nnz(m)
        return total


_T0 = time.time()


def _vlog(msg: str) -> None:
    """Compile progress log, enabled by ARROW_COMPILE_VERBOSE=1: wall since
    import + peak RSS per phase — the attribution tool for billion-nnz
    compiles (a 1.047B-nnz q=46 compile runs ~1 h; without phase logs an
    OOM there is unattributable)."""
    if os.environ.get("ARROW_COMPILE_VERBOSE", "") in ("", "0"):
        return
    import resource
    import sys

    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        f"[compile +{time.time() - _T0:7.1f}s rss={rss:6.2f}GB] {msg}",
        file=sys.stderr,
        flush=True,
    )


def _empty_csr(w: int) -> sparse.csr_matrix:
    return sparse.csr_matrix((w, w), dtype=np.float32)


def _csr_block(B: sparse.csr_matrix, w: int, bi: int, bj: int) -> sparse.csr_matrix:
    blk = B[bi * w : (bi + 1) * w, bj * w : (bj + 1) * w].tocsr()
    if blk.shape != (w, w):
        # Pad ragged trailing blocks to full width (reference pads indptr,
        # graphio.py:389-399).
        blk = sparse.csr_matrix(
            (blk.data, blk.indices, np.pad(blk.indptr, (0, w - blk.shape[0]), mode="edge")),
            shape=(w, w),
        )
    blk.sum_duplicates()
    blk.sort_indices()
    return blk


def number_of_blocks(B: sparse.csr_matrix, width: int) -> int:
    """Blocks needed to cover the leading nonzero rows/columns of a level
    (reference: arrow/arrow_dec_mpi.py:612-627 — the reference counts only
    trailing zero *rows*, assuming symmetry; we count rows and columns so the
    truncation is always sound)."""
    out_nnz = np.diff(B.indptr)
    in_nnz = np.bincount(B.indices, minlength=B.shape[0])
    nz = np.nonzero(out_nnz + in_nnz)[0]
    nonzero_rows = int(nz[-1]) + 1 if nz.size else 0
    return max(1, -(-nonzero_rows // width))


def localize_level_rows(
    B: sparse.csr_matrix,
    perm_i: np.ndarray,
    inv_perm0: np.ndarray,
    width: int,
) -> tuple[sparse.csr_matrix, np.ndarray]:
    """Re-order a deeper level's rows WITHIN each width-block so that the
    level->level-0 routing map is monotone inside every block.

    Rows of a block-diagonal arrow level can be permuted freely inside their
    block (the head/block structure only depends on block membership), and a
    monotone routing map turns the per-step routing gathers from random
    access into near-sequential access — measured ~5-10x faster on the TPU
    gather engine. Returns the relabeled matrix and permutation.
    """
    n_pad = B.shape[0]
    assert n_pad % width == 0
    d2s = inv_perm0[perm_i]
    order = np.argsort(d2s.reshape(-1, width), axis=1, kind="stable")
    pi = (order + np.arange(0, n_pad, width)[:, None]).reshape(-1)
    B2 = B[pi][:, pi].tocsr()
    B2.sum_duplicates()
    B2.sort_indices()
    return B2, perm_i[pi]


def pad_permutation(perm: np.ndarray, n_padded: int) -> np.ndarray:
    """Extend a permutation of [0, n) to [0, n_padded) with the identity on
    the padding range (reference: arrow/arrow_dec_mpi.py:703-714)."""
    perm = np.asarray(perm, dtype=np.int64)
    if perm.size < n_padded:
        perm = np.concatenate([perm, np.arange(perm.size, n_padded, dtype=np.int64)])
    assert perm.size == n_padded
    return perm


class RawLevel:
    """Per-level CSR blocks + routing, before format packing. ``head``,
    ``diag``, ``col``, ``band_lo``, ``band_hi`` are length-q lists of
    csr_matrix (empty where structurally zero). ``route`` holds the classic
    pairwise tables (blocked executor), ``route_sharded`` the sharded-head
    tables (distributed runner); both None for level 0."""

    def __init__(
        self,
        head,
        diag,
        col,
        band_lo,
        band_hi,
        route,
        route_sharded,
        n_active_blocks,
    ):
        self.head = head
        self.diag = diag
        self.col = col
        self.band_lo = band_lo
        self.band_hi = band_hi
        self.route = route
        self.route_sharded = route_sharded
        self.n_active_blocks = n_active_blocks


def _level_n_rows(m) -> int:
    if isinstance(m, tuple):
        return m[2].shape[0] - 1
    return m.shape[0]


def extract_levels(
    decomposition: Sequence,
    width: int,
    n_devices: int,
    block_diagonal: bool = True,
    routing_pad_multiple: int = 8,
    routes: tuple = ("classic", "sharded"),
    row_split: int = 1,
) -> tuple[list, tuple, int]:
    """Cut every level of a decomposition into arrow blocks and build the
    inter-level routing tables — the format-independent part of plan
    compilation (the reference's root-side block distribution,
    arrow/arrow_dec_mpi.py:629-887).

    OUT-OF-CORE: levels may be csr matrices or (data, indices, indptr)
    triplets of memory-mapped arrays (``load_decomposition_new`` with
    ``mem_map=True``). Each level is processed one width-row stripe at a
    time — block extraction, within-block row localization and the column
    relabeling all operate on the stripe — so peak host memory is
    O(level_nnz / q + n) instead of several copies of the full level
    (the reference's lazy block slices, arrow/common/graphio.py:409-495).

    Materializes every level's raw CSR blocks at once; billion-nnz plans
    should use :func:`iter_levels` (``compile_plan`` does), which yields one
    level at a time so raw blocks are freed as soon as they are packed.

    :return: (list of :class:`RawLevel`, padded permutations, n_rows).
    :raises ValueError: if a level's nonzeros fall outside the arrow block
        structure (head panels + diagonal ± band) or need more blocks than
        devices.
    """
    gen, padded_perms, n = iter_levels(
        decomposition, width, n_devices, block_diagonal,
        routing_pad_multiple, routes, row_split,
    )
    return list(gen), padded_perms, n


def iter_levels(
    decomposition: Sequence,
    width: int,
    n_devices: int,
    block_diagonal: bool = True,
    routing_pad_multiple: int = 8,
    routes: tuple = ("classic", "sharded"),
    row_split: int = 1,
):
    """Streaming variant of :func:`extract_levels`: returns
    ``(generator of RawLevel, padded permutations, n_rows)``. The generator
    extracts one level's blocks + routes per ``next()``, so a consumer that
    packs each level before advancing holds at most ONE level's raw CSR
    blocks alongside the packed output — the difference between the q=46
    billion-nnz plan compiling and the measured >123 GB OOM of the
    all-levels-at-once path (NOTES round-5 rehearsal)."""
    mats = [d[0] for d in decomposition]
    perms = [np.asarray(d[1], dtype=np.int64) for d in decomposition]
    n = _level_n_rows(mats[0])
    q = n_devices
    n_pad = q * width

    if n > n_pad:
        raise ValueError(
            f"matrix has {n} rows; {q} devices x width {width} covers only {n_pad}"
        )

    padded_perms = []
    for p in perms:
        if p.min(initial=np.iinfo(np.int64).max) > 0 and p.size and p.min() == 1:
            p = p - 1  # tolerate 1-based permutations (reference: arrow_dec_mpi.py:701-709)
        padded_perms.append(pad_permutation(p, n_pad))
    inv_perm0 = np.argsort(padded_perms[0])

    # Within-block row localization (deeper block-diagonal levels): reorder
    # rows inside each block so the level->level-0 map is monotone per
    # block; pi maps new position -> old position. Depends only on the
    # permutations, so it is hoisted out of the generator — padded_perms is
    # FINAL before the first level is extracted.
    pis = [None] * len(mats)
    for i in range(1, len(mats)):
        if block_diagonal:
            d2s = inv_perm0[padded_perms[i]]
            order = np.argsort(d2s.reshape(-1, width), axis=1, kind="stable")
            pi = (order + np.arange(0, n_pad, width)[:, None]).reshape(-1)
            pis[i] = pi
            padded_perms[i] = padded_perms[i][pi]

    gen = _gen_levels(
        mats, tuple(padded_perms), pis, inv_perm0, n, q, width, n_pad,
        block_diagonal, routing_pad_multiple, routes, row_split,
    )
    return gen, tuple(padded_perms), n


def _gen_levels(
    mats, padded_perms, pis, inv_perm0, n, q, width, n_pad,
    block_diagonal, routing_pad_multiple, routes, row_split,
):
    from arrow_matrix_tpu.io.graphio import (
        csr_nnz,
        load_row_stripe,
        triplet_in_degrees,
    )

    for i, B in enumerate(mats):
        n_i = _level_n_rows(B)
        if n_i != n:
            raise ValueError("all levels must share the vertex count")

        # Block count from streaming row/column occupancy (the localization
        # permutes rows only WITHIN their block, so counts by block are
        # invariant; reference: arrow_dec_mpi.py:612-627).
        if isinstance(B, tuple):
            out_nnz = np.diff(np.asarray(B[2], dtype=np.int64))
        else:
            out_nnz = np.diff(B.tocsr().indptr).astype(np.int64)
        in_nnz = triplet_in_degrees(B, n_i)
        occupancy = np.zeros(n_pad, dtype=np.int64)
        occupancy[:n_i] = out_nnz + in_nnz
        nz = np.nonzero(occupancy)[0]
        nonzero_rows = int(nz[-1]) + 1 if nz.size else 0
        q_i = min(max(1, -(-nonzero_rows // width)), q)

        pi = pis[i]
        inv_pi = np.argsort(pi) if pi is not None else None

        def stripe_blocks(j, wanted_cols):
            """Materialize stripe j (localized if pi is set) and slice it
            into its wanted column blocks; returns (dict col->csr, nnz)."""
            stripe = load_row_stripe(B, j * width, width, n_pad)
            if pi is not None:
                local = pi[j * width : (j + 1) * width] - j * width
                stripe = stripe[local]
                stripe = stripe.tocsr()
                stripe.indices = inv_pi[stripe.indices].astype(
                    stripe.indices.dtype
                )
                stripe.has_sorted_indices = False
                stripe.sort_indices()
            out = {}
            for c in wanted_cols:
                blk = stripe[:, c * width : (c + 1) * width].tocsr()
                blk.sum_duplicates()
                blk.sort_indices()
                out[c] = blk
            return out

        head_blocks, diag_blocks, col_blocks = [], [], []
        lo_blocks, hi_blocks = [], []
        covered = 0
        for j in range(q):
            if j >= q_i:
                head_blocks.append(_empty_csr(width))
                diag_blocks.append(_empty_csr(width))
                col_blocks.append(_empty_csr(width))
                lo_blocks.append(_empty_csr(width))
                hi_blocks.append(_empty_csr(width))
                continue
            if j == 0:
                blocks = stripe_blocks(0, range(q_i))
                head_blocks.extend(blocks[c] for c in range(q_i))
                diag_blocks.append(_empty_csr(width))
                col_blocks.append(_empty_csr(width))
                lo_blocks.append(_empty_csr(width))
                hi_blocks.append(_empty_csr(width))
                covered += sum(blocks[c].nnz for c in range(q_i))
                continue
            wanted = {0, j}
            if not block_diagonal:
                if j >= 2:
                    wanted.add(j - 1)
                if j < q_i - 1:
                    wanted.add(j + 1)
            blocks = stripe_blocks(j, sorted(wanted))
            db, cb = blocks[j], blocks[0]
            diag_blocks.append(db)
            col_blocks.append(cb)
            covered += db.nnz + cb.nnz
            if not block_diagonal:
                lb = blocks.get(j - 1, _empty_csr(width)) if j >= 2 else _empty_csr(width)
                ub = (
                    blocks.get(j + 1, _empty_csr(width))
                    if j < q_i - 1
                    else _empty_csr(width)
                )
                lo_blocks.append(lb)
                hi_blocks.append(ub)
                covered += lb.nnz + ub.nnz
            else:
                lo_blocks.append(_empty_csr(width))
                hi_blocks.append(_empty_csr(width))

        level_nnz = csr_nnz(B)
        if covered != level_nnz:
            raise ValueError(
                f"level {i}: {level_nnz - covered} nonzeros outside the arrow "
                f"block structure (width {width}, block_diagonal={block_diagonal}); "
                "re-decompose with a larger width or more levels"
            )
        _vlog(f"level {i}: blocks extracted (nnz={level_nnz}, q_i={q_i})")

        route = None
        route_sharded = None
        if i > 0:
            # Each table build is an O(n log n) lexsort; build only the
            # variant(s) the caller's executor consumes.
            dst_to_src = inv_perm0[padded_perms[i]]
            if "classic" in routes:
                route = build_route_tables(
                    dst_to_src,
                    width,
                    q,
                    cut=q_i * width,
                    pad_multiple=routing_pad_multiple,
                )
            if "sharded" in routes:
                route_sharded = build_sharded_route_tables(
                    dst_to_src,
                    width,
                    q,
                    cut=q_i * width,
                    pad_multiple=routing_pad_multiple,
                    row_split=row_split,
                )
        if i > 0:
            _vlog(f"level {i}: route tables built")

        banded = not block_diagonal
        yield RawLevel(
            head=head_blocks,
            diag=diag_blocks,
            col=col_blocks,
            band_lo=lo_blocks if banded else None,
            band_hi=hi_blocks if banded else None,
            route=route,
            route_sharded=route_sharded,
            n_active_blocks=q_i,
        )


def compile_plan(
    decomposition: Sequence,
    width: int,
    n_devices: int,
    block_diagonal: bool = True,
    slots_per_row: int | None = None,
    routing_pad_multiple: int = 8,
    k_hint: int = 16,
    force_format: str | None = None,
    row_split: int = 1,
    routing: str = "auto",
) -> ArrowPlan:
    """Compile a decomposition into an :class:`ArrowPlan` for a mesh with
    ``n_devices`` devices on the block axis.

    :param decomposition: list of (csr_matrix, permutation) or ArrowGraph.
    :param width: arrow width used for the decomposition (block size).
    :param n_devices: devices on the block axis; must cover level 0's blocks.
    :param row_split: split every block's panels by OUTPUT rows over this
        many extra mesh devices (the fat layout, ``q * row_split`` devices
        total) — the TPU-native generalization of the reference's 2q−1-rank
        fat layout (reference: arrow/arrow_mpi.py:26-93): per-device matrix
        and block-state bytes scale 1/row_split. Panels are stacked
        HALF-major (leaf ``s = h*q + j`` holds rows ``[h*w_loc, (h+1)*w_loc)``
        of block j's panels) to match :class:`parallel.fat.FatArrowSpmm`'s
        ``P(("half", "block"))`` shardings. Requires ``width % row_split == 0``.
    :param routing: inter-level exchange mode — ``"all_to_all"`` (one padded
        collective, every pair pays the global per-pair max),
        ``"rounds"`` (partial-permutation ppermute rounds, bytes only on
        real pairs — plan/routing.py:to_round_exchange), or ``"auto"``
        (rounds per level when they cut the padded send volume by >= 10%;
        the usual case, since the level permutations are near-banded and
        most pairs are empty).
    :raises ValueError: if a level's nonzeros fall outside the arrow block
        structure (head panels + diagonal ± band) or need more blocks than
        devices.
    """
    if row_split > 1 and width % row_split:
        raise ValueError(
            f"width {width} not divisible by row_split {row_split}"
        )
    # Streaming: each level's raw CSR blocks are packed into their device
    # formats and FREED before the next level is extracted (iter_levels) —
    # peak host memory is one level's blocks + the packed plan, not every
    # level's blocks at once.
    raw_levels, padded_perms, n = iter_levels(
        decomposition, width, n_devices, block_diagonal, routing_pad_multiple,
        routes=("sharded",), row_split=row_split,
    )

    def build_role(blocks):
        # One static format per role (identical per-device programs under
        # shard_map): Pallas BSR for dense-enough roles, windowed BSR for
        # banded roles beyond VMEM residency (production block widths, once
        # calibrated), else the cheaper of full-identity and row-compressed
        # ELL by the stacked (max-block) gathered-row cost — sparse
        # deep-level roles would otherwise pay width x R slots per device.
        from arrow_matrix_tpu.ops.bsr_pallas import stack_windowed_from_csr
        from arrow_matrix_tpu.ops.dispatch import stacked_windowed_or_none

        if force_format == "window":
            return stack_windowed_from_csr(blocks)
        if force_format is None:
            wm = stacked_windowed_or_none(blocks, k_hint)
            if wm is not None:
                return wm
        fmt = force_format or preferred_format_blocks(blocks, k_hint)
        if fmt == "bsr":
            return stack_bsr_from_csr(blocks)
        if force_format == "ell":
            return stack_ells_from_csr(blocks, slots_per_row)
        costs = [ell_cost_rows(b) for b in blocks]
        if max(c for _, c in costs) < max(f for f, _ in costs):
            return stack_compact_ells_from_csr(blocks, slots_per_row)
        return stack_ells_from_csr(blocks, slots_per_row)

    def split_rows(blocks):
        """(width, width) panels, length q -> (w_loc, width) row slices,
        length q*row_split, HALF-major (s = h*q + j)."""
        if row_split == 1:
            return blocks
        w_loc = width // row_split
        return [
            b[h * w_loc : (h + 1) * w_loc]
            for h in range(row_split)
            for b in blocks
        ]

    if routing not in ("all_to_all", "rounds", "auto"):
        raise ValueError(f"unknown routing mode {routing!r}")

    def pick_route(rt):
        """Apply the requested inter-level exchange mode to one level's
        tables (see the ``routing`` parameter)."""
        if rt is None or routing == "all_to_all":
            return rt
        from arrow_matrix_tpu.plan.routing import (
            round_exchange_padded_rows,
            to_round_exchange,
        )

        rr = to_round_exchange(rt, pad_multiple=routing_pad_multiple)
        if routing == "rounds":
            return rr
        D = int(rt.fwd_send.shape[0])
        a2a = (D - 1) * (rt.max_fwd + rt.max_bwd)
        return rr if round_exchange_padded_rows(rr) <= 0.9 * a2a else rt

    def packed_role(name, i, blocks):
        m = build_role(split_rows(blocks))
        _vlog(f"level {i}: role {name} packed ({type(m).__name__})")
        return m

    levels = []
    while True:
        raw = next(raw_levels, None)
        if raw is None:
            break
        i = len(levels)
        levels.append(
            LevelPlan(
                head=packed_role("head", i, raw.head),
                diag=packed_role("diag", i, raw.diag),
                col=packed_role("col", i, raw.col),
                band_lo=(
                    packed_role("band_lo", i, raw.band_lo)
                    if raw.band_lo is not None
                    else None
                ),
                band_hi=(
                    packed_role("band_hi", i, raw.band_hi)
                    if raw.band_hi is not None
                    else None
                ),
                route=pick_route(raw.route_sharded),
                n_active_blocks=raw.n_active_blocks,
            )
        )
        _vlog(f"level {i}: route picked, level packed")
        # Drop this level's raw CSR blocks BEFORE extracting the next level
        # (a for-loop would keep them alive through the next next()).
        del raw

    return ArrowPlan(
        levels=tuple(levels),
        width=width,
        n_blocks=n_devices,
        n_rows=n,
        block_diagonal=block_diagonal,
        permutations=tuple(padded_perms),
        row_split=row_split,
    )
