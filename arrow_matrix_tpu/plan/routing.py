"""Static permutation-routing tables between two block-partitioned orders.

The reference computes Alltoallv count/displacement tables plus send/receive
permutations at initialization time (reference: arrow/arrow_dec_mpi.py:210-281,
``_all_to_all_tables`` :325-367, ``_aggregation_permutation`` :369-384) and
issues ragged ``Ialltoallv`` per step. TPUs have no ragged collective, but the
counts are decomposition-time constants — so we pad every device pair to the
*static* maximum pairwise count ``M`` and express the whole exchange as one
fixed-shape ``lax.all_to_all`` plus static gathers:

* rows whose source and destination block coincide never enter the collective
  (the analogue of the reference asserting zero self-counts, reference:
  arrow_dec_mpi.py:245,273);
* rows beyond the destination level's nonzero cut are dropped entirely (the
  reference marks them with an overflow sentinel ``2*width*n_blocks[0]``,
  reference: arrow_dec_mpi.py:740-749);
* ALL data movement is expressed as gathers — send-side slot gathers plus
  receive-side assembly gathers from a concatenated [local ; received ; zero]
  buffer. TPU scatters serialize and would dominate the step; since the
  routing is injective and static, every scatter has a precomputed inverse
  gather.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RouteTables:
    """Routing of rows from a source order to a destination order, both
    partitioned into ``q`` blocks of ``width`` rows on the same device axis.

    Forward direction (features, level-0 -> level-i order):

    * ``send_idx``: int32 (q, q, M) — ``send_idx[s, d, m]`` = local row of
      source device s for slot m of its message to destination d
      (``width`` = padding -> zero row).
    * ``fwd_gather``: int32 (q, width) — per destination device d, the index
      of destination row r' in the concatenated buffer
      ``[x_local (width) ; recv (q*M) ; zero]``: a local source row, or
      ``width + s*M + m`` for the slot received from s, or the trailing zero
      row for unrouted rows.

    Backward direction (partial results, level-i -> level-0, reusing the same
    exchange reversed):

    * ``recv_idx``: int32 (q, q, M) — ``recv_idx[d, s, m]`` = local
      destination row of device d that forward-slot (s, m) filled; used as
      the backward send gather (``width`` = padding).
    * ``bwd_gather``: int32 (q, width) — per source device s, the index of
      its level-0 row r in ``[c_level_local (width) ; recv_back (q*M) ;
      zero]``: the local destination row when the pair stayed on-device,
      ``width + d*M + m`` when row r was forwarded to device d slot m, or
      the zero row when r was not routed.
    """

    send_idx: jnp.ndarray
    recv_idx: jnp.ndarray
    fwd_gather: jnp.ndarray
    bwd_gather: jnp.ndarray
    # Full destination->source position map (padded length n_blocks*width);
    # used by the single-device runner, unused by the distributed step.
    dst_to_src: jnp.ndarray
    width: int = struct.field(pytree_node=False)
    max_per_pair: int = struct.field(pytree_node=False)
    cut: int = struct.field(pytree_node=False)


def build_route_tables(
    dst_to_src: np.ndarray,
    width: int,
    n_blocks: int,
    cut: int | None = None,
    pad_multiple: int = 8,
) -> RouteTables:
    """Build :class:`RouteTables` from a position mapping.

    :param dst_to_src: int array of length ``n_blocks * width``;
        ``dst_to_src[p'] = p`` means destination row p' is source row p
        (e.g. ``g_i = argsort(perm_0)[perm_i]`` maps level-i positions to
        level-0 positions).
    :param cut: destination rows >= cut are dropped (level-i truncation to
        its nonzero blocks). Defaults to no dropping.
    :param pad_multiple: round the per-pair slot count M up to this multiple.
    """
    N = n_blocks * width
    dst_to_src = np.asarray(dst_to_src, dtype=np.int64)
    assert dst_to_src.size == N, (dst_to_src.size, N)
    if cut is None:
        cut = N
    p_dst = np.arange(cut, dtype=np.int64)
    p_src = dst_to_src[:cut]
    assert (p_src < N).all() and (p_src >= 0).all()

    src_dev, src_row = p_src // width, p_src % width
    dst_dev, dst_row = p_dst // width, p_dst % width
    local = src_dev == dst_dev

    rs, rd = src_dev[~local], dst_dev[~local]
    rsrow, rdrow = src_row[~local], dst_row[~local]
    # Stable order within each (s, d) pair: by destination position, so the
    # sender's slot m and receiver's slot m refer to the same row.
    order = np.lexsort((rdrow, rd, rs))
    rs, rd, rsrow, rdrow = rs[order], rd[order], rsrow[order], rdrow[order]

    pair_id = rs * n_blocks + rd
    counts = np.bincount(pair_id, minlength=n_blocks * n_blocks)
    M = int(counts.max()) if counts.size else 0
    M = max(1, -(-M // pad_multiple) * pad_multiple)
    zero_slot = width + n_blocks * M  # index of the trailing zero row

    send_idx = np.full((n_blocks, n_blocks, M), width, dtype=np.int32)
    recv_idx = np.full((n_blocks, n_blocks, M), width, dtype=np.int32)
    fwd_gather = np.full((n_blocks, width), zero_slot, dtype=np.int32)
    bwd_gather = np.full((n_blocks, width), zero_slot, dtype=np.int32)

    # Local pairs: direct indices on both directions.
    fwd_gather[dst_dev[local], dst_row[local]] = src_row[local]
    bwd_gather[src_dev[local], src_row[local]] = dst_row[local]

    if rs.size:
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        slot = np.arange(rs.size, dtype=np.int64) - starts[pair_id]
        send_idx[rs, rd, slot] = rsrow
        recv_idx[rd, rs, slot] = rdrow
        fwd_gather[rd, rdrow] = width + rs * M + slot
        bwd_gather[rs, rsrow] = width + rd * M + slot

    return RouteTables(
        send_idx=send_idx,
        recv_idx=recv_idx,
        fwd_gather=fwd_gather,
        bwd_gather=bwd_gather,
        dst_to_src=np.asarray(dst_to_src, dtype=np.int32),
        width=width,
        max_per_pair=M,
        cut=cut,
    )


def routed_rows_per_pair(rt: RouteTables) -> np.ndarray:
    """Diagnostics: actual (non-padding) rows per (src, dst) pair — padding
    efficiency of the static all_to_all."""
    send = np.asarray(rt.send_idx)
    return (send != rt.width).sum(axis=-1)


@struct.dataclass
class ExchangeRound:
    """One round of a round-decomposed exchange: a PARTIAL PERMUTATION over
    the device axis (each device sends to at most one destination and
    receives from at most one source), executed as a single
    ``lax.ppermute`` with static pairs and sized to the round's largest
    edge. Bytes move only on listed edges — pairs with no routed rows cost
    nothing, unlike the padded all_to_all where every (s, d) pair pays the
    global per-pair maximum (measured 2.4-6x padded/occupied skew on the
    bench graphs because most pairs are EMPTY: the level permutations are
    near-banded)."""

    #: int32 (D, Mr): per sending device, gather index into its send payload
    #: for slot m of this round's message (payload pad index = padding).
    send: jnp.ndarray
    #: static ((src, dst), ...) pairs of this round's partial permutation.
    perm: tuple = struct.field(pytree_node=False)
    #: static padded slot count Mr.
    m: int = struct.field(pytree_node=False)


def _color_rounds(counts: np.ndarray) -> list:
    """Greedy edge coloring of the nonzero (src, dst) pair multigraph into
    partial-permutation rounds, largest edges first (so each round's pad
    ``Mr`` is set by edges of similar size). Returns a list of rounds, each
    a list of ``(s, d, count)``. Greedy bipartite edge coloring can need up
    to ``2*maxdeg - 1`` rounds in the worst case (optimal is maxdeg by
    König's theorem); measured pair graphs color in a handful of rounds."""
    D = counts.shape[0]
    edges = sorted(
        ((int(counts[s, d]), s, d)
         for s in range(D) for d in range(D)
         if counts[s, d] > 0 and s != d),
        reverse=True,
    )
    rounds: list = []
    src_used: list = []
    dst_used: list = []
    for c, s, d in edges:
        for r, (su, du) in enumerate(zip(src_used, dst_used)):
            if s not in su and d not in du:
                rounds[r].append((s, d, c))
                su.add(s)
                du.add(d)
                break
        else:
            rounds.append([(s, d, c)])
            src_used.append({s})
            dst_used.append({d})
    return rounds


@struct.dataclass
class ShardedRouteTables:
    """Routing for the sharded-head step: block-0 rows of BOTH orders are
    sharded over all devices (``w_q`` rows each); block-j rows (j >= 1) live
    on the block-j device(s). Block-0 SOURCE rows are replicated on every
    device after the step's ``all_gather`` and are never sent — the receive
    side reads them from the local replica.

    With ``row_split = r > 1`` (the fat layout, parallel/fat.py) every block
    is further split by rows over r devices: ``D = q*r`` devices linearized
    HALF-major (device ``s = h*q + j`` holds rows ``[h*w_loc, (h+1)*w_loc)``
    of block j, ``w_loc = width // r``), and block 0 is sharded ``w_q =
    ceil(width / D)`` rows per device. Slim is the ``r = 1`` special case
    (``D = q``, ``w_loc = width``).

    Forward (features, level-0 -> level-i order):

    * ``fwd_send``: int32 (D, D, Mf) — ``fwd_send[s, d, m]`` = row of source
      device s's local block slice (``w_loc`` = padding) for slot m to d.
    * ``fwd_gather``: int32 (D, w_loc) — per device d, the buffer index of
      its level-i local block rows in
      ``[x_loc (w_loc) ; x0_full (w0 = D*w_q) ; recv (D*Mf) ; zero]``.
    * ``fwd0_gather``: int32 (D, w_q) — same buffer, for device d's SHARD of
      level-i block 0.

    Backward (partial results, level-i -> level-0 order): the per-device
    payload is ``[c_loc (w_loc) ; c0_shard (w_q) ; zero]``.

    * ``bwd_send``: int32 (D, D, Mb) — payload index for slot m from level-i
      owner dd to level-0 owner ss (``w_loc + w_q`` = padding).
    * ``bwd_gather``: int32 (D, w_loc) — per device s, the index of its
      level-0 local block rows in ``[payload (w_loc + w_q) ; recv (D*Mb) ;
      zero]``; unrouted rows read the zero row.
    * ``bwd0_gather``: int32 (D, w_q) — same buffer, for device s's shard of
      level-0 block 0.
    """

    fwd_send: jnp.ndarray
    fwd_gather: jnp.ndarray
    fwd0_gather: jnp.ndarray
    bwd_send: jnp.ndarray
    bwd_gather: jnp.ndarray
    bwd0_gather: jnp.ndarray
    width: int = struct.field(pytree_node=False)
    w_q: int = struct.field(pytree_node=False)
    max_fwd: int = struct.field(pytree_node=False)
    max_bwd: int = struct.field(pytree_node=False)
    cut: int = struct.field(pytree_node=False)
    row_split: int = struct.field(pytree_node=False, default=1)
    # Round-decomposed exchange (see :class:`ExchangeRound` and
    # :func:`to_round_exchange`). When ``rounds_mode`` is set the gather
    # tables above index the ROUNDS receive-buffer layout
    # ``[... ; recv_round_0 ; recv_round_1 ; ... ; zero]`` and the step
    # executes one ppermute per round instead of the padded all_to_all.
    fwd_rounds: tuple = ()
    bwd_rounds: tuple = ()
    rounds_mode: bool = struct.field(pytree_node=False, default=False)

    @property
    def w_loc(self) -> int:
        """Local block rows per device (= width in the slim layout)."""
        return self.width // self.row_split


def build_sharded_route_tables(
    dst_to_src: np.ndarray,
    width: int,
    n_blocks: int,
    cut: int | None = None,
    pad_multiple: int = 8,
    row_split: int = 1,
) -> ShardedRouteTables:
    """Build :class:`ShardedRouteTables` from a position mapping (same
    conventions as :func:`build_route_tables`). ``row_split = r > 1``
    builds the fat-layout tables over ``q*r`` half-major devices."""
    q = n_blocks
    N = q * width
    if width % row_split:
        raise ValueError(
            f"width {width} not divisible by row_split {row_split}"
        )
    w_loc = width // row_split
    D = q * row_split  # linear device count (half-major: s = h*q + j)
    w_q = -(-width // D)
    w0 = D * w_q
    dst_to_src = np.asarray(dst_to_src, dtype=np.int64)
    assert dst_to_src.size == N
    if cut is None:
        cut = N
    p_dst = np.arange(cut, dtype=np.int64)
    p_src = dst_to_src[:cut]
    assert (p_src < N).all() and (p_src >= 0).all()

    def owner(p):
        half = (p % width) // w_loc
        return np.where(p < width, p // w_q, half * q + p // width)

    def lrow(p):
        """Row of p within its owner's local block slice."""
        return (p % width) % w_loc

    src_own = owner(p_src)
    dst_own = owner(p_dst)
    src_in_b0 = p_src < width
    dst_in_b0 = p_dst < width

    # ---------------------------------------------------------- forward
    # Sent rows: src outside block 0 AND owners differ.
    f_remote = (~src_in_b0) & (src_own != dst_own)
    fs, fd = src_own[f_remote], dst_own[f_remote]
    f_srcrow = lrow(p_src[f_remote]).astype(np.int64)
    f_dstpos = p_dst[f_remote]
    order = np.lexsort((f_dstpos, fd, fs))
    fs, fd, f_srcrow, f_dstpos = fs[order], fd[order], f_srcrow[order], f_dstpos[order]
    pair = fs * D + fd
    counts = np.bincount(pair, minlength=D * D)
    Mf = int(counts.max()) if counts.size else 0
    Mf = max(1, -(-Mf // pad_multiple) * pad_multiple)

    fwd_send = np.full((D, D, Mf), w_loc, dtype=np.int32)
    fwd_zero = w_loc + w0 + D * Mf
    fwd_gather = np.full((D, w_loc), fwd_zero, dtype=np.int32)
    fwd0_gather = np.full((D, w_q), fwd_zero, dtype=np.int32)

    def fwd_set(dst_pos, value):
        """Write into fwd_gather/fwd0_gather at the receiver-local position
        of destination row dst_pos."""
        d = owner(dst_pos)
        b0 = dst_pos < width
        r_blk = lrow(dst_pos)
        r_shd = dst_pos - d * w_q
        fwd_gather[d[~b0], r_blk[~b0]] = value[~b0]
        fwd0_gather[d[b0], r_shd[b0]] = value[b0]

    # Replica reads: src in block 0 -> x0_full section at w_loc + p_src.
    rep = src_in_b0
    fwd_set(p_dst[rep], (w_loc + p_src[rep]).astype(np.int32))
    # Local reads: src outside block 0, same owner -> x_loc at its local row.
    loc = (~src_in_b0) & (src_own == dst_own)
    fwd_set(p_dst[loc], lrow(p_src[loc]).astype(np.int32))
    # Remote slots.
    if fs.size:
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        slot = np.arange(fs.size, dtype=np.int64) - starts[pair]
        fwd_send[fs, fd, slot] = f_srcrow
        fwd_set(f_dstpos, (w_loc + w0 + fs * Mf + slot).astype(np.int32))

    # ---------------------------------------------------------- backward
    # Every routed pair flows back: level-i owner (dd) -> level-0 owner (ss).
    b_remote = src_own != dst_own
    dd, ss = dst_own[b_remote], src_own[b_remote]
    b_dstpos = p_dst[b_remote]
    b_srcpos = p_src[b_remote]
    order = np.lexsort((b_srcpos, ss, dd))
    dd, ss, b_dstpos, b_srcpos = dd[order], ss[order], b_dstpos[order], b_srcpos[order]
    pair_b = dd * D + ss
    counts_b = np.bincount(pair_b, minlength=D * D)
    Mb = int(counts_b.max()) if counts_b.size else 0
    Mb = max(1, -(-Mb // pad_multiple) * pad_multiple)

    payload_pad = w_loc + w_q
    bwd_send = np.full((D, D, Mb), payload_pad, dtype=np.int32)
    bwd_zero = payload_pad + D * Mb
    bwd_gather = np.full((D, w_loc), bwd_zero, dtype=np.int32)
    bwd0_gather = np.full((D, w_q), bwd_zero, dtype=np.int32)

    def payload_index(dst_pos):
        """Index of level-i row dst_pos inside its owner's payload."""
        d = owner(dst_pos)
        return np.where(
            dst_pos < width, w_loc + (dst_pos - d * w_q), lrow(dst_pos)
        ).astype(np.int64)

    def bwd_set(src_pos, value):
        s = owner(src_pos)
        b0 = src_pos < width
        r_blk = lrow(src_pos)
        r_shd = src_pos - s * w_q
        bwd_gather[s[~b0], r_blk[~b0]] = value[~b0]
        bwd0_gather[s[b0], r_shd[b0]] = value[b0]

    # Local: level-i row's owner == level-0 row's owner.
    b_loc = ~b_remote
    bwd_set(p_src[b_loc], payload_index(p_dst[b_loc]).astype(np.int32))
    if dd.size:
        starts_b = np.concatenate(([0], np.cumsum(counts_b)))[:-1]
        slot_b = np.arange(dd.size, dtype=np.int64) - starts_b[pair_b]
        bwd_send[dd, ss, slot_b] = payload_index(b_dstpos)
        bwd_set(b_srcpos, (payload_pad + dd * Mb + slot_b).astype(np.int32))

    return ShardedRouteTables(
        fwd_send=fwd_send,
        fwd_gather=fwd_gather,
        fwd0_gather=fwd0_gather,
        bwd_send=bwd_send,
        bwd_gather=bwd_gather,
        bwd0_gather=bwd0_gather,
        width=width,
        w_q=w_q,
        max_fwd=Mf,
        max_bwd=Mb,
        cut=cut,
        row_split=row_split,
    )


def to_round_exchange(
    rt: ShardedRouteTables, pad_multiple: int = 8
) -> ShardedRouteTables:
    """Convert a padded-all_to_all :class:`ShardedRouteTables` into the
    ROUND-DECOMPOSED exchange: the nonzero (src, dst) pair graph is edge-
    colored into partial-permutation rounds (:func:`_color_rounds`), each
    executed as one ``lax.ppermute`` padded only to ITS largest edge.

    Rationale: ``lax.all_to_all`` must be uniform, so every device pays
    ``(D-1) * M`` rows with ``M`` the GLOBAL per-pair maximum — but the
    level permutations are near-banded, so most pairs are empty (measured:
    ba-200k level 1 has 27 of 56 pairs nonzero, grid-202k 10 of 72) and the
    padded volume runs 2.4-6x the occupied bytes. ppermute moves bytes only
    on listed edges. The trade is one collective LAUNCH per round (greedy
    coloring uses between maxdeg and 2*maxdeg-1 rounds, typically a
    handful on the measured pair graphs) instead of one all_to_all. This is the TPU answer to the reference's ragged
    ``Ialltoallv`` (reference: arrow/arrow_dec_mpi.py:462-505,572-610) while
    ``jax.lax.ragged_all_to_all`` lacks backend support (NOTES backlog #7).

    The returned tables carry rewritten ``fwd_gather``/``bwd_gather`` (and
    block-0 variants) indexing the rounds receive-buffer layout; the dense
    ``fwd_send``/``bwd_send`` stay for diagnostics/occupied accounting.
    """
    D = int(rt.fwd_send.shape[0])
    w_loc, w_q = rt.w_loc, rt.w_q
    w0 = D * w_q

    def convert(send, gathers, base, pad_value, M):
        """One direction. ``base``: buffer offset where the receive section
        starts; ``pad_value``: the send-payload padding index. Returns
        (rounds tuple, remapped gathers, total padded slots)."""
        send = np.asarray(send)
        counts = (send != pad_value).sum(axis=-1)
        np.fill_diagonal(counts, 0)
        rounds = []
        off_sd = np.full((D, D), -1, dtype=np.int64)
        off = 0
        for edges in _color_rounds(counts):
            mr = max(c for _, _, c in edges)
            mr = max(1, -(-mr // pad_multiple) * pad_multiple)
            send_r = np.full((D, mr), pad_value, dtype=np.int32)
            perm = []
            for s, d, c in edges:
                send_r[s, :c] = send[s, d, :c]
                perm.append((s, d))
                off_sd[s, d] = off
            rounds.append(
                ExchangeRound(send=send_r, perm=tuple(perm), m=mr)
            )
            off += mr
        old_zero = base + D * M
        new_gathers = []
        for g in gathers:
            g = np.asarray(g).copy()
            recv = (g >= base) & (g < old_zero)
            # Identify zero-row entries BEFORE remapping: when the total
            # round-padded slots exceed D*M, a remapped real slot can land
            # exactly on old_zero and a late zero-rewrite would clobber it
            # to the zero row (silent data loss — caught in review by a
            # 5-round D=4 coloring with off=40 > D*M=32).
            was_zero = g == old_zero
            di, ri = np.nonzero(recv)
            v = g[di, ri] - base
            s, m = v // M, v % M
            o = off_sd[s, di]
            assert (o >= 0).all(), "received slot from an uncolored pair"
            g[di, ri] = (base + o + m).astype(np.int32)
            g[was_zero] = base + off
            new_gathers.append(g)
        return tuple(rounds), new_gathers, off

    fwd_rounds, (fg, f0), _ = convert(
        rt.fwd_send, (rt.fwd_gather, rt.fwd0_gather),
        base=w_loc + w0, pad_value=w_loc, M=rt.max_fwd,
    )
    bwd_rounds, (bg, b0), _ = convert(
        rt.bwd_send, (rt.bwd_gather, rt.bwd0_gather),
        base=w_loc + w_q, pad_value=w_loc + w_q, M=rt.max_bwd,
    )
    return rt.replace(
        fwd_gather=fg,
        fwd0_gather=f0,
        bwd_gather=bg,
        bwd0_gather=b0,
        fwd_rounds=fwd_rounds,
        bwd_rounds=bwd_rounds,
        rounds_mode=True,
    )


def round_exchange_padded_rows(rt: ShardedRouteTables) -> int:
    """Max-over-devices padded rows a device SENDS per step under the
    rounds exchange (a device sends only in rounds where it owns an edge)."""
    sent = np.zeros(int(rt.fwd_send.shape[0]), dtype=np.int64)
    for rounds in (rt.fwd_rounds, rt.bwd_rounds):
        for r in rounds:
            for s, _ in r.perm:
                sent[s] += r.m
    return int(sent.max()) if sent.size else 0


def sharded_routed_rows_per_pair(
    rt: ShardedRouteTables,
) -> tuple[np.ndarray, np.ndarray]:
    """Diagnostics: actual rows per (src, dst) pair in the forward and
    backward exchanges."""
    fwd = (np.asarray(rt.fwd_send) != rt.w_loc).sum(axis=-1)
    bwd = (np.asarray(rt.bwd_send) != rt.w_loc + rt.w_q).sum(axis=-1)
    return fwd, bwd
