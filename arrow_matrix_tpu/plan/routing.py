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
