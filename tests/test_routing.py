"""Routing-table unit tests (pure logic, no collectives) — the analogue of
the reference's ``test_all_to_all`` (reference: tests/test_arrowmpi.py:24-94):
reversed and shuffled permutations, overflow/truncation, self-row locality."""

import numpy as np
import pytest

from arrow_matrix_tpu.plan.routing import (
    build_route_tables,
    build_sharded_route_tables,
    routed_rows_per_pair,
    sharded_routed_rows_per_pair,
)


def _simulate_route(rt, x_blocks):
    """Host-side simulation of the gather-only forward routing, mirroring
    the runtime assembly: send gathers + all_to_all + fwd_gather."""
    q, w = len(x_blocks), rt.width
    k = x_blocks[0].shape[1]
    M = rt.max_per_pair
    send = np.asarray(rt.send_idx)
    recv_idx = np.asarray(rt.recv_idx)
    fwd = np.asarray(rt.fwd_gather)
    # Send phase: device s builds (q, M, k) from its zero-extended x.
    sendbufs = []
    for s in range(q):
        xp = np.vstack([x_blocks[s], np.zeros((1, k), dtype=x_blocks[0].dtype)])
        sendbufs.append(xp[send[s]])
        for d in range(q):
            for m in range(M):
                assert (send[s, d, m] == w) == (recv_idx[d, s, m] == w), (
                    "send/recv padding must agree"
                )
    out = []
    for d in range(q):
        recv = np.stack([sendbufs[s][d] for s in range(q)])  # all_to_all
        buf = np.vstack(
            [x_blocks[d], recv.reshape(-1, k), np.zeros((1, k), x_blocks[0].dtype)]
        )
        out.append(buf[fwd[d]])
    return out


def _check_permutation(perm, width, q, cut=None):
    N = q * width
    x = np.arange(N, dtype=np.float32).reshape(N, 1) + 1.0
    x_blocks = [x[j * width : (j + 1) * width] for j in range(q)]
    rt = build_route_tables(perm, width, q, cut=cut)
    out = np.vstack(_simulate_route(rt, x_blocks))
    expected = np.zeros_like(x)
    c = cut if cut is not None else N
    expected[:c] = x[perm[:c]]
    np.testing.assert_array_equal(out[:c], expected[:c])
    return rt


def test_identity_is_all_local():
    rt = _check_permutation(np.arange(32), width=8, q=4)
    assert routed_rows_per_pair(rt).sum() == 0  # nothing over the wire


def test_reversed_permutation():
    _check_permutation(np.arange(32)[::-1].copy(), width=8, q=4)


def test_shuffled_permutation():
    rng = np.random.default_rng(0)
    perm = rng.permutation(64)
    _check_permutation(perm, width=8, q=8)


def test_truncated_destination():
    """Rows beyond the cut are dropped — the reference's overflow-sentinel
    semantics (reference: arrow_dec_mpi.py:740-749)."""
    rng = np.random.default_rng(1)
    perm = rng.permutation(64)
    rt = _check_permutation(perm, width=8, q=8, cut=16)
    # No sends target dropped destinations: every routed row's slot count
    # is bounded by the cut.
    assert routed_rows_per_pair(rt).sum() <= 16


def test_block_swap_counts():
    """Swapping two blocks routes exactly width rows each way."""
    width, q = 8, 4
    perm = np.arange(q * width)
    perm[0:width], perm[width : 2 * width] = (
        np.arange(width, 2 * width),
        np.arange(0, width),
    )
    rt = _check_permutation(perm, width, q)
    counts = routed_rows_per_pair(rt)
    assert counts[0, 1] == width and counts[1, 0] == width
    assert counts.sum() == 2 * width


# --------------------------------------------------- sharded-head tables


def _simulate_sharded(rt, q, x):
    """Host-side simulation of the sharded-head forward AND backward routing:
    per-device buffers exactly as the runtime assembles them. ``x`` is the
    (q*width, k) level-0-ordered features; returns (x_level_full, recovered)
    where recovered re-applies the backward direction to the forwarded rows
    and must reproduce the forward routing's row placement."""
    w, w_q = rt.width, rt.w_q
    w0 = q * w_q
    Mf, Mb = rt.max_fwd, rt.max_bwd
    k = x.shape[1]
    # Device-local level-0 state.
    x0_pad = np.zeros((w0, k), x.dtype)
    x0_pad[:w] = x[:w]
    x_loc = [
        x[j * w : (j + 1) * w] if j >= 1 else np.zeros((w, k), x.dtype)
        for j in range(q)
    ]
    x0_full = x0_pad  # replicated after the all_gather

    fwd_send = np.asarray(rt.fwd_send)
    sendbufs = []
    for s in range(q):
        xp = np.vstack([x_loc[s], np.zeros((1, k), x.dtype)])
        sendbufs.append(xp[fwd_send[s]])  # (q, Mf, k)
    x_i_loc, x_i0_shard = [], []
    for d in range(q):
        recv = np.stack([sendbufs[s][d] for s in range(q)])
        buf = np.vstack(
            [x_loc[d], x0_full, recv.reshape(-1, k), np.zeros((1, k), x.dtype)]
        )
        x_i_loc.append(buf[np.asarray(rt.fwd_gather)[d]])
        x_i0_shard.append(buf[np.asarray(rt.fwd0_gather)[d]])

    # Assemble the level-order features: block 0 from the shards, block j
    # from device j.
    x_level = np.vstack([np.vstack(x_i0_shard)[:w]] + x_i_loc[1:])

    # Backward: route the level-order rows straight back (no SpMM) and check
    # they land on their source rows.
    bwd_send = np.asarray(rt.bwd_send)
    payloads = []
    for dd in range(q):
        payload = np.vstack(
            [x_i_loc[dd], x_i0_shard[dd], np.zeros((1, k), x.dtype)]
        )
        payloads.append(payload[bwd_send[dd]])  # (q, Mb, k)
    back_loc, back0 = [], []
    for ss in range(q):
        recv_b = np.stack([payloads[dd][ss] for dd in range(q)])
        payload_ss = np.vstack([x_i_loc[ss], x_i0_shard[ss]])
        buf = np.vstack(
            [payload_ss, recv_b.reshape(-1, k), np.zeros((1, k), x.dtype)]
        )
        back_loc.append(buf[np.asarray(rt.bwd_gather)[ss]])
        back0.append(buf[np.asarray(rt.bwd0_gather)[ss]])
    recovered = np.vstack([np.vstack(back0)[:w]] + back_loc[1:])
    return x_level, recovered


@pytest.mark.parametrize(
    "width,q,cut_blocks,seed",
    [(8, 4, None, 0), (8, 4, 2, 1), (12, 8, 3, 2), (7, 3, None, 3), (16, 1, None, 4)],
)
def test_sharded_route_roundtrip(width, q, cut_blocks, seed):
    N = q * width
    rng = np.random.default_rng(seed)
    perm = rng.permutation(N).astype(np.int64)
    cut = cut_blocks * width if cut_blocks else None
    rt = build_sharded_route_tables(perm, width, q, cut=cut)
    x = (np.arange(N, dtype=np.float32).reshape(N, 1) + 1.0) @ np.ones((1, 3), np.float32)
    x_level, recovered = _simulate_sharded(rt, q, x)
    c = cut if cut is not None else N
    np.testing.assert_array_equal(x_level[:c], x[perm[:c]])
    # Backward: every forward-routed value returns to its level-0 source row.
    expected = np.zeros_like(x)
    expected[perm[:c]] = x[perm[:c]]
    np.testing.assert_array_equal(recovered, expected)


def test_sharded_block0_sources_never_sent():
    """Rows whose SOURCE lies in block 0 are read from the all_gather replica
    and must not occupy forward all_to_all slots."""
    width, q = 8, 4
    N = q * width
    # Move block 0 entirely into block 2's destination range.
    perm = np.arange(N)
    perm[2 * width : 3 * width] = np.arange(width)
    perm[:width] = np.arange(2 * width, 3 * width)
    rt = build_sharded_route_tables(perm, width, q)
    fwd, bwd = sharded_routed_rows_per_pair(rt)
    # Forward: only block-2 rows (now destined for block-0 shards) travel.
    assert fwd.sum() == width - width // q  # shard owner 2 keeps its own share
    # Backward includes the block-0-sourced rows' return paths.
    assert bwd.sum() >= width


# --------------------------------------------------- round-decomposed exchange


def _simulate_sharded_rounds(rt, q, x):
    """Rounds-mode twin of :func:`_simulate_sharded`: executes the per-round
    partial-permutation ppermutes against the rounds receive-buffer layout."""
    w, w_q = rt.width, rt.w_q
    k = x.shape[1]
    w0 = q * w_q
    x0_pad = np.zeros((w0, k), x.dtype)
    x0_pad[:w] = x[:w]
    x_loc = [
        x[j * w : (j + 1) * w] if j >= 1 else np.zeros((w, k), x.dtype)
        for j in range(q)
    ]

    def run_rounds(rounds, payloads):
        """payloads[s]: send source per device INCLUDING its pad row at the
        send table's pad index. Returns per-device concatenated recvs."""
        recvs = [[] for _ in range(q)]
        for rd in rounds:
            send = np.asarray(rd.send)
            perm = dict(rd.perm)  # src -> dst
            incoming = {d: s for s, d in rd.perm}
            for d in range(q):
                if d in incoming:
                    s = incoming[d]
                    recvs[d].append(payloads[s][send[s]])
                else:
                    recvs[d].append(np.zeros((rd.m, k), x.dtype))
        return [
            np.vstack(r) if r else np.zeros((0, k), x.dtype) for r in recvs
        ]

    xps = [np.vstack([x_loc[s], np.zeros((1, k), x.dtype)]) for s in range(q)]
    frecv = run_rounds(rt.fwd_rounds, xps)
    x_i_loc, x_i0_shard = [], []
    for d in range(q):
        buf = np.vstack(
            [x_loc[d], x0_pad, frecv[d], np.zeros((1, k), x.dtype)]
        )
        x_i_loc.append(buf[np.asarray(rt.fwd_gather)[d]])
        x_i0_shard.append(buf[np.asarray(rt.fwd0_gather)[d]])
    x_level = np.vstack([np.vstack(x_i0_shard)[:w]] + x_i_loc[1:])

    payloads = [
        np.vstack([x_i_loc[dd], x_i0_shard[dd], np.zeros((1, k), x.dtype)])
        for dd in range(q)
    ]
    brecv = run_rounds(rt.bwd_rounds, payloads)
    back_loc, back0 = [], []
    for ss in range(q):
        buf = np.vstack(
            [payloads[ss][:-1], brecv[ss], np.zeros((1, k), x.dtype)]
        )
        back_loc.append(buf[np.asarray(rt.bwd_gather)[ss]])
        back0.append(buf[np.asarray(rt.bwd0_gather)[ss]])
    recovered = np.vstack([np.vstack(back0)[:w]] + back_loc[1:])
    return x_level, recovered


@pytest.mark.parametrize(
    "width,q,cut_blocks,seed",
    [(8, 4, None, 0), (8, 4, 2, 1), (12, 8, 3, 2), (7, 3, None, 3)],
)
def test_round_exchange_roundtrip(width, q, cut_blocks, seed):
    """Rounds-mode exchange reproduces the dense exchange exactly."""
    from arrow_matrix_tpu.plan.routing import to_round_exchange

    N = q * width
    rng = np.random.default_rng(seed)
    perm = rng.permutation(N).astype(np.int64)
    cut = cut_blocks * width if cut_blocks else None
    rt = build_sharded_route_tables(perm, width, q, cut=cut)
    rr = to_round_exchange(rt)
    assert rr.rounds_mode
    x = (np.arange(N, dtype=np.float32).reshape(N, 1) + 1.0) @ np.ones(
        (1, 3), np.float32
    )
    dense_level, dense_rec = _simulate_sharded(rt, q, x)
    round_level, round_rec = _simulate_sharded_rounds(rr, q, x)
    np.testing.assert_array_equal(round_level, dense_level)
    np.testing.assert_array_equal(round_rec, dense_rec)


def test_round_exchange_coloring_and_volume():
    """Each round is a partial permutation, every nonzero pair appears in
    exactly one round with enough slots, and the rounds exchange never pads
    more than the dense all_to_all."""
    from arrow_matrix_tpu.plan.routing import (
        round_exchange_padded_rows,
        to_round_exchange,
    )

    width, q = 12, 8
    N = q * width
    perm = np.random.default_rng(7).permutation(N).astype(np.int64)
    rt = build_sharded_route_tables(perm, width, q)
    rr = to_round_exchange(rt)
    fwd_counts, bwd_counts = sharded_routed_rows_per_pair(rt)
    for rounds, counts, pad in (
        (rr.fwd_rounds, fwd_counts, rt.w_loc),
        (rr.bwd_rounds, bwd_counts, rt.w_loc + rt.w_q),
    ):
        seen = set()
        for rd in rounds:
            srcs = [s for s, _ in rd.perm]
            dsts = [d for _, d in rd.perm]
            assert len(set(srcs)) == len(srcs)  # partial permutation
            assert len(set(dsts)) == len(dsts)
            for s, d in rd.perm:
                assert (s, d) not in seen
                seen.add((s, d))
                c = int(counts[s, d])
                assert c <= rd.m
                # Real slots sit in the first c positions.
                send = np.asarray(rd.send)
                assert (send[s, :c] != pad).all()
                assert (send[s, c:] == pad).all()
        nz = {(s, d) for s in range(q) for d in range(q)
              if s != d and counts[s, d] > 0}
        assert seen == nz
    a2a = (q - 1) * (rt.max_fwd + rt.max_bwd)
    assert round_exchange_padded_rows(rr) <= a2a


def test_round_exchange_overflow_total_slots(monkeypatch):
    """When total round-padded slots exceed the dense D*M receive size, a
    remapped real slot can land exactly on the OLD zero index — the zero
    rewrite must not clobber it (regression: the zero mask is computed
    before the recv remap). Forced by a pathological one-edge-per-round
    coloring."""
    import arrow_matrix_tpu.plan.routing as routing_mod
    from arrow_matrix_tpu.plan.routing import to_round_exchange

    width, q = 8, 4
    N = q * width
    perm = np.random.default_rng(11).permutation(N).astype(np.int64)
    rt = build_sharded_route_tables(perm, width, q)

    orig = routing_mod._color_rounds
    monkeypatch.setattr(
        routing_mod, "_color_rounds",
        lambda counts: [[e] for r in orig(counts) for e in r],
    )
    rr = to_round_exchange(rt)
    total = sum(r.m for r in rr.fwd_rounds)
    assert total > q * rt.max_fwd, "fixture must exercise the overflow"
    x = (np.arange(N, dtype=np.float32).reshape(N, 1) + 1.0) @ np.ones(
        (1, 2), np.float32
    )
    dense_level, dense_rec = _simulate_sharded(rt, q, x)
    round_level, round_rec = _simulate_sharded_rounds(rr, q, x)
    np.testing.assert_array_equal(round_level, dense_level)
    np.testing.assert_array_equal(round_rec, dense_rec)
