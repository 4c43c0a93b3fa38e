"""Routing-table unit tests (pure logic, no collectives) — the analogue of
the reference's ``test_all_to_all`` (reference: tests/test_arrowmpi.py:24-94):
reversed and shuffled permutations, overflow/truncation, self-row locality."""

import numpy as np

from arrow_matrix_tpu.plan.routing import build_route_tables, routed_rows_per_pair


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
