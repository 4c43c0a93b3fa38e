"""Communication-volume accounting and the arrow-vs-1.5D comparison gate.

The reference's headline claim: per-rank communication O(width * k),
polynomially less than dense-style algorithms for planar / minor-excluded
graph families (reference: README.md:3). These tests compute exact
per-device bytes from the compiled plans and assert the arrow program beats
the rebuilt 1.5D baseline on a planar grid — and that arrow's volume stays
~flat as the problem and device count grow with width fixed, while 1.5D's
grows."""

import numpy as np
import pytest

from arrow_matrix_tpu.baselines.spmm_15d import replication_factor
from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import grid_graph
from arrow_matrix_tpu.plan import compile_plan
from arrow_matrix_tpu.plan.comm import arrow_comm_volume, spmm_15d_comm_volume


def _volumes(side, q, k=16):
    A = grid_graph(side)
    n = A.shape[0]
    w = -(-n // q)
    d = arrow_decomposition(
        A, w, max_number_of_levels=100, block_diagonal=True, seed=0
    )
    plan = compile_plan(d, w, q)
    av = arrow_comm_volume(plan, k)
    c = replication_factor(q)
    bv = spmm_15d_comm_volume(n, n, k, q // c, c)
    return av, bv


@pytest.mark.parametrize("q", [8, 16])
def test_arrow_beats_15d_on_planar_grid(q):
    """The BASELINE comparison gate, on the reference's claimed family."""
    av, bv = _volumes(200, q)
    assert av["total_bytes"] < bv["total_bytes"], (av, bv)
    assert av["occupied_bytes"] <= av["total_bytes"]


def test_arrow_volume_flat_under_weak_scaling():
    """Fixed width, growing N and q together: arrow per-device volume must
    grow far slower than 1.5D's (the O(width*k) independence claim,
    reference: README.md:3)."""
    k = 16
    w = 3200
    results = []
    for side in (160, 320):
        A = grid_graph(side)
        n = A.shape[0]
        q = -(-n // w)
        d = arrow_decomposition(
            A, w, max_number_of_levels=100, block_diagonal=True, seed=0
        )
        plan = compile_plan(d, w, q)
        av = arrow_comm_volume(plan, k)
        c = replication_factor(q)
        bv = spmm_15d_comm_volume(n, n, k, q // c, c)
        results.append((av["occupied_bytes"], bv["total_bytes"]))
    (a1, b1), (a2, b2) = results
    # 4x the problem: arrow grows < 2x (level count may tick up), 1.5D ~2x+.
    assert a2 / a1 < 2.0, results
    assert a2 / a1 < b2 / b1, results


def test_head_bytes_formula():
    av, _ = _volumes(100, 4, k=8)
    q, w = av["q"], av["width"]
    w0 = q * (-(-w // q))
    expected = av["levels"] * 2 * (q - 1) / q * w0 * 8 * 4
    assert abs(av["head_bytes"] - expected) < 1e-6
