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


def test_petsc_comm_volume_exact_counts():
    """petsc_comm_volume must reproduce hand-counted boundary exchanges."""
    from scipy import sparse

    from arrow_matrix_tpu.baselines.matrix_slice import build_slice_plan
    from arrow_matrix_tpu.plan.comm import petsc_comm_volume

    # 4 rows, 2 devices of 2 rows each. Device 0's rows touch columns
    # {0,1,2}: one remote row (2) needed -> device 1 sends 1 row to 0.
    # Device 1's rows touch columns {1,2,3}: one remote row (1) -> device 0
    # sends 1 row to 1. Occupied per-device rows sent = 1.
    A = sparse.csr_matrix(np.array([
        [1, 0, 1, 0],
        [0, 1, 0, 0],
        [0, 1, 1, 0],
        [0, 0, 0, 1],
    ], dtype=np.float32))
    plan = build_slice_plan(A, n_devices=2)
    k = 4
    v = petsc_comm_volume(plan, k)
    assert v["occupied_bytes"] == 1 * k * 4
    assert v["total_bytes"] == (2 - 1) * plan.max_per_pair * k * 4
    assert v["total_bytes"] >= v["occupied_bytes"]


def test_three_way_volume_report_on_grid():
    """All three accountings run on one problem (completeness: the
    reference benchmarks arrow against both baselines)."""
    from arrow_matrix_tpu.baselines.matrix_slice import build_slice_plan
    from arrow_matrix_tpu.plan.comm import petsc_comm_volume

    A = grid_graph(100)
    n = A.shape[0]
    q = 8
    w = -(-n // q)
    d = arrow_decomposition(
        A, w, max_number_of_levels=100, block_diagonal=True, seed=0
    )
    av = arrow_comm_volume(compile_plan(d, w, q), 16)
    c = replication_factor(q)
    bv = spmm_15d_comm_volume(n, n, 16, q // c, c)
    pv = petsc_comm_volume(build_slice_plan(A, n_devices=q), 16)
    for v in (av, bv, pv):
        assert v["total_bytes"] > 0
    # Natural-order grid slices have tiny boundaries: PETSc's occupied
    # volume must be far under 1.5D's total (sanity of the accounting).
    assert pv["occupied_bytes"] < bv["total_bytes"]
