"""Baseline SpMM tests vs scipy goldens — mirrors the reference's baseline
test coverage (reference: tests/test_spmmPETSc.py at 4 and 6 ranks with equal
and unequal slices incl. zero-row ranks; scripts/spmm_15d_main.py --validate
full-result comparison)."""

import numpy as np
import pytest
from scipy import sparse

from arrow_matrix_tpu.baselines import (
    Spmm1D,
    Spmm15D,
    build_slice_plan,
    grid_mesh,
)
from arrow_matrix_tpu.baselines.spmm_15d import replication_factor
from arrow_matrix_tpu.baselines.spmm_petsc import slice_mesh
from arrow_matrix_tpu.io.generate import barabasi_albert, random_csr, random_dense


# ----------------------------------------------------------------- 1.5D


@pytest.mark.parametrize("p_div_c,c", [(4, 2), (8, 1), (2, 4), (2, 2)])
def test_15d_product(p_div_c, c):
    A = random_csr(200, 200, 8, seed=p_div_c * 10 + c)
    X = random_dense(200, 16, seed=3)
    runner = Spmm15D(A, grid_mesh(p_div_c, c))
    y = runner.spmm(runner.distribute(X))
    np.testing.assert_allclose(runner.collect(y), A @ X, rtol=1e-4, atol=1e-4)


def test_15d_triplet_input_matches_csr():
    # Memory-mapped-style (data, indices, indptr) input builds blocks one row
    # stripe at a time (reference: arrow/baseline/spmm_15d.py:158-309) and
    # must produce the same result as the materialized path.
    A = random_csr(192, 192, 6, seed=9)
    X = random_dense(192, 8, seed=4)
    mesh = grid_mesh(4, 2)
    y_csr = Spmm15D(A, mesh)
    got_csr = y_csr.collect(y_csr.spmm(y_csr.distribute(X)))
    triplet = (A.data, A.indices, A.indptr)
    y_tri = Spmm15D(triplet, mesh)
    got_tri = y_tri.collect(y_tri.spmm(y_tri.distribute(X)))
    np.testing.assert_allclose(got_tri, got_csr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_tri, A @ X, rtol=1e-4, atol=1e-4)


def test_15d_bsr_format_matches_ell():
    # Dense-ish matrix at the reference's k=128 default: the BSR/MXU path
    # must agree with gather-ELL (reference GPU path analogue,
    # arrow/baseline/spmm_15d.py:371-449).
    A = random_csr(256, 256, 32, seed=5)
    X = random_dense(256, 128, seed=6)
    mesh = grid_mesh(4, 2)
    r_ell = Spmm15D(A, mesh, force_format="ell")
    r_bsr = Spmm15D(A, mesh, force_format="bsr", k_hint=128)
    assert r_bsr.fmt == "bsr"
    got_ell = r_ell.collect(r_ell.spmm(r_ell.distribute(X)))
    got_bsr = r_bsr.collect(r_bsr.spmm(r_bsr.distribute(X)))
    np.testing.assert_allclose(got_bsr, got_ell, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_bsr, A @ X, rtol=1e-4, atol=1e-4)


def test_1d_bsr_format_matches_ell():
    from arrow_matrix_tpu.baselines.matrix_slice import build_slice_plan
    from arrow_matrix_tpu.baselines.spmm_petsc import Spmm1D

    A = random_csr(200, 200, 24, seed=7)
    X = random_dense(200, 32, seed=8)
    mesh = slice_mesh(4)
    p_ell = build_slice_plan(A, n_devices=4, force_format="ell")
    p_bsr = build_slice_plan(A, n_devices=4, force_format="bsr")
    y_ell = Spmm1D(p_ell, mesh)
    y_bsr = Spmm1D(p_bsr, mesh)
    got_ell = y_ell.collect(y_ell.step(y_ell.distribute(X)))
    got_bsr = y_bsr.collect(y_bsr.step(y_bsr.distribute(X)))
    np.testing.assert_allclose(got_bsr, got_ell, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_bsr, A @ X, rtol=1e-4, atol=1e-4)


def test_bsr_k_tiling_matches_untiled():
    # Force a VMEM budget small enough that the dense operand must be
    # k-tiled; results must be identical (reference GPU tiling analogue,
    # arrow/baseline/spmm_petsc.py:323-395).
    from arrow_matrix_tpu.ops.bsr_pallas import bsr_from_csr, bsr_spmm
    from arrow_matrix_tpu.ops.dispatch import bsr_apply
    import jax.numpy as jnp

    A = random_csr(256, 256, 40, seed=9)
    X = random_dense(256, 384, seed=10)
    m = bsr_from_csr(A)
    untiled = bsr_apply(m, jnp.asarray(X), 256)
    # Budget fits exactly one 128-lane tile of the operand -> 3 k-tiles.
    tiled = bsr_apply(m, jnp.asarray(X), 256, vmem_budget=256 * 128 * 4)
    np.testing.assert_allclose(
        np.asarray(tiled), np.asarray(untiled), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(tiled), A @ X, rtol=1e-4, atol=1e-4)


def test_preferred_format_k_tiled_bsr(monkeypatch):
    # A dense-tiled matrix whose wide operand overflows VMEM must STILL pick
    # bsr (k-tiling in 128-column units). When even one lane-padded tile
    # cannot be resident, the calibrated STREAMING kernel (round 3) keeps
    # bsr; without calibration the model must fall back to ell.
    import arrow_matrix_tpu.ops.bsr_pallas as bp
    from arrow_matrix_tpu.ops.bsr_pallas import preferred_format
    from scipy import sparse as sp

    A = sp.random(512, 512, density=0.5, random_state=np.random.default_rng(1),
                  format="csr")
    assert preferred_format(A, 128) == "bsr"
    # k=512 at a budget of exactly one 128-lane tile: k-tiled BSR.
    assert preferred_format(A, 512, x_vmem_budget_bytes=512 * 128 * 4) == "bsr"
    # One lane-padded tile (rows x 128 x 4B) over budget: residency
    # infeasible — streaming BSR (dense tiles beat the ell slot cost).
    assert preferred_format(A, 16, x_vmem_budget_bytes=512 * 64 * 4) == "bsr"
    monkeypatch.setattr(bp, "BSR_STREAM_NS_PER_TILE", None)
    assert preferred_format(A, 16, x_vmem_budget_bytes=512 * 64 * 4) == "ell"


def test_15d_rectangular():
    A = random_csr(120, 260, 5, seed=1)
    X = random_dense(260, 8, seed=2)
    runner = Spmm15D(A, grid_mesh(4, 2))
    y = runner.spmm(runner.distribute(X))
    np.testing.assert_allclose(runner.collect(y), A @ X, rtol=1e-4, atol=1e-4)


def test_15d_iterated_step():
    A = random_csr(96, 96, 6, seed=5)
    X = random_dense(96, 8, seed=6)
    runner = Spmm15D(A, grid_mesh(4, 2))
    x = runner.distribute(X)
    ref = X.copy()
    for _ in range(3):
        x = runner.step(x)
        ref = A @ ref
    np.testing.assert_allclose(runner.collect_x(x), ref, rtol=2e-4, atol=2e-4)


def test_15d_reference_config():
    """The reference's README example: random matrix on 8 ranks
    (reference: README.md:100-103) — scaled down."""
    A = random_csr(1000, 1000, 10, seed=7)
    X = random_dense(1000, 32, seed=8)
    c = replication_factor(8)
    runner = Spmm15D(A, grid_mesh(8 // c, c))
    y = runner.spmm(runner.distribute(X))
    np.testing.assert_allclose(runner.collect(y), A @ X, rtol=1e-4, atol=1e-4)


def test_replication_factor_auto():
    assert replication_factor(8) == 2
    assert replication_factor(16) == 4
    assert replication_factor(4) == 2
    assert replication_factor(2) == 1


# ----------------------------------------------------------------- 1D PETSc


@pytest.mark.parametrize("q", [4, 6, 8])
def test_1d_even_partition(q):
    A = random_csr(96, 96, 7, seed=q)
    X = random_dense(96, 16, seed=1)
    plan = build_slice_plan(A, n_devices=q)
    runner = Spmm1D(plan, slice_mesh(q))
    x = runner.step(runner.distribute(X))
    np.testing.assert_allclose(runner.collect(x), A @ X, rtol=1e-4, atol=1e-4)


def test_1d_identity():
    """Identity matrix: no communication, output == input
    (reference: tests/test_spmmPETSc.py:95-121)."""
    n, q = 64, 4
    A = sparse.identity(n, dtype=np.float32, format="csr")
    X = random_dense(n, 8, seed=0)
    plan = build_slice_plan(A, n_devices=q)
    assert (np.asarray(plan.send_idx) == plan.lmax).all()  # nothing to ship
    runner = Spmm1D(plan, slice_mesh(q))
    x = runner.step(runner.distribute(X))
    np.testing.assert_allclose(runner.collect(x), X, rtol=1e-5, atol=1e-5)


def test_1d_unequal_slices_with_zero_rows():
    """Unequal partition including empty slices
    (reference: tests/test_spmmPETSc.py:44-71)."""
    n, q = 90, 6
    A = random_csr(n, n, 5, seed=11)
    X = random_dense(n, 16, seed=12)
    counts = [30, 0, 25, 5, 0, 30]
    plan = build_slice_plan(A, row_counts=counts)
    runner = Spmm1D(plan, slice_mesh(q))
    x = runner.step(runner.distribute(X))
    np.testing.assert_allclose(runner.collect(x), A @ X, rtol=1e-4, atol=1e-4)


def test_1d_iterated():
    n, q = 64, 4
    A = barabasi_albert(n, 4, seed=13)
    X = random_dense(n, 8, seed=14)
    plan = build_slice_plan(A, n_devices=q)
    runner = Spmm1D(plan, slice_mesh(q))
    x = runner.distribute(X)
    ref = X.copy()
    for _ in range(4):
        x = runner.step(x)
        ref = A @ ref
    np.testing.assert_allclose(runner.collect(x), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("density", [2, 12])
def test_1d_densities(density):
    n, q = 80, 4
    A = random_csr(n, n, density, seed=density)
    X = random_dense(n, 16, seed=3)
    plan = build_slice_plan(A, n_devices=q)
    runner = Spmm1D(plan, slice_mesh(q))
    x = runner.step(runner.distribute(X))
    np.testing.assert_allclose(runner.collect(x), A @ X, rtol=1e-4, atol=1e-4)


def test_1d_range_exchange():
    """The slice-exchange variant (contiguous covering ranges, the
    reference's _spmm_slices, arrow/baseline/spmm_petsc.py:105-144)
    matches the golden and the row-exchange result."""
    from arrow_matrix_tpu.baselines.matrix_slice import check_comm_tables

    q = 4
    A = random_csr(96, 96, 7, seed=3)
    X = random_dense(96, 16, seed=2)
    for exchange in ("rows", "ranges"):
        plan = build_slice_plan(A, n_devices=q, exchange=exchange)
        check_comm_tables(plan, A)
        runner = Spmm1D(plan, slice_mesh(q))
        x = runner.step(runner.distribute(X))
        np.testing.assert_allclose(
            runner.collect(x), A @ X, rtol=1e-4, atol=1e-4
        )


def test_check_comm_tables_detects_corruption():
    """check_comm_tables (reference: arrow/matrix_slice.py:157-182) flags a
    send table that drops a needed row or points outside the owner slice."""
    import pytest

    from arrow_matrix_tpu.baselines.matrix_slice import check_comm_tables

    A = random_csr(64, 64, 6, seed=9)
    plan = build_slice_plan(A, n_devices=4)
    check_comm_tables(plan, A)  # sane tables pass

    bad = np.asarray(plan.send_idx).copy()
    sent = np.argwhere(bad != plan.lmax)
    o, d, m = sent[0]
    bad[o, d, m] = plan.lmax  # drop one shipped row
    with pytest.raises(AssertionError, match="not shipped"):
        check_comm_tables(plan.replace(send_idx=bad), A)

    bad2 = np.asarray(plan.send_idx).copy()
    bad2[o, d, m] = plan.lmax + 7  # outside the owner's slice
    with pytest.raises(AssertionError, match="outside owner"):
        check_comm_tables(plan.replace(send_idx=bad2), A)
