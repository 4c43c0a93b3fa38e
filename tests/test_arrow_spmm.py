"""Distributed arrow SpMM tests on the 8-device virtual CPU mesh — tier (b)
of the reference test strategy (reference: tests/test_arrowmpi.py): single
matrix (block-diagonal and banded), hand-built 2-level chains, and full
end-to-end decomposed graphs, all against scipy goldens."""

import numpy as np
import pytest
from scipy import sparse

import jax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.decomposition.arrow import compute_spmm
from arrow_matrix_tpu.io.generate import (
    barabasi_albert,
    random_dense,
    structured_arrow_matrix,
)
from arrow_matrix_tpu.parallel import ArrowSpmm, block_mesh
from arrow_matrix_tpu.plan import compile_plan


def _run_iterations(A, decomposition, width, n_dev, iters=3, k=16,
                    block_diagonal=True):
    mesh = block_mesh(n_dev)
    plan = compile_plan(
        decomposition, width, n_dev, block_diagonal=block_diagonal
    )
    runner = ArrowSpmm(plan, mesh)
    n = A.shape[0]
    X = random_dense(n, k, seed=42)
    x = runner.distribute(X)
    ref = X.copy()
    for _ in range(iters):
        x = runner.step(x)
        ref = A @ ref
    got = runner.collect(x)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    return runner


def test_single_arrow_matrix_8_blocks():
    """One structured arrow matrix over 8 devices (reference: test_spmm,
    tests/test_arrowmpi.py:342-398)."""
    width, q = 16, 8
    n = width * q
    A = structured_arrow_matrix(n, width, seed=0)
    # Make it a valid single-level block-diagonal arrow decomposition:
    # keep head panels + diagonal blocks only.
    coo = A.tocoo()
    keep = (
        (coo.row < width)
        | (coo.col < width)
        | ((coo.row // width) == (coo.col // width))
    )
    A = sparse.csr_matrix(
        (coo.data[keep], (coo.row[keep], coo.col[keep])), shape=A.shape
    )
    decomp = [(A, np.arange(n))]
    _run_iterations(A, decomp, width, q)


def test_single_banded_arrow_matrix():
    """Banded (non-block-diagonal) mode exercises the ppermute halo path
    (reference: ArrowMPI banded, arrow/arrow_mpi.py:123-175)."""
    width, q = 16, 8
    n = width * q
    rng = np.random.default_rng(3)
    dense = np.zeros((n, n), dtype=np.float32)
    dense[:width, :] = rng.random((width, n)) * (rng.random((width, n)) < 0.2)
    dense[:, :width] = rng.random((n, width)) * (rng.random((n, width)) < 0.2)
    for d in range(-width, width + 1):
        diag = rng.random(n - abs(d)) * (rng.random(n - abs(d)) < 0.1)
        dense += np.diag(diag, d)
    A = sparse.csr_matrix(dense)
    decomp = [(A, np.arange(n))]
    _run_iterations(A, decomp, width, q, block_diagonal=False)


def test_two_level_chain_identity_second_level():
    """Hand-built 2-level chain: B1 = structured arrow, B2 = identity under a
    random permutation (reference: test_decomposition,
    tests/test_arrowmpi.py:96-168)."""
    width, q = 8, 8
    n = width * q
    rng = np.random.default_rng(5)
    A1 = structured_arrow_matrix(n, width, seed=1)
    coo = A1.tocoo()
    keep = (
        (coo.row < width)
        | (coo.col < width)
        | ((coo.row // width) == (coo.col // width))
    )
    B1 = sparse.csr_matrix(
        (coo.data[keep], (coo.row[keep], coo.col[keep])), shape=(n, n)
    )
    perm2 = rng.permutation(n)
    B2 = sparse.identity(n, dtype=np.float32, format="csr")
    # Total operator: A = B1 + P2^T B2 P2 = B1 + I.
    A = (B1 + sparse.identity(n, dtype=np.float32)).tocsr()
    decomp = [(B1, np.arange(n)), (B2, perm2)]
    _run_iterations(A, decomp, width, q)


def test_decomposed_graph_end_to_end():
    """Decompose Barabási graphs and run the full chain vs compute_spmm
    golden (reference: test_decomposition_on_graph,
    tests/test_arrowmpi.py:205-309)."""
    q = 8
    for n, m_edges, width_c in [(256, 4, 4), (320, 3, 6)]:
        A = barabasi_albert(n, m_edges, seed=n)
        width = n // width_c + 1
        decomp = arrow_decomposition(
            A, width, max_number_of_levels=100, block_diagonal=True, seed=1
        )
        assert all(len(lvl.permutation) == n for lvl in decomp)
        # Golden check of the decomposition itself first.
        X = random_dense(n, 16, seed=0)
        np.testing.assert_allclose(
            compute_spmm(decomp, X), A @ X, rtol=1e-4, atol=1e-4
        )
        _run_iterations(A, decomp, width, q, iters=3)


def test_fewer_active_blocks_than_devices():
    """Levels whose nonzero rows need fewer blocks than devices must be
    truncated and still correct (zero blocks cut, reference:
    arrow_dec_mpi.py:728-731)."""
    q = 8
    n = 200
    A = barabasi_albert(n, 4, seed=9)
    width = 30  # padded rows = 240, level-0 blocks ~ 7, deeper levels fewer
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    plan = compile_plan(decomp, width, q, block_diagonal=True)
    assert any(lvl.n_active_blocks < q for lvl in plan.levels)
    _run_iterations(A, decomp, width, q, iters=2)


def test_structure_violation_raises():
    A = barabasi_albert(64, 4, seed=1)
    # width too small without decomposition: nonzeros everywhere.
    with pytest.raises(ValueError, match="outside the arrow block structure"):
        compile_plan([(A, np.arange(64))], 8, 8, block_diagonal=True)


def test_single_device_plan():
    """q=1 degenerates to a purely local SpMM."""
    n = 64
    A = barabasi_albert(n, 4, seed=2)
    decomp = arrow_decomposition(A, n, max_number_of_levels=1, seed=0)
    _run_iterations(A, decomp, n, 1, iters=2)


@pytest.mark.parametrize("k", [1, 16, 64])
def test_feature_widths(k):
    q, width = 4, 16
    n = q * width
    A = structured_arrow_matrix(n, width, seed=7)
    coo = A.tocoo()
    keep = (
        (coo.row < width)
        | (coo.col < width)
        | ((coo.row // width) == (coo.col // width))
    )
    A = sparse.csr_matrix(
        (coo.data[keep], (coo.row[keep], coo.col[keep])), shape=(n, n)
    )
    _run_iterations(A, [(A, np.arange(n))], width, q, iters=2, k=k)


def test_distributed_bsr_blocks():
    """Distributed step with the Pallas BSR kernel per device (interpret
    mode on CPU): dense-ish matrix forces BSR role selection."""
    from arrow_matrix_tpu.io.generate import erdos_renyi

    q = 8
    n, width = 1024, 128
    A = erdos_renyi(n, 0.05, seed=17)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=20, block_diagonal=True, seed=3
    )
    plan = compile_plan(decomp, width, q, k_hint=16)
    from arrow_matrix_tpu.ops.bsr_pallas import BsrMat

    assert any(
        isinstance(m, BsrMat)
        for lvl in plan.levels
        for m in (lvl.head, lvl.diag, lvl.col)
    )
    runner = ArrowSpmm(plan, block_mesh(q))
    X = random_dense(n, 16, seed=4)
    x = runner.distribute(X)
    ref = X.copy()
    for _ in range(2):
        x = runner.step(x)
        ref = A @ ref
    np.testing.assert_allclose(runner.collect(x), ref, rtol=2e-4, atol=2e-4)


def test_distributed_forced_formats_agree():
    from arrow_matrix_tpu.io.generate import erdos_renyi

    q, n, width = 4, 512, 128
    A = erdos_renyi(n, 0.04, seed=19)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=20, block_diagonal=True, seed=5
    )
    X = random_dense(n, 8, seed=6)
    outs = []
    for fmt in ("ell", "bsr"):
        plan = compile_plan(decomp, width, q, force_format=fmt)
        runner = ArrowSpmm(plan, block_mesh(q))
        x = runner.step(runner.distribute(X))
        outs.append(runner.collect(x))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-4)


def test_directed_graph_end_to_end():
    """Directed (asymmetric) adjacency through decomposition + distributed
    run (the reference's directed Barabási fixtures,
    tests/test_arrowdecomposition.py:18)."""
    n, q = 256, 8
    A = barabasi_albert(n, 3, seed=31, directed=True)
    width = n // 6 + 1
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    _run_iterations(A, decomp, width, q, iters=2, k=8)


def test_multilevel_banded_distributed():
    """Banded (non-block-diagonal) decomposition with multiple levels through
    the distributed runner (fat-layout capability, reference: ArrowMPI)."""
    n, q = 320, 8
    A = barabasi_albert(n, 4, seed=41)
    width = n // 8 + 1
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=False, seed=1
    )
    assert len(decomp) >= 2
    _run_iterations(A, decomp, width, q, iters=2, k=8, block_diagonal=False)


@pytest.mark.parametrize("trial", range(4))
def test_randomized_consistency(trial):
    """Fuzz: random graph/width/levels; local merged, local level-mirror and
    distributed runners must all match scipy."""
    import jax.numpy as jnp

    from arrow_matrix_tpu.parallel.local import compile_local_plan, local_step

    rng = np.random.default_rng(100 + trial)
    n = int(rng.integers(120, 400))
    m_edges = int(rng.integers(2, 6))
    A = barabasi_albert(n, m_edges, seed=int(rng.integers(1e6)))
    A.data = rng.uniform(0.5, 1.5, A.nnz).astype(np.float32)
    max_levels = int(rng.integers(2, 30))
    q = 8
    width = -(-n // q)  # ceil so 8 blocks always cover
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=max_levels, block_diagonal=True,
        seed=int(rng.integers(1e6)),
    )
    X = random_dense(n, 8, seed=trial)
    ref = A @ (A @ X)

    runner = ArrowSpmm(compile_plan(decomp, width, q), block_mesh(q))
    x = runner.distribute(X)
    x = runner.step(runner.step(x))
    np.testing.assert_allclose(runner.collect(x), ref, rtol=3e-4, atol=3e-4)

    for merge in (True, False):
        plan = compile_local_plan(decomp, width, n_blocks=q, merge_levels=merge)
        xp = np.zeros((plan.padded_rows, 8), np.float32)
        xp[:n] = X
        xl = jnp.asarray(xp[np.asarray(plan.permutations[0])])
        xl = jax.jit(local_step)(plan, xl)
        xl = jax.jit(local_step)(plan, xl)
        inv = np.argsort(np.asarray(plan.permutations[0]))
        np.testing.assert_allclose(
            np.asarray(xl)[inv][:n], ref, rtol=3e-4, atol=3e-4
        )


@pytest.mark.parametrize("block_diagonal", [True, False])
def test_routing_rounds_matches_all_to_all(block_diagonal):
    """Forced rounds-mode routing (partial-permutation ppermutes,
    plan/routing.py:to_round_exchange) is numerically identical to the
    padded all_to_all on the full distributed step."""
    n, width, q, k = 8 * 40 - 5, 40, 8, 16
    A = barabasi_albert(n, 4, seed=3)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100,
        block_diagonal=block_diagonal, seed=1,
    )
    X = random_dense(n, k, seed=9)
    got = {}
    for mode in ("all_to_all", "rounds"):
        plan = compile_plan(
            decomp, width, q, block_diagonal=block_diagonal, routing=mode
        )
        if mode == "rounds":
            assert any(
                lvl.route is not None and lvl.route.rounds_mode
                for lvl in plan.levels
            )
        runner = ArrowSpmm(plan, block_mesh(q))
        x = runner.distribute(X)
        for _ in range(2):
            x = runner.step(x)
        got[mode] = runner.collect(x)
    ref = A @ (A @ X)
    np.testing.assert_allclose(got["rounds"], ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(got["rounds"], got["all_to_all"])
