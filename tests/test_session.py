"""Session API, checkpointing, and k-tiling tests."""

import numpy as np
import pytest

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io import graphio
from arrow_matrix_tpu.io.generate import barabasi_albert, random_dense
from arrow_matrix_tpu.ops.tiling import plan_feature_tiles, tiled_apply
from arrow_matrix_tpu.parallel.session import ArrowSession


@pytest.fixture(scope="module")
def problem():
    A = barabasi_albert(400, 4, seed=8)
    decomp = arrow_decomposition(
        A, 51, max_number_of_levels=100, block_diagonal=True, seed=1
    )
    return A, decomp


@pytest.mark.parametrize("n_devices", [1, 8])
def test_session_reference_workflow(problem, n_devices):
    """The reference's bench workflow verb-for-verb (reference:
    arrow/arrow_bench.py:111-134)."""
    A, decomp = problem
    session = ArrowSession(decomp, 51, n_devices=n_devices)
    X = random_dense(A.shape[0], 8, seed=2)
    session.set_features(X)
    ref = X.copy()
    for _ in range(3):
        session.step()
        ref = A @ ref
    np.testing.assert_allclose(
        session.allgather_result(), ref, rtol=2e-4, atol=2e-4
    )


def test_session_from_path(problem, tmp_path):
    A, decomp = problem
    base = str(tmp_path / "g")
    graphio.save_decomposition_new(A, decomp, base, block_diagonal=True)
    session = ArrowSession.from_path(base, 51, n_devices=8)
    X = random_dense(A.shape[0], 4, seed=3)
    session.set_features(X)
    session.step()
    np.testing.assert_allclose(
        session.allgather_result(), A @ X, rtol=1e-4, atol=1e-4
    )


def test_session_fused_run_matches_steps(problem):
    """The single-chip fused ``run`` (one unroll=2 fori_loop dispatch — the
    ping-pong iteration that removes the while back-edge state copy) must be
    bit-compatible with repeated ``step`` calls, for even and odd counts."""
    A, decomp = problem
    X = random_dense(A.shape[0], 8, seed=12)
    for iters in (2, 3):
        s_run = ArrowSession(decomp, 51, n_devices=1)
        s_step = ArrowSession(decomp, 51, n_devices=1)
        s_run.set_features(X)
        s_step.set_features(X)
        s_run.run(iters)
        for _ in range(iters):
            s_step.step()
        assert s_run.iteration == s_step.iteration == iters
        np.testing.assert_allclose(
            s_run.allgather_result(), s_step.allgather_result(),
            rtol=1e-6, atol=1e-6,
        )


def test_session_zero_rhs(problem):
    _, decomp = problem
    session = ArrowSession(decomp, 51, n_devices=1)
    session.zero_rhs(4)
    session.step()
    assert np.all(session.allgather_result() == 0.0)


def test_checkpoint_roundtrip(problem, tmp_path):
    A, decomp = problem
    X = random_dense(A.shape[0], 8, seed=4)
    s1 = ArrowSession(decomp, 51, n_devices=8)
    s1.set_features(X)
    s1.run(2)
    ckpt = str(tmp_path / "state")
    s1.save_checkpoint(ckpt)

    s2 = ArrowSession(decomp, 51, n_devices=1)  # resume on different topology
    s2.load_checkpoint(ckpt)
    assert s2.iteration == 2
    s1.step()
    s2.step()
    np.testing.assert_allclose(
        s2.allgather_result(), s1.allgather_result(), rtol=2e-4, atol=2e-4
    )


def test_feature_tiling_planner():
    # VMEM is lane-padded: tiles below 128 columns save nothing, so k <= 128
    # never tiles; wide operands tile in 128-column units.
    assert plan_feature_tiles(100_000, 128, needs_vmem_residency=True) == 128
    kt = plan_feature_tiles(8192, 512, needs_vmem_residency=True,
                            vmem_budget=8192 * 128 * 4)
    assert kt == 128
    # Small operands keep full width.
    assert plan_feature_tiles(1000, 64, needs_vmem_residency=True) == 64
    assert plan_feature_tiles(10_000, 16) == 16


def test_tiled_apply_matches_untiled(problem):
    import jax.numpy as jnp

    A, _ = problem
    X = random_dense(A.shape[0], 24, seed=5)
    Ad = jnp.asarray(A.toarray())
    fn = lambda xb: Ad @ xb
    full = np.asarray(fn(jnp.asarray(X)))
    tiled = np.asarray(tiled_apply(fn, jnp.asarray(X), 8))
    np.testing.assert_allclose(tiled, full, rtol=1e-5, atol=1e-5)


def test_local_merge_modes_agree(problem):
    """merge_levels=True (one matrix) and False (faithful level mirror) must
    produce identical iterates."""
    import jax
    import jax.numpy as jnp

    from arrow_matrix_tpu.parallel.local import compile_local_plan, local_step

    A, decomp = problem
    X = random_dense(A.shape[0], 8, seed=9)
    outs = []
    for merge in (True, False):
        plan = compile_local_plan(decomp, 51, merge_levels=merge)
        xp = np.zeros((plan.padded_rows, 8), np.float32)
        xp[: A.shape[0]] = X
        x = jnp.asarray(xp[np.asarray(plan.permutations[0])])
        for _ in range(3):
            x = jax.jit(local_step)(plan, x)
        inv = np.argsort(np.asarray(plan.permutations[0]))
        outs.append(np.asarray(x)[inv][: A.shape[0]])
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-4)
    ref = X.copy()
    for _ in range(3):
        ref = A @ ref
    np.testing.assert_allclose(outs[0], ref, rtol=2e-4, atol=2e-4)


def test_auto_format_selects_bsr_on_dense_graphs():
    """Dense-ish matrices must route through the Pallas BSR kernel (interpret
    mode on CPU) and stay correct."""
    import jax
    import jax.numpy as jnp

    from arrow_matrix_tpu.io.generate import erdos_renyi
    from arrow_matrix_tpu.parallel.local import compile_local_plan, local_step

    n, width = 1024, 128
    A = erdos_renyi(n, 0.05, seed=7)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=20, block_diagonal=True, seed=2
    )
    plan = compile_local_plan(decomp, width, k_hint=16)
    assert any(l.fmt in ("bsr", "hybrid") for l in plan.levels)
    X = random_dense(n, 16, seed=1)
    xp = np.zeros((plan.padded_rows, 16), np.float32)
    xp[:n] = X
    x = jnp.asarray(xp[np.asarray(plan.permutations[0])])
    x = jax.jit(local_step)(plan, x)
    inv = np.argsort(np.asarray(plan.permutations[0]))
    np.testing.assert_allclose(
        np.asarray(x)[inv][:n], A @ X, rtol=2e-4, atol=2e-4
    )


def test_hybrid_split_covers_all_nnz():
    from scipy import sparse as sp

    from arrow_matrix_tpu.ops.bsr_pallas import split_by_tile_density

    rng = np.random.default_rng(3)
    # Mixed structure: a dense head panel + a very sparse remainder.
    head = sp.random(128, 1024, 0.3, format="csr", dtype=np.float32, random_state=1)
    tail = sp.random(896, 1024, 0.001, format="csr", dtype=np.float32, random_state=2)
    A = sp.vstack([head, tail]).tocsr()
    dense, rest = split_by_tile_density(A, min_nnz_per_tile=32)
    assert dense.nnz + rest.nnz == A.nnz
    assert abs(dense + rest - A).max() < 1e-6
    assert dense.nnz > 0 and rest.nnz > 0


def test_bf16_matrix_payloads(problem):
    """bf16 values halve kernel traffic; accumulation stays f32 (looser
    tolerance expected)."""
    import jax
    import jax.numpy as jnp

    from arrow_matrix_tpu.parallel.local import compile_local_plan, local_step

    A, decomp = problem
    X = random_dense(A.shape[0], 8, seed=11)
    plan = compile_local_plan(decomp, 51, matrix_dtype=jnp.bfloat16)
    xp = np.zeros((plan.padded_rows, 8), np.float32)
    xp[: A.shape[0]] = X
    x = jnp.asarray(xp[np.asarray(plan.permutations[0])])
    x = jax.jit(local_step)(plan, x)
    inv = np.argsort(np.asarray(plan.permutations[0]))
    got = np.asarray(x)[inv][: A.shape[0]]
    ref = A @ X
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel


def test_pagerank_example():
    """The worked example converges to the scipy power-iteration result."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.pagerank import pagerank
    from scipy import sparse as sp

    A = barabasi_albert(256, 4, seed=7)
    got = pagerank(A, iterations=40, width=64, n_devices=1)

    # scipy golden power iteration
    n = A.shape[0]
    out_deg = np.asarray(A.sum(axis=0)).ravel()
    inv = np.divide(1.0, out_deg, out=np.zeros_like(out_deg), where=out_deg > 0)
    M = (A @ sp.diags(inv)).tocsr().astype(np.float32)
    x = np.full(n, 1.0 / n, dtype=np.float32)
    for _ in range(40):
        x = 0.85 * (M @ x) + 0.15 / n
    np.testing.assert_allclose(got, x, rtol=1e-3, atol=1e-6)


def test_gcn_propagation_example():
    """The GCN example's device propagation matches its scipy reference."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.gcn_propagation import gcn_propagate, reference_model

    rng = np.random.default_rng(3)
    A = barabasi_albert(300, 4, seed=9)
    H0 = rng.standard_normal((A.shape[0], 8)).astype(np.float32)
    weights = [
        (rng.standard_normal((8, 12)) / np.sqrt(8)).astype(np.float32),
        (rng.standard_normal((12, 4)) / np.sqrt(12)).astype(np.float32),
    ]
    got = gcn_propagate(A, H0, weights, width=80, n_devices=1)
    ref = reference_model(A, H0, weights)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel


@pytest.mark.parametrize("n_devices", [1, 8])
def test_session_banded_decomposition(n_devices):
    """Banded (non-block-diagonal) decompositions run through both the
    merged single-chip executor (layout-agnostic level merge) and the
    distributed runner (ppermute halo)."""
    A = barabasi_albert(300, 4, seed=5)
    decomp = arrow_decomposition(
        A, 43, max_number_of_levels=100, block_diagonal=False, seed=3
    )
    session = ArrowSession(
        decomp, 43, n_devices=n_devices, block_diagonal=False, features=8
    )
    X = random_dense(A.shape[0], 8, seed=6)
    session.set_features(X)
    ref = X.copy()
    for _ in range(2):
        session.step()
        ref = A @ ref
    np.testing.assert_allclose(
        session.allgather_result(), ref, rtol=2e-4, atol=2e-4
    )
