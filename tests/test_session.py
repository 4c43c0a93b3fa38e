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
    # VMEM residency forces narrow tiles for big operands.
    kt = plan_feature_tiles(100_000, 128, needs_vmem_residency=True)
    assert kt < 128 and kt % 8 == 0
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
