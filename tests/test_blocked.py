"""Blocked single-chip executor: agreement with the distributed program, the
merged local plan, and scipy goldens."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.decomposition.arrow import compute_spmm
from arrow_matrix_tpu.io.generate import barabasi_albert, grid_graph, random_dense
from arrow_matrix_tpu.parallel import ArrowSpmm, block_mesh
from arrow_matrix_tpu.parallel.blocked import blocked_step, compile_blocked_plan
from arrow_matrix_tpu.parallel.local import compile_local_plan, local_step
from arrow_matrix_tpu.plan import compile_plan


def _blocked_run(A, decomp, width, q, iters=2, k=8, block_diagonal=True):
    plan = compile_blocked_plan(
        decomp, width, n_blocks=q, block_diagonal=block_diagonal
    )
    n = A.shape[0]
    X = random_dense(n, k, seed=7)
    perm0 = np.asarray(plan.permutations[0])
    Xp = np.zeros((plan.n_blocks * plan.width, k), dtype=np.float32)
    Xp[:n] = X
    x = jnp.asarray(Xp[perm0])
    step = jax.jit(blocked_step)
    ref = X.copy()
    for _ in range(iters):
        x = step(plan, x)
        ref = A.astype(np.float32) @ ref
    inv = np.argsort(perm0)
    got = np.asarray(x)[inv][:n]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    return plan


@pytest.mark.parametrize("block_diagonal", [True, False])
def test_blocked_matches_golden(block_diagonal):
    n, width, q = 16 * 8 - 3, 16, 8
    A = barabasi_albert(n, 4, seed=0)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=block_diagonal, seed=1
    )
    _blocked_run(A, decomp, width, q, block_diagonal=block_diagonal)


def test_blocked_matches_distributed_bitwise_structure():
    # The blocked executor runs the distributed program's structure; outputs
    # must agree with the shard_map runner to float tolerance.
    n, width, q = 16 * 8, 16, 8
    A = barabasi_albert(n, 3, seed=4)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    plan = compile_plan(decomp, width, q)
    runner = ArrowSpmm(plan, block_mesh(q))
    X = random_dense(n, 8, seed=9)
    x = runner.step(runner.distribute(X))
    got_dist = runner.collect(x)

    bplan = compile_blocked_plan(decomp, width, n_blocks=q)
    perm0 = np.asarray(bplan.permutations[0])
    Xp = np.zeros((q * width, 8), dtype=np.float32)
    Xp[:n] = X
    xb = jax.jit(blocked_step)(bplan, jnp.asarray(Xp[perm0]))
    got_blocked = np.asarray(xb)[np.argsort(perm0)][:n]
    np.testing.assert_allclose(got_blocked, got_dist, rtol=1e-5, atol=1e-5)


def test_blocked_matches_local_merged():
    width = 40
    A = grid_graph(17).tocsr()
    A = A.maximum(A.T)
    n = A.shape[0]
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=3
    )
    k = 8
    X = random_dense(n, k, seed=5)

    lplan = compile_local_plan(decomp, width)
    perm0 = np.asarray(lplan.permutations[0])
    Xp = np.zeros((lplan.padded_rows, k), dtype=np.float32)
    Xp[:n] = X
    xl = jax.jit(local_step)(jax.device_put(lplan), jnp.asarray(Xp[perm0]))
    got_local = np.asarray(xl)[np.argsort(perm0)][:n]

    bplan = compile_blocked_plan(decomp, width)
    xb = jax.jit(blocked_step)(bplan, jnp.asarray(Xp[np.asarray(bplan.permutations[0])]))
    got_blocked = np.asarray(xb)[np.argsort(np.asarray(bplan.permutations[0]))][:n]

    np.testing.assert_allclose(got_blocked, got_local, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        got_blocked, compute_spmm(decomp, X), rtol=1e-4, atol=1e-4
    )


def test_blocked_fewer_active_blocks():
    # Deeper levels use fewer blocks than q; the blocked executor skips the
    # inactive ones entirely.
    n, width, q = 240, 32, 8
    A = barabasi_albert(n, 5, seed=6)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=0
    )
    plan = _blocked_run(A, decomp, width, q)
    assert any(lvl.n_active_blocks < q for lvl in plan.levels[1:]) or len(
        plan.levels
    ) == 1


@pytest.mark.parametrize("windowed", [True, False])
def test_blocked_window_layouts_agree(windowed):
    # Both stripe layouts (materialized width-windows vs global level
    # buffer) must produce identical results; the default picks by
    # feature-buffer size.
    n, width, q = 16 * 8 - 3, 16, 8
    A = barabasi_albert(n, 4, seed=0)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=1
    )
    _blocked_run_with(A, decomp, width, q, windowed)


def _blocked_run_with(A, decomp, width, q, windowed, k=8):
    plan = compile_blocked_plan(decomp, width, n_blocks=q, windowed=windowed)
    n = A.shape[0]
    X = random_dense(n, k, seed=7)
    perm0 = np.asarray(plan.permutations[0])
    Xp = np.zeros((plan.n_blocks * plan.width, k), dtype=np.float32)
    Xp[:n] = X
    x = jax.jit(blocked_step)(plan, jnp.asarray(Xp[perm0]))
    got = np.asarray(x)[np.argsort(perm0)][:n]
    np.testing.assert_allclose(
        got, compute_spmm(decomp, X.astype(np.float32)), rtol=2e-4, atol=2e-4
    )


def test_blocked_composed_routing_matches_golden():
    """compose_routing=True folds the forward routing into the stripe
    formats' column indices (global layout); results match the scipy golden
    and the uncomposed plan."""
    n, width, q = 16 * 8 - 3, 16, 8
    A = barabasi_albert(n, 4, seed=0)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=1
    )
    k = 8
    X = random_dense(n, k, seed=7)
    outs = {}
    for compose in (False, True):
        plan = compile_blocked_plan(
            decomp, width, n_blocks=q, windowed=False,
            compose_routing=compose,
        )
        if compose:
            assert any(l.composed for l in plan.levels[1:])
        perm0 = np.asarray(plan.permutations[0])
        Xp = np.zeros((plan.n_blocks * plan.width, k), dtype=np.float32)
        Xp[:n] = X
        x = jnp.asarray(Xp[perm0])
        step = jax.jit(blocked_step)
        for _ in range(2):
            x = step(plan, x)
        inv = np.argsort(perm0)
        outs[compose] = np.asarray(x)[inv][:n]
    ref = A.astype(np.float32) @ (A.astype(np.float32) @ X)
    np.testing.assert_allclose(outs[True], ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-5, atol=1e-5)
