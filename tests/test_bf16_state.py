"""bf16 iteration state on the distributed runner: the HBM-capacity lever
quantified in plan/memory.py (resident state, block-0 replica, and routing
wire at half width; per-block kernels upcast and accumulate in f32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert, random_dense
from arrow_matrix_tpu.parallel import ArrowSpmm, block_mesh
from arrow_matrix_tpu.parallel.session import ArrowSession
from arrow_matrix_tpu.plan import compile_plan


def _golden_iterate(A, X, iters):
    ref = X.copy()
    for _ in range(iters):
        ref = A.astype(np.float32) @ ref
    return ref


@pytest.mark.parametrize("block_diagonal", [True, False])
def test_bf16_state_matches_golden(block_diagonal):
    n, width, q, k = 16 * 8 - 3, 16, 8, 8
    A = barabasi_albert(n, 4, seed=0)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=block_diagonal, seed=1
    )
    plan = compile_plan(decomp, width, q, block_diagonal=block_diagonal)
    runner = ArrowSpmm(plan, block_mesh(q), state_dtype=jnp.bfloat16)
    X = random_dense(n, k, seed=7)
    x = runner.distribute(X)
    assert x.dtype == jnp.bfloat16
    iters = 2
    for _ in range(iters):
        x = runner.step(x)
    assert x.dtype == jnp.bfloat16
    got = runner.collect(x)
    assert got.dtype == np.float32
    ref = _golden_iterate(A, X, iters)
    # bf16 carries ~8 mantissa bits; values round once per level per
    # iteration -> a few 1e-2 relative after 2 chained products.
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=5e-2 * scale)


def test_bf16_state_agrees_with_f32_path():
    n, width, q, k = 16 * 8, 16, 8, 8
    A = barabasi_albert(n, 3, seed=4)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    plan = compile_plan(decomp, width, q)
    X = random_dense(n, k, seed=9)

    f32 = ArrowSpmm(plan, block_mesh(q))
    got32 = f32.collect(f32.step(f32.distribute(X)))

    b16 = ArrowSpmm(plan, block_mesh(q), state_dtype=jnp.bfloat16)
    got16 = b16.collect(b16.step(b16.distribute(X)))

    scale = np.abs(got32).max()
    np.testing.assert_allclose(got16, got32, atol=3e-2 * scale)


def test_session_state_dtype_passthrough():
    n, width = 16 * 8 - 5, 16
    A = barabasi_albert(n, 3, seed=2)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=1
    )
    sess = ArrowSession(
        decomp, width, n_devices=8, features=8, state_dtype=jnp.bfloat16
    )
    X = random_dense(n, 8, seed=5)
    sess.set_features(X)
    assert sess._x.dtype == jnp.bfloat16
    sess.run(2)
    got = sess.allgather_result()
    ref = _golden_iterate(A, X, 2)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=5e-2 * scale)


def test_bench_spmm_bf16_state(tmp_path):
    from arrow_matrix_tpu.bench import bench_spmm

    stats = bench_spmm(
        width=32,
        features=8,
        iterations=2,
        ba_vertices=128,
        ba_neighbors=3,
        n_devices=4,
        log_dir=str(tmp_path),
        state_dtype="bfloat16",
    )
    assert stats["iterations"] == 2
    assert stats["nnz_per_s"] > 0


def test_local_step_bf16_state_carry():
    """Merged single-chip plan under an iterated bf16 STATE: the fori carry
    keeps the bf16 dtype through every format branch (local_step casts the
    result back to the state dtype) and tracks the f32 pipeline to the
    per-step output-rounding tolerance."""
    from arrow_matrix_tpu.parallel.local import compile_single_chip, state_cols

    n, width, k, iters = 600, 80, 8, 3
    A = barabasi_albert(n, 4, seed=7)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    plan, step = compile_single_chip(decomp, width, k_hint=k)
    cols = state_cols(plan, k)
    rng = np.random.default_rng(0)
    x0 = np.zeros((plan.padded_rows, cols), np.float32)
    x0[:, :k] = rng.random((plan.padded_rows, k), dtype=np.float32)

    P0 = np.asarray(plan.permutations[0])
    src = np.zeros(n, np.int64)
    src[P0[P0 < n]] = np.nonzero(P0 < n)[0]

    def run(x, it):
        return jax.lax.fori_loop(0, it, lambda i, s: step(plan, s), x)

    xb = jnp.asarray(x0).astype(jnp.bfloat16)
    got = np.asarray(jax.jit(run, static_argnums=1)(xb, iters), np.float32)
    assert got.dtype == np.float32  # materialized view; device dtype below
    assert jax.jit(run, static_argnums=1)(xb, iters).dtype == jnp.bfloat16

    ref = _golden_iterate(A, np.asarray(xb, np.float32)[src][:n, :k], iters)
    scale = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(got[src][:n, :k], ref, atol=5e-2 * scale)
