"""Folded-source gather path: exactness vs the plain path and scipy.

On v5e, row-gathers from lane-padded (N, k<=16) sources fall off a
measured rate cliff past ~262k rows; ``ops.ell`` then folds 128//k logical
rows into one dense 128-lane physical row and recovers the sub-row with a
one-hot select fused into the consuming einsum (see
``ops/ell.py:FOLD_SOURCE_ROWS``). The select multiplies by exact 0/1, so
folded results must be BIT-IDENTICAL in structure to the plain path up to
float summation order. These tests force the folded path on tiny fixtures
by lowering the threshold.
"""

import numpy as np
import pytest
from scipy import sparse

import jax
import jax.numpy as jnp

from arrow_matrix_tpu.io.generate import barabasi_albert, random_csr
from arrow_matrix_tpu.ops import ell as ell_mod
from arrow_matrix_tpu.ops.dispatch import apply_mat, build_block_format
from arrow_matrix_tpu.ops.ell import big_take, compact_ell_spmm, ell_spmm, packed_ell_spmm
from arrow_matrix_tpu.ops.formats import (
    compact_ell_from_csr,
    ell_from_csr,
    packed_ell_from_csr,
)


@pytest.fixture
def force_fold(monkeypatch):
    monkeypatch.setattr(ell_mod, "FOLD_SOURCE_ROWS", 8)


@pytest.mark.parametrize("k", [16, 8, 4])
def test_big_take_matches_plain(force_fold, k):
    rng = np.random.default_rng(0)
    for n in (64, 61):  # divisible and non-divisible by 128//k
        x = rng.standard_normal((n, k)).astype(np.float32)
        idx = rng.integers(0, n, size=(37,)).astype(np.int32)
        out = np.asarray(jax.jit(big_take)(jnp.asarray(x), jnp.asarray(idx)))
        np.testing.assert_array_equal(out, x[idx])


def test_big_take_2d_indices(force_fold):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((40, 16)).astype(np.float32)
    idx = rng.integers(0, 40, size=(5, 7)).astype(np.int32)
    out = np.asarray(jax.jit(big_take)(jnp.asarray(x), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, x[idx])


def test_big_take_plain_when_k_odd(force_fold):
    # k that does not divide 128 falls back to the plain gather.
    rng = np.random.default_rng(2)
    x = rng.standard_normal((50, 24)).astype(np.float32)
    idx = rng.integers(0, 50, size=(9,)).astype(np.int32)
    out = np.asarray(jax.jit(big_take)(jnp.asarray(x), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, x[idx])


@pytest.mark.parametrize("k", [16, 8])
def test_ell_spmm_folded(force_fold, k):
    A = barabasi_albert(512, 8, seed=3)
    rng = np.random.default_rng(4)
    X = rng.random((A.shape[1], k), dtype=np.float32)
    m = ell_from_csr(A, slots_per_row=8)
    Y = np.asarray(jax.jit(ell_spmm)(m, jnp.asarray(X)))
    np.testing.assert_allclose(Y, A @ X, rtol=1e-5, atol=1e-5)


def test_ell_spmm_folded_chunked(force_fold, monkeypatch):
    monkeypatch.setattr(ell_mod, "MAX_GATHER_SLOTS", 256)
    A = barabasi_albert(512, 8, seed=5)
    rng = np.random.default_rng(6)
    X = rng.random((A.shape[1], 16), dtype=np.float32)
    m = ell_from_csr(A, slots_per_row=8)
    Y = np.asarray(jax.jit(ell_spmm)(m, jnp.asarray(X)))
    np.testing.assert_allclose(Y, A @ X, rtol=1e-5, atol=1e-5)


def test_packed_and_compact_folded(force_fold):
    rng = np.random.default_rng(7)
    # ultra-sparse: rows with <= 8 nonzeros, many empty rows
    A = random_csr(300, 300, 2, seed=8)
    X = rng.random((300, 16), dtype=np.float32)
    pm = packed_ell_from_csr(A)
    Y = np.asarray(jax.jit(packed_ell_spmm)(pm, jnp.asarray(X)))
    np.testing.assert_allclose(Y, A @ X, rtol=1e-5, atol=1e-5)
    cm = compact_ell_from_csr(A)
    Y = np.asarray(jax.jit(compact_ell_spmm)(cm, jnp.asarray(X)))
    np.testing.assert_allclose(Y, A @ X, rtol=1e-5, atol=1e-5)


def test_local_step_folded_end_to_end(force_fold):
    from arrow_matrix_tpu.decomposition import arrow_decomposition
    from arrow_matrix_tpu.parallel.local import compile_local_plan, local_step

    A = barabasi_albert(2_000, 4, seed=9)
    width = 256
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    plan = compile_local_plan(decomp, width)
    n = A.shape[0]
    rng = np.random.default_rng(10)
    X = rng.random((n, 16), dtype=np.float32)
    perm0 = np.asarray(plan.permutations[0])
    Xp = np.zeros((plan.padded_rows, 16), dtype=np.float32)
    Xp[:n] = X
    y = np.asarray(
        jax.jit(local_step)(jax.device_put(plan), jnp.asarray(Xp[perm0]))
    )
    got = y[np.argsort(perm0)][:n]
    np.testing.assert_allclose(got, A.astype(np.float32) @ X, rtol=1e-4, atol=1e-4)


def test_blocked_step_folded_end_to_end(force_fold):
    from arrow_matrix_tpu.decomposition import arrow_decomposition
    from arrow_matrix_tpu.parallel.blocked import (
        blocked_step,
        compile_blocked_plan,
    )

    A = barabasi_albert(2_000, 4, seed=11)
    width = 256
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    plan = compile_blocked_plan(decomp, width)
    n = A.shape[0]
    rng = np.random.default_rng(12)
    X = rng.random((n, 16), dtype=np.float32)
    perm0 = np.asarray(plan.permutations[0])
    Xp = np.zeros((plan.n_blocks * plan.width, 16), dtype=np.float32)
    Xp[:n] = X
    y = np.asarray(
        jax.jit(blocked_step)(jax.device_put(plan), jnp.asarray(Xp[perm0]))
    )
    got = y[np.argsort(perm0)][:n]
    np.testing.assert_allclose(got, A.astype(np.float32) @ X, rtol=1e-4, atol=1e-4)
