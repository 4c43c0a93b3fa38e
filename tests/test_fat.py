"""Fat-layout distributed arrow SpMM (parallel/fat.py) on the 8-device
virtual CPU mesh: the TPU-native generalization of the reference's 2q−1-rank
fat layout (reference: arrow/arrow_mpi.py:26-93) as a (block, half) mesh with
row-split panels. Goldens mirror tests/test_arrow_spmm.py; additionally the
per-device memory claim (matrix bytes scale 1/row_split) is asserted on the
compiled plans."""

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
from arrow_matrix_tpu.parallel.fat import FatArrowSpmm, fat_mesh
from arrow_matrix_tpu.plan import compile_plan


def _run_fat(A, decomposition, width, q, r, iters=3, k=16,
             block_diagonal=True, state_dtype=np.float32, tol=2e-4):
    mesh = fat_mesh(q, r)
    plan = compile_plan(
        decomposition, width, q, block_diagonal=block_diagonal, row_split=r
    )
    runner = FatArrowSpmm(plan, mesh, state_dtype=state_dtype)
    n = A.shape[0]
    X = random_dense(n, k, seed=42)
    x = runner.distribute(X)
    ref = X.copy()
    for _ in range(iters):
        x = runner.step(x)
        ref = A @ ref
    got = runner.collect(x)
    scale = max(np.abs(ref).max(), 1e-30)
    assert np.abs(got - ref).max() / scale < tol, (
        np.abs(got - ref).max() / scale
    )
    return plan, runner


def _arrow_structured(n, width, seed=0):
    """Structured arrow matrix cut to head panels + diagonal blocks."""
    A = structured_arrow_matrix(n, width, seed=seed)
    coo = A.tocoo()
    keep = (
        (coo.row < width)
        | (coo.col < width)
        | ((coo.row // width) == (coo.col // width))
    )
    return sparse.csr_matrix(
        (coo.data[keep], (coo.row[keep], coo.col[keep])), shape=A.shape
    )


def test_fat_single_matrix_4x2():
    """One arrow matrix over a (block=4, half=2) mesh vs iterated golden
    (reference fat runtime: arrow/arrow_mpi.py:98-121)."""
    width, q, r = 32, 4, 2
    n = width * q
    A = _arrow_structured(n, width)
    _run_fat(A, [(A, np.arange(n))], width, q, r)


def test_fat_banded_matrix():
    """Banded (non-block-diagonal) fat mode: the ppermute halo rides the
    block axis within each half (reference: arrow/arrow_mpi.py:123-175)."""
    width, q, r = 16, 4, 2
    n = width * q
    rng = np.random.default_rng(3)
    dense = np.zeros((n, n), dtype=np.float32)
    dense[:width, :] = rng.random((width, n)) * (rng.random((width, n)) < 0.2)
    dense[:, :width] = rng.random((n, width)) * (rng.random((n, width)) < 0.2)
    for d in range(-width, width + 1):
        diag = rng.random(n - abs(d)) * (rng.random(n - abs(d)) < 0.1)
        dense += np.diag(diag, d)
    A = sparse.csr_matrix(dense)
    _run_fat(A, [(A, np.arange(n))], width, q, r, block_diagonal=False)


def test_fat_decomposed_graph_end_to_end():
    """Decomposed Barabási graph through the fat runner: exercises the
    fat-aware routing tables (row_split owners) across levels."""
    q, r = 4, 2
    n, m_edges = 256, 4
    A = barabasi_albert(n, m_edges, seed=n)
    width = 64
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=1
    )
    X = random_dense(n, 16, seed=0)
    np.testing.assert_allclose(
        compute_spmm(decomp, X), A @ X, rtol=1e-4, atol=1e-4
    )
    _run_fat(A, decomp, width, q, r, iters=3)


def test_fat_matches_slim():
    """Fat and slim runners produce identical results on the same
    decomposition (same math, different layout)."""
    from arrow_matrix_tpu.parallel import ArrowSpmm, block_mesh

    q, r = 4, 2
    n = 320
    A = barabasi_albert(n, 3, seed=7)
    width = 80
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    X = random_dense(n, 8, seed=5)

    slim_plan = compile_plan(decomp, width, q)
    slim = ArrowSpmm(slim_plan, block_mesh(q))
    y_slim = slim.collect(slim.step(slim.distribute(X)))

    fat_plan = compile_plan(decomp, width, q, row_split=r)
    fat = FatArrowSpmm(fat_plan, fat_mesh(q, r))
    y_fat = fat.collect(fat.step(fat.distribute(X)))

    np.testing.assert_allclose(y_fat, y_slim, rtol=1e-5, atol=1e-5)


def test_fat_memory_split():
    """The fat plan's per-device matrix payload is ~1/r of slim's: the
    heaviest device's format-array bytes shrink by at least 1.6x at r=2
    (the reference's fat memory claim, arrow/arrow_mpi.py:26-93, measured
    on the compiled plans rather than assumed)."""
    q, r = 4, 2
    # Width well above the 128-row BSR tile so the row split is visible
    # through tile quantization (a w_loc < tile_m half still pads to a
    # whole tile row).
    n = 2048
    A = _arrow_structured(n, 512, seed=1)
    decomp = [(A, np.arange(n))]

    def max_device_bytes(plan, n_dev):
        per_dev = np.zeros(n_dev)
        for lvl in plan.levels:
            for role in (lvl.head, lvl.diag, lvl.col):
                if role is None:
                    continue
                for leaf in jax.tree.leaves(role):
                    a = np.asarray(leaf)
                    if a.ndim and a.shape[0] == n_dev:
                        per_dev += np.array(
                            [a[i].nbytes for i in range(n_dev)]
                        )
        return per_dev.max()

    slim_plan = compile_plan(decomp, 512, q)
    fat_plan = compile_plan(decomp, 512, q, row_split=r)
    slim_max = max_device_bytes(slim_plan, q)
    fat_max = max_device_bytes(fat_plan, q * r)
    assert fat_max < slim_max / 1.6, (fat_max, slim_max)


def test_fat_width_divisibility():
    n = 96
    A = _arrow_structured(n, 24, seed=2)
    with pytest.raises(ValueError, match="divisible"):
        compile_plan([(A, np.arange(n))], 24, 4, row_split=5)


def test_fat_bf16_state():
    """bf16 iteration state through the fat runner (capacity lever +
    layout compose)."""
    import jax.numpy as jnp

    width, q, r = 32, 4, 2
    n = width * q
    A = _arrow_structured(n, width, seed=4)
    _run_fat(
        A, [(A, np.arange(n))], width, q, r, iters=2,
        state_dtype=jnp.bfloat16, tol=5e-2,
    )


def test_fat_session_api():
    """ArrowSession(row_split=2) — the user-facing fat mode mirroring the
    reference's ArrowMPI runtime choice (arrow/arrow_mpi.py:98-121)."""
    from arrow_matrix_tpu.parallel.session import ArrowSession

    q, r = 4, 2
    n = 256
    A = barabasi_albert(n, 4, seed=5)
    decomp = arrow_decomposition(
        A, 64, max_number_of_levels=100, block_diagonal=True, seed=1
    )
    sess = ArrowSession(decomp, 64, n_devices=q, row_split=r)
    X = random_dense(n, 8, seed=3)
    sess.set_features(X)
    sess.run(2)
    got = sess.allgather_result()
    np.testing.assert_allclose(got, A @ (A @ X), rtol=2e-4, atol=2e-4)


def test_fat_rounds_routing_matches_all_to_all():
    """Forced rounds-mode routing on the FAT (tuple-axis) mesh is
    bit-identical to the all_to_all exchange — exercises the ppermute
    device-numbering remap (arrow_spmm._perm_pairs: ppermute under a tuple
    axis numbers devices mesh row-major, not half-major)."""
    q, r = 4, 2
    n = 16 * 4 - 3
    A = barabasi_albert(n, 4, seed=0)
    width = 16
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=1
    )
    X = random_dense(n, 8, seed=5)
    got = {}
    for mode in ("all_to_all", "rounds"):
        plan = compile_plan(decomp, width, q, row_split=r, routing=mode)
        if mode == "rounds":
            assert any(
                lvl.route is not None and lvl.route.rounds_mode
                for lvl in plan.levels
            )
        runner = FatArrowSpmm(plan, fat_mesh(q, r))
        got[mode] = runner.collect(runner.step(runner.distribute(X)))
    np.testing.assert_array_equal(got["rounds"], got["all_to_all"])
    ref = A @ X
    np.testing.assert_allclose(got["rounds"], ref, rtol=1e-4, atol=1e-4)
