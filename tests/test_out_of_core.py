"""Out-of-core plan compilation: memory-mapped triplet levels stream through
``extract_levels`` one stripe at a time, match the in-memory plan
bit-for-bit, and never materialize whole levels."""

import tracemalloc

import numpy as np
import pytest

import jax

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io import graphio
from arrow_matrix_tpu.io.generate import barabasi_albert, random_dense
from arrow_matrix_tpu.plan import compile_plan
from arrow_matrix_tpu.plan.compile import extract_levels, iter_levels


def _plans_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("block_diagonal", [True, False])
def test_triplet_plan_matches_in_memory(tmp_path, block_diagonal):
    n, width, q = 400, 64, 8
    A = barabasi_albert(n, 4, seed=11)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=block_diagonal, seed=3
    )
    base = str(tmp_path / "g")
    graphio.save_decomposition_new(A, decomp, base, block_diagonal=block_diagonal)
    mm = graphio.load_decomposition_new(
        base, width, block_diagonal=block_diagonal, mem_map=True
    )
    assert all(isinstance(m, tuple) for m, _ in mm)

    plan_mem = compile_plan(decomp, width, q, block_diagonal=block_diagonal)
    plan_mm = compile_plan(mm, width, q, block_diagonal=block_diagonal)
    _plans_equal(plan_mem, plan_mm)


def test_streaming_peak_memory_bounded(tmp_path):
    # A decomposition whose materialized levels would dwarf a single stripe:
    # peak tracemalloc inside extract_levels must stay well under the full
    # materialization (reference equivalent: rank-0 streaming distribution,
    # arrow/arrow_dec_mpi.py:629-887).
    n, width, q = 30_000, 3_750, 8
    A = barabasi_albert(n, 40, seed=1)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=0
    )
    base = str(tmp_path / "big")
    graphio.save_decomposition_new(A, decomp, base)
    mm = graphio.load_decomposition_new(base, width, mem_map=True)

    # One full float32-CSR materialization of all levels (data + int32
    # indices). The OUTPUT blocks themselves total ~this much — they ARE the
    # plan — so the streaming bound is: peak < output + one stripe + O(n),
    # i.e. under 2x a single materialization. The previous in-memory path
    # held the padded level, its row-localized permuted copy and the sliced
    # blocks simultaneously (4-5x).
    full_bytes = sum(graphio.csr_nnz(m) * 8 for m, _ in mm)
    tracemalloc.start()
    raw = extract_levels(mm, width, q, block_diagonal=True)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(raw[0]) == len(mm)
    assert peak < 2 * full_bytes, (peak, full_bytes)


@pytest.mark.parametrize("block_diagonal", [True, False])
def test_iter_levels_matches_extract_levels(tmp_path, block_diagonal):
    """The streaming generator (compile_plan's path since round 5) yields
    the SAME raw levels and FINAL permutations as the list variant — the
    row-localization hoist must not change what the consumer sees."""
    n, width, q = 500, 64, 8
    A = barabasi_albert(n, 4, seed=9)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=block_diagonal,
        seed=2,
    )
    base = str(tmp_path / "s")
    graphio.save_decomposition_new(A, decomp, base, block_diagonal=block_diagonal)
    mm = graphio.load_decomposition_new(
        base, width, block_diagonal=block_diagonal, mem_map=True
    )
    lv, perms, n1 = extract_levels(mm, width, q, block_diagonal=block_diagonal)
    gen, perms2, n2 = iter_levels(mm, width, q, block_diagonal=block_diagonal)
    # Permutations are final BEFORE the generator runs (hoisted localization).
    assert n1 == n2
    for a, b in zip(perms, perms2):
        np.testing.assert_array_equal(a, b)
    lv2 = list(gen)
    assert len(lv) == len(lv2)
    for a, b in zip(lv, lv2):
        assert a.n_active_blocks == b.n_active_blocks
        for role in ("head", "diag", "col", "band_lo", "band_hi"):
            ra, rb = getattr(a, role), getattr(b, role)
            assert (ra is None) == (rb is None)
            for x, y in zip(ra or (), rb or ()):
                assert (x != y).nnz == 0


def test_triplet_plan_runs_end_to_end(tmp_path):
    from arrow_matrix_tpu.parallel import ArrowSpmm, block_mesh

    n, width, q = 16 * 8 - 5, 16, 8
    A = barabasi_albert(n, 3, seed=2)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=1
    )
    base = str(tmp_path / "e2e")
    graphio.save_decomposition_new(A, decomp, base)
    mm = graphio.load_decomposition_new(base, width, mem_map=True)
    plan = compile_plan(mm, width, q)
    runner = ArrowSpmm(plan, block_mesh(q))
    X = random_dense(n, 8, seed=5)
    got = runner.collect(runner.step(runner.distribute(X)))
    from arrow_matrix_tpu.decomposition.arrow import compute_spmm

    ref = compute_spmm(
        graphio.load_decomposition_new(base, width), X
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
