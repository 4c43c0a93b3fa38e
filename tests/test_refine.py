"""Merged-layout RCM refinement (plan/refine.py): gating and correctness.

The refinement relabels the merged single-chip operator with global RCM and
composes the relayout into ``plan.permutations[0]`` — callers see identical
semantics through distribute/collect, while banded families gain tile
density (BSR eligibility). ``auto`` must adopt only when occupied tiles
shrink materially (grid: yes; scattered BA: no — measured host-side).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert, grid_graph, random_dense
from arrow_matrix_tpu.io.graphio import as_csr
from arrow_matrix_tpu.ops.bsr_pallas import tile_density_stats
from arrow_matrix_tpu.parallel.local import (
    compile_local_plan,
    local_step,
    merge_levels_to_matrix,
)
from arrow_matrix_tpu.parallel.region import compile_region_plan, region_step
from arrow_matrix_tpu.plan.compile import pad_permutation
from arrow_matrix_tpu.plan.refine import rcm_refine_merged


def _merged(A, width, seed=2):
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=seed
    )
    mats = [as_csr(d[0]) for d in decomp]
    perms = [np.asarray(d[1], dtype=np.int64) for d in decomp]
    n = mats[0].shape[0]
    q = max(1, -(-n // width))
    padded = [pad_permutation(p, q * width) for p in perms]
    Bt, cut = merge_levels_to_matrix(mats, padded, np.argsort(padded[0]), width, q)
    return decomp, Bt, padded, cut


def test_auto_gate_adopts_on_grid_rejects_on_ba():
    A = grid_graph(60)  # banded/planar: RCM clusters tiles
    _, Bt, padded, _ = _merged(A, 500)
    Bt2, padded2, applied = rcm_refine_merged(Bt, padded, "auto")
    assert applied
    occ0, nnz0, _ = tile_density_stats(Bt)
    occ2, nnz2, _ = tile_density_stats(Bt2)
    assert nnz2 == nnz0
    assert occ2 < occ0

    A = barabasi_albert(3000, 4, seed=0)  # scattered: RCM does not help
    _, Bt, padded, _ = _merged(A, 400)
    _, _, applied = rcm_refine_merged(Bt, padded, "auto")
    assert not applied


def test_refined_permutation_is_consistent_relabeling():
    # Bt2[r, c] must equal Bt[order[r], order[c]] where order is recoverable
    # from the composed permutation: p0'[r] = p0[order[r]].
    A = grid_graph(40)
    _, Bt, padded, cut = _merged(A, 300)
    Bt2, padded2, applied = rcm_refine_merged(Bt, padded, "always")
    assert applied
    p0 = np.asarray(padded[0])
    inv_p0 = np.argsort(p0)
    order = inv_p0[np.asarray(padded2[0])[:cut]]
    assert np.array_equal(np.sort(order), np.arange(cut))
    ref = Bt[order][:, order].tocsr()
    assert (Bt2 != ref).nnz == 0
    # Padding range and deeper-level permutations are untouched.
    assert np.array_equal(np.asarray(padded2[0])[cut:], p0[cut:])
    for a, b in zip(padded[1:], padded2[1:]):
        assert a is b


@pytest.mark.parametrize("mode", ["always", "auto"])
def test_local_step_golden_with_refine(mode):
    A = grid_graph(50)
    width = 320
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=3
    )
    plan = compile_local_plan(decomp, width, k_hint=8, refine=mode)
    n = A.shape[0]
    X = random_dense(n, 8, seed=7)
    perm0 = np.asarray(plan.permutations[0])
    Xp = np.zeros((plan.padded_rows, 8), dtype=np.float32)
    Xp[:n] = X
    x = jnp.asarray(Xp[perm0])
    ref = X.copy()
    for _ in range(2):
        x = jax.jit(local_step)(plan, x)
        ref = A.astype(np.float32) @ ref
    got = np.asarray(x)[np.argsort(perm0)][:n]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_refine_never_matches_refine_always_after_collect():
    # The relayout is pure I/O-permutation composition: un-permuted results
    # must agree bit-for-bit in exact arithmetic up to float addition order.
    A = grid_graph(36)
    width = 250
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=1
    )
    n = A.shape[0]
    X = random_dense(n, 4, seed=5)
    outs = []
    for mode in ("never", "always"):
        plan = compile_local_plan(decomp, width, k_hint=4, refine=mode)
        perm0 = np.asarray(plan.permutations[0])
        Xp = np.zeros((plan.padded_rows, 4), dtype=np.float32)
        Xp[:n] = X
        y = np.asarray(local_step(plan, jnp.asarray(Xp[perm0])))
        outs.append(y[np.argsort(perm0)][:n])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)


def test_region_step_golden_with_refine():
    A = grid_graph(50)
    width = 320
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=3
    )
    plan = compile_region_plan(
        decomp, width, k_hint=8, region_rows=700, refine="always"
    )
    n = A.shape[0]
    X = random_dense(n, 8, seed=9)
    perm0 = np.asarray(plan.permutations[0])
    Xp = np.zeros((plan.padded_rows, 8), dtype=np.float32)
    Xp[:n] = X
    x = jnp.asarray(Xp[perm0])
    ref = X.copy()
    for _ in range(2):
        x = jax.jit(region_step)(plan, x)
        ref = A.astype(np.float32) @ ref
    got = np.asarray(x)[np.argsort(perm0)][:n]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_refine_mode_validation_and_empty():
    A = barabasi_albert(500, 3, seed=4)
    _, Bt, padded, _ = _merged(A, 100)
    with pytest.raises(ValueError):
        rcm_refine_merged(Bt, padded, "sometimes")
    Bt0, padded0, applied = rcm_refine_merged(Bt, padded, "never")
    assert Bt0 is Bt and padded0 is padded and not applied


def test_compile_single_chip_selects_region_on_banded(monkeypatch):
    from arrow_matrix_tpu.parallel.local import compile_single_chip
    from arrow_matrix_tpu.parallel.region import RegionPlan

    # Banded family above the VMEM residency bound -> the calibrated
    # windowed merged plan (round 3); with the windowed kernel
    # UNCALIBRATED the region executor is the fallback (a smaller grid
    # stays merged because cut <= BSR_REGION_ROWS).
    A = grid_graph(140)  # 19600 vertices, cut > 16384
    width = 19600 // 8 + 1
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    plan, step_fn = compile_single_chip(decomp, width, k_hint=8)
    from arrow_matrix_tpu.parallel.local import LocalArrowPlan as _LAP

    assert isinstance(plan, _LAP) and plan.levels[0].fmt == "window"

    import arrow_matrix_tpu.ops.bsr_pallas as bp

    monkeypatch.setattr(bp, "BSR_WINDOW_NS_PER_TILE", None)
    plan, step_fn = compile_single_chip(decomp, width, k_hint=8)
    assert isinstance(plan, RegionPlan)

    # Scattered family -> merged local plan regardless of size.
    A = barabasi_albert(20000, 4, seed=1)
    decomp = arrow_decomposition(
        A, 2500, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    plan, step_fn = compile_single_chip(decomp, 2500, k_hint=8)
    from arrow_matrix_tpu.parallel.local import LocalArrowPlan

    assert isinstance(plan, LocalArrowPlan)


def test_compile_single_chip_golden():
    from arrow_matrix_tpu.parallel.local import compile_single_chip

    A = grid_graph(140)
    width = A.shape[0] // 8 + 1
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    plan, step_fn = compile_single_chip(decomp, width, k_hint=8)
    n = A.shape[0]
    X = random_dense(n, 8, seed=13)
    perm0 = np.asarray(plan.permutations[0])
    Xp = np.zeros((plan.padded_rows, 8), dtype=np.float32)
    Xp[:n] = X
    x = jnp.asarray(Xp[perm0])
    ref = X.copy()
    for _ in range(2):
        x = jax.jit(step_fn)(plan, x)
        ref = A.astype(np.float32) @ ref
    got = np.asarray(x)[np.argsort(perm0)][:n]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_auto_skew_pregate_skips_power_law_cheaply():
    # The degree-skew pre-gate must reject power-law structure before paying
    # for RCM (46s wasted on a 31M-nnz RMAT without it, measured).
    from unittest import mock

    A = barabasi_albert(3000, 4, seed=0)
    _, Bt, padded, _ = _merged(A, 400)
    with mock.patch(
        "arrow_matrix_tpu.plan.refine.reverse_cuthill_mckee",
        side_effect=AssertionError("RCM must not run on power-law input"),
    ):
        _, _, applied = rcm_refine_merged(Bt, padded, "auto")
    assert not applied
    # 'always' bypasses both gates and adopts unconditionally.
    _, _, applied = rcm_refine_merged(Bt, padded, "always")
    assert applied


def test_antisymmetric_values_do_not_cancel_pattern():
    """RCM must order the PATTERN: A + A.T on antisymmetric values cancels
    to an empty graph (scipy drops explicit zeros) and RCM would return a
    meaningless order. Regression for the |values| symmetrization."""
    from scipy import sparse

    n = 1024
    rng = np.random.default_rng(7)
    # Banded antisymmetric matrix under a scrambling permutation.
    i = np.arange(n - 1)
    upper = sparse.csr_matrix(
        (rng.random(n - 1) + 0.5, (i, i + 1)), shape=(n, n)
    )
    band = (upper - upper.T).tocsr()  # A[i,j] = -A[j,i] exactly
    scramble = rng.permutation(n)
    Bt = band[scramble][:, scramble].tocsr()
    padded = [np.arange(n)]
    Bt2, _, applied = rcm_refine_merged(Bt, padded, "always")
    assert applied
    occ_before, _, _ = tile_density_stats(Bt)
    occ_after, _, _ = tile_density_stats(Bt2)
    # A correct pattern-RCM recovers near-tridiagonal order (few occupied
    # tiles); cancellation would leave the scrambled layout untouched.
    assert occ_after < occ_before // 2, (occ_before, occ_after)
