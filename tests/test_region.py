"""Region-partitioned single-chip executor: golden agreement and structure.

The region plan must compute exactly the merged local plan's operator
(``sum_i P_rel_i^T B_i P_rel_i`` in level-0 order) while cutting every
gather source below the measured v5e cliff (region.py docstring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import (
    barabasi_albert,
    erdos_renyi,
    grid_graph,
    random_dense,
)
from arrow_matrix_tpu.parallel.local import compile_local_plan, local_step
from arrow_matrix_tpu.parallel.region import (
    DEFAULT_REGION_ROWS,
    GATHER_CLIFF_ROWS,
    RegionPlan,
    compile_region_plan,
    region_step,
)


def _run(A, width, region_rows, iters=2, k=8, seed=3):
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=seed
    )
    plan = compile_region_plan(decomp, width, k_hint=k, region_rows=region_rows)
    n = A.shape[0]
    X = random_dense(n, k, seed=7)
    perm0 = np.asarray(plan.permutations[0])
    Xp = np.zeros((plan.padded_rows, k), dtype=np.float32)
    Xp[:n] = X
    x = jnp.asarray(Xp[perm0])
    step = jax.jit(region_step)
    ref = X.copy()
    for _ in range(iters):
        x = step(plan, x)
        ref = A.astype(np.float32) @ ref
    got = np.asarray(x)[np.argsort(perm0)][:n]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    return plan


@pytest.mark.parametrize(
    "graph,region_rows",
    [
        ("ba", 700),
        ("ba", 512),  # region not a multiple of width
        ("er", 640),
        ("grid", 800),
    ],
)
def test_region_matches_golden(graph, region_rows):
    if graph == "ba":
        A = barabasi_albert(3000, 4, seed=0)
        width = 400
    elif graph == "er":
        A = erdos_renyi(1500, 0.01, seed=2)
        width = 300
    else:
        A = grid_graph(50)
        width = 320
    plan = _run(A, width, region_rows)
    assert len(plan.region_rows) > 1
    # Every region sits on the plateau and stripes tile the cut exactly.
    assert all(r <= region_rows for r in plan.region_rows)
    assert sum(plan.stripe_rows) == plan.cut


def test_region_ragged_tail_and_padding():
    # n not a multiple of width: padded rows beyond the cut must stay zero.
    A = barabasi_albert(2977, 3, seed=1)
    plan = _run(A, 350, 512)
    assert plan.padded_rows % plan.width == 0
    assert plan.cut <= plan.padded_rows


def test_region_single_region_degenerates_to_merged():
    # region_rows >= cut: one region, one stripe — same operator as the
    # merged local plan.
    A = barabasi_albert(800, 3, seed=5)
    decomp = arrow_decomposition(
        A, 128, max_number_of_levels=100, block_diagonal=True, seed=3
    )
    rplan = compile_region_plan(decomp, 128, k_hint=8, region_rows=10_000)
    assert len(rplan.region_rows) == 1
    lplan = compile_local_plan(decomp, 128, k_hint=8)
    X = random_dense(A.shape[0], 8, seed=11)
    Xp = np.zeros((rplan.padded_rows, 8), dtype=np.float32)
    Xp[: A.shape[0]] = X
    x = jnp.asarray(Xp[np.asarray(rplan.permutations[0])])
    yr = np.asarray(region_step(rplan, x))
    yl = np.asarray(local_step(lplan, x))
    np.testing.assert_allclose(yr, yl, rtol=1e-5, atol=1e-5)


def test_region_default_sizing_under_cliff():
    assert DEFAULT_REGION_ROWS < GATHER_CLIFF_ROWS
    A = barabasi_albert(4000, 3, seed=6)
    decomp = arrow_decomposition(
        A, 500, max_number_of_levels=100, block_diagonal=True, seed=3
    )
    plan = compile_region_plan(decomp, 500, k_hint=16)
    assert isinstance(plan, RegionPlan)
    # Small problem: defaults collapse to a single region.
    assert len(plan.region_rows) == 1


def test_region_iterated_weighted():
    # Weighted symmetric matrix, several iterations.
    rng = np.random.default_rng(8)
    A = barabasi_albert(2000, 4, seed=9).astype(np.float32)
    A.data = rng.random(A.nnz).astype(np.float32) + 0.5
    A = ((A + A.T) / 2).tocsr()
    _run(A, 300, 600, iters=3)
