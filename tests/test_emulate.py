"""Batched SPMD emulation (parallel/emulate.py) goldens: the emulated step
must match BOTH the host scipy iteration and the virtual-mesh distributed
runner across the format/routing/dtype matrix the distributed step covers
(reference test shape: tests/test_arrowmpi.py end-to-end SpMM goldens)."""

import numpy as np
import pytest

import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import (
    barabasi_albert,
    grid_graph,
    random_dense,
)
from arrow_matrix_tpu.parallel import ArrowSpmm, block_mesh
from arrow_matrix_tpu.parallel.emulate import EmulatedSpmm
from arrow_matrix_tpu.plan import compile_plan


def _golden_check(A, width, block_diagonal, q=8, k=16, iters=3,
                  routing="auto", state_dtype=jnp.float32, rtol=2e-4,
                  batch="scan"):
    dec = arrow_decomposition(
        A, arrow_width=width, max_number_of_levels=6,
        block_diagonal=block_diagonal,
    )
    plan = compile_plan(
        dec, width, q, block_diagonal=block_diagonal, routing=routing
    )
    emu = EmulatedSpmm(plan, state_dtype=state_dtype, batch=batch)
    X = random_dense(A.shape[0], k, seed=42)
    xs = emu.distribute(X)
    ref = X.copy()
    for _ in range(iters):
        xs = emu.step(xs)
        ref = A @ ref
    got = emu.collect(xs)
    if state_dtype == jnp.float32:
        np.testing.assert_allclose(got, ref, rtol=rtol, atol=rtol)
    else:  # bf16 state rounds once per level per iteration
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
        assert err < 0.15, f"bf16 rel err {err}"
    return plan, emu


@pytest.mark.parametrize("batch", ["scan", "vmap"])
def test_ba_block_diagonal_matches_host(batch):
    """Power-law graph, gather-ELL stacked roles, all_to_all routing."""
    A = barabasi_albert(3000, 3, seed=1)
    _golden_check(A, 384, block_diagonal=True, batch=batch)


@pytest.mark.parametrize("batch", ["scan", "unroll", "vmap"])
def test_grid_banded_matches_host(batch):
    """Planar graph, banded halo + CompactEll/Bsr stacked roles."""
    A = grid_graph(56)
    _golden_check(A, 512, block_diagonal=False, batch=batch)


@pytest.mark.parametrize("batch", ["scan", "vmap"])
def test_rounds_routing_matches_host(batch):
    """Round-decomposed ppermute exchange (static partial permutations)."""
    A = barabasi_albert(3000, 3, seed=2)
    _golden_check(A, 384, block_diagonal=True, routing="rounds", batch=batch)


@pytest.mark.parametrize("batch", ["scan", "vmap"])
def test_bf16_state_matches_host(batch):
    A = grid_graph(56)
    _golden_check(A, 512, block_diagonal=False, state_dtype=jnp.bfloat16,
                  batch=batch)


def test_emulated_matches_distributed_bitwise_close():
    """The emulation IS the distributed program: against the virtual-mesh
    shard_map runner the only differences are reduction orders, so the two
    must agree far tighter than either agrees with scipy."""
    A = barabasi_albert(3000, 3, seed=3)
    dec = arrow_decomposition(
        A, arrow_width=384, max_number_of_levels=6, block_diagonal=True
    )
    plan = compile_plan(dec, 384, 8, block_diagonal=True)
    X = random_dense(A.shape[0], 16, seed=7)

    emu = EmulatedSpmm(plan)
    xe = emu.run(emu.distribute(X), 3)

    mesh = block_mesh(8)
    dist = ArrowSpmm(plan, mesh)
    xd = dist.distribute(X)
    for _ in range(3):
        xd = dist.step(xd)

    np.testing.assert_allclose(
        emu.collect(xe), dist.collect(xd), rtol=1e-5, atol=1e-5
    )


def test_run_fori_matches_stepwise():
    A = grid_graph(40)
    dec = arrow_decomposition(
        A, arrow_width=256, max_number_of_levels=6, block_diagonal=False
    )
    plan = compile_plan(dec, 256, 8, block_diagonal=False)
    emu = EmulatedSpmm(plan)
    X = random_dense(A.shape[0], 8, seed=0)
    xs = emu.distribute(X)
    looped = emu.run(xs, 4)
    stepped = xs
    for _ in range(4):
        stepped = emu.step(stepped)
    np.testing.assert_allclose(
        np.asarray(looped), np.asarray(stepped), rtol=1e-5, atol=1e-5
    )


def test_fat_layout_rejected():
    A = barabasi_albert(2000, 3, seed=1)
    dec = arrow_decomposition(
        A, arrow_width=512, max_number_of_levels=6, block_diagonal=True
    )
    plan = compile_plan(dec, 512, 4, block_diagonal=True, row_split=2)
    with pytest.raises(NotImplementedError):
        EmulatedSpmm(plan)
