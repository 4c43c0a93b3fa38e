"""Windowed-X BSR kernel (`ops/bsr_pallas.bsr_spmm_window`) vs scipy.

The windowed kernel is the banded-family whole-matrix executor: X windows
stream from HBM via scalar-prefetched BlockSpec indirection, straddling
tiles fall back to the streaming kernel. Correctness must hold for banded
matrices with and without straddlers, for non-banded (mostly-residual)
matrices, and through the dispatch layer.
"""

import numpy as np
from scipy import sparse

import jax.numpy as jnp

from arrow_matrix_tpu.ops.bsr_pallas import (
    bsr_spmm_window,
    windowed_bsr_from_csr,
    windowed_tile_fraction,
)
from arrow_matrix_tpu.ops.dispatch import windowed_apply


def banded_random(n, bw, density, seed, n_cols=None):
    """Random matrix with nonzeros within +-bw of the diagonal."""
    rng = np.random.default_rng(seed)
    m = n_cols or n
    nnz = int(n * bw * 2 * density)
    rows = rng.integers(0, n, nnz)
    cols = np.clip(rows + rng.integers(-bw, bw + 1, nnz), 0, m - 1)
    A = sparse.csr_matrix(
        (rng.standard_normal(nnz).astype(np.float32), (rows, cols)),
        shape=(n, m),
    )
    A.sum_duplicates()
    return A


def check(A, k=16, window_tiles=4, seed=0):
    m = windowed_bsr_from_csr(A, window_tiles=window_tiles)
    n_pad = m.inner.n_col_tiles * m.inner.tile_n
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n_pad, k)).astype(np.float32)
    y = np.asarray(bsr_spmm_window(m, jnp.asarray(x), interpret=True))
    ref = A @ x[: A.shape[1]]
    np.testing.assert_allclose(y[: A.shape[0]], ref, rtol=1e-4, atol=1e-4)
    return m


def test_banded_no_straddle():
    # Band well inside aligned windows: bw=64 rows << window of 4*128 rows.
    A = banded_random(1500, 64, 0.2, seed=1)
    m = check(A)
    frac = windowed_tile_fraction(A, window_tiles=4)
    assert frac > 0.7  # mostly in-window on a banded matrix


def test_banded_with_straddlers():
    # Band comparable to the window: many rows straddle aligned boundaries.
    A = banded_random(3000, 400, 0.05, seed=2)
    m = check(A)
    assert m.residual is not None and m.residual.n_tiles > 0


def test_scattered_mostly_residual():
    # Uniform random: window captures little; correctness must still hold.
    A = sparse.random(1200, 1200, density=0.01, format="csr",
                      dtype=np.float32, random_state=3)
    check(A)
    assert windowed_tile_fraction(A, window_tiles=2) < 0.9


def test_rectangular_and_empty_rows():
    A = banded_random(700, 50, 0.15, seed=4, n_cols=1100)
    A = A.tolil()
    A[100:260] = 0  # a whole empty tile row
    check(A.tocsr())


def test_empty_matrix():
    A = sparse.csr_matrix((256, 256), dtype=np.float32)
    m = windowed_bsr_from_csr(A, window_tiles=2)
    x = jnp.zeros((m.inner.n_col_tiles * 128, 8), jnp.float32)
    y = np.asarray(bsr_spmm_window(m, x, interpret=True))
    assert not y.any()


def test_windowed_apply_dispatch():
    A = banded_random(900, 80, 0.1, seed=5)
    m = windowed_bsr_from_csr(A, window_tiles=4)
    rng = np.random.default_rng(6)
    # Short operand: windowed_apply pads rows itself.
    x = rng.standard_normal((A.shape[1], 16)).astype(np.float32)
    y = np.asarray(windowed_apply(m, jnp.asarray(x), A.shape[0]))
    np.testing.assert_allclose(y, A @ x, rtol=1e-4, atol=1e-4)


def _grid_decomp(side=60):
    from arrow_matrix_tpu.decomposition import arrow_decomposition
    from arrow_matrix_tpu.io.generate import grid_graph

    A = grid_graph(side)
    width = A.shape[0] // 8 + 1
    decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                                 block_diagonal=True, seed=2)
    return A, width, decomp


def _golden(A, plan, x):
    P0 = np.asarray(plan.permutations[0])
    Af = np.zeros((plan.padded_rows, plan.padded_rows), dtype=np.float32)
    Af[: A.shape[0], : A.shape[0]] = A.toarray()
    return Af[np.ix_(P0, P0)] @ x


def test_forced_window_plan():
    """force_format='window' compiles a windowed merged plan whose step
    matches the golden."""
    import jax
    from arrow_matrix_tpu.parallel.local import compile_local_plan, local_step

    A, width, decomp = _grid_decomp()
    plan = compile_local_plan(decomp, width, k_hint=16,
                              force_format="window", refine="always")
    assert plan.levels[0].fmt == "window"
    rng = np.random.default_rng(1)
    x = rng.standard_normal((plan.padded_rows, 16)).astype(np.float32)
    y = np.asarray(jax.jit(local_step)(jax.device_put(plan), jnp.asarray(x)))
    np.testing.assert_allclose(y, _golden(A, plan, x), rtol=1e-4, atol=1e-4)


def test_calibrated_auto_selection(monkeypatch):
    """With BSR_WINDOW_NS_PER_TILE calibrated (and the VMEM/region gates
    shrunk to test scale), compile_single_chip auto-selects the windowed
    merged plan over the region executor, and the step matches the golden."""
    import jax
    import arrow_matrix_tpu.ops.bsr_pallas as bp
    import arrow_matrix_tpu.ops.tiling as tiling
    import arrow_matrix_tpu.parallel.region as rg_mod
    from arrow_matrix_tpu.parallel.local import compile_single_chip, local_step
    from arrow_matrix_tpu.parallel.local import LocalArrowPlan

    monkeypatch.setattr(bp, "BSR_WINDOW_NS_PER_TILE", 1.0)
    monkeypatch.setattr(tiling, "DEFAULT_VMEM_BUDGET", 1 << 18)
    monkeypatch.setattr(rg_mod, "BSR_REGION_ROWS", 1024)
    A, width, decomp = _grid_decomp()
    plan, step = compile_single_chip(decomp, width, k_hint=16,
                                     refine="always")
    assert isinstance(plan, LocalArrowPlan)
    assert plan.levels[0].fmt == "window"
    assert step is local_step
    rng = np.random.default_rng(1)
    x = rng.standard_normal((plan.padded_rows, 16)).astype(np.float32)
    y = np.asarray(jax.jit(step)(jax.device_put(plan), jnp.asarray(x)))
    np.testing.assert_allclose(y, _golden(A, plan, x), rtol=1e-4, atol=1e-4)


def test_stream_vs_window_competition(monkeypatch):
    """maybe_windowed defers to the streaming kernel when its calibrated
    rate is better, and skips entirely when residency is feasible."""
    import arrow_matrix_tpu.ops.bsr_pallas as bp
    import arrow_matrix_tpu.ops.tiling as tiling
    from arrow_matrix_tpu.ops.dispatch import maybe_windowed

    A = banded_random(3000, 60, 0.3, seed=8)
    monkeypatch.setattr(tiling, "DEFAULT_VMEM_BUDGET", 1 << 18)
    monkeypatch.setattr(bp, "BSR_WINDOW_NS_PER_TILE", 100.0)
    monkeypatch.setattr(bp, "BSR_STREAM_NS_PER_TILE", 50.0)
    assert maybe_windowed(A, 16) is None  # stream wins
    monkeypatch.setattr(bp, "BSR_STREAM_NS_PER_TILE", 500.0)
    assert maybe_windowed(A, 16) is not None  # window wins
    monkeypatch.setattr(tiling, "DEFAULT_VMEM_BUDGET", 8 << 20)
    assert maybe_windowed(A, 16) is None  # resident kernel available
    monkeypatch.setattr(bp, "BSR_WINDOW_NS_PER_TILE", None)
    assert maybe_windowed(A, 16) is None  # uncalibrated


def test_distributed_windowed_roles():
    """A distributed plan with force_format='window' (stacked WindowedBsr
    roles under shard_map) matches the scipy golden over 4 devices."""
    from arrow_matrix_tpu.io.generate import random_dense
    from arrow_matrix_tpu.parallel import ArrowSpmm, block_mesh
    from arrow_matrix_tpu.plan import compile_plan

    width, q = 256, 4
    n = width * q
    rng = np.random.default_rng(11)
    # Block-diagonal arrow structure: head panels + banded diagonal blocks.
    dense = np.zeros((n, n), dtype=np.float32)
    dense[:width, :] = rng.random((width, n)) * (rng.random((width, n)) < 0.02)
    dense[:, :width] = rng.random((n, width)) * (rng.random((n, width)) < 0.02)
    for b in range(q):
        s = b * width
        blk = rng.random((width, width))
        mask = np.abs(np.arange(width)[:, None] - np.arange(width)[None, :]) < 40
        dense[s : s + width, s : s + width] += blk * mask * (blk < 0.3)
    A = sparse.csr_matrix(dense)
    decomp = [(A, np.arange(n))]

    plan = compile_plan(decomp, width, q, force_format="window")
    from arrow_matrix_tpu.ops.bsr_pallas import WindowedBsr

    assert isinstance(plan.levels[0].diag, WindowedBsr)
    runner = ArrowSpmm(plan, block_mesh(q))
    X = random_dense(n, 16, seed=5)
    x = runner.distribute(X)
    ref = X.copy()
    for _ in range(2):
        x = runner.step(x)
        ref = A @ ref
    got = runner.collect(x)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_grid_merged_operator():
    """The target structure: RCM-refined merged grid operator."""
    from arrow_matrix_tpu.decomposition import arrow_decomposition
    from arrow_matrix_tpu.io.generate import grid_graph
    from arrow_matrix_tpu.io.graphio import as_csr
    from arrow_matrix_tpu.parallel.local import merge_levels_to_matrix
    from arrow_matrix_tpu.plan.compile import pad_permutation
    from arrow_matrix_tpu.plan.refine import rcm_refine_merged

    A = grid_graph(45)
    n = A.shape[0]
    width = n // 8 + 1
    decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                                 block_diagonal=True, seed=2)
    mats = [as_csr(d[0]) for d in decomp]
    perms = [np.asarray(d[1], dtype=np.int64) for d in decomp]
    q = max(1, -(-n // width))
    padded = [pad_permutation(p, q * width) for p in perms]
    Bt, cut = merge_levels_to_matrix(mats, padded, np.argsort(padded[0]),
                                     width, q)
    Bt, padded, applied = rcm_refine_merged(Bt, padded, "always")
    m = check(Bt, window_tiles=2)
    # RCM-banded: nearly everything should be in-window.
    frac = windowed_tile_fraction(Bt, window_tiles=2)
    assert frac > 0.6, frac


def test_residual_accumulate_k128():
    """k=128 + all-occupied inner: the residual stream kernel accumulates
    in-place onto the window output (aliased input) — must match the
    separate-add path and scipy."""
    A = banded_random(3000, 400, 0.2, seed=12)  # straddlers -> residual
    m = windowed_bsr_from_csr(A, window_tiles=4)
    assert m.residual is not None and m.inner.all_occupied
    from arrow_matrix_tpu.ops.bsr_pallas import window_padded_rows

    H = window_padded_rows(m)
    rng = np.random.default_rng(13)
    x = np.zeros((H, 128), np.float32)
    x[: A.shape[1]] = rng.standard_normal((A.shape[1], 128), dtype=np.float32)
    y = np.asarray(bsr_spmm_window(m, jnp.asarray(x), interpret=True,
                                   raw=True, out_rows=H))
    ref = A @ x[: A.shape[1]]
    np.testing.assert_allclose(y[: A.shape[0]], ref, rtol=1e-4, atol=1e-4)
    # Tail rows beyond the group grid must be zeroed.
    grp = m.inner.n_row_groups * m.inner.rows_per_program * m.inner.tile_m
    assert not y[grp:].any()


def test_unified_windowed_k128():
    """The unified kernel (one grid, straddlers via conditional manual DMA)
    matches scipy and the two-kernel path on a banded matrix with
    straddlers."""
    from arrow_matrix_tpu.ops.bsr_pallas import window_padded_rows

    A = banded_random(3000, 400, 0.2, seed=21)
    mu = windowed_bsr_from_csr(A, window_tiles=4, unified=True)
    assert mu.tiles_resid is not None and int(np.asarray(mu.tiles_resid).sum())
    m2 = windowed_bsr_from_csr(A, window_tiles=4)
    H = window_padded_rows(mu)
    rng = np.random.default_rng(22)
    x = np.zeros((max(H, window_padded_rows(m2)), 128), np.float32)
    x[: A.shape[1]] = rng.standard_normal((A.shape[1], 128), dtype=np.float32)
    y_u = np.asarray(bsr_spmm_window(mu, jnp.asarray(x[:H]), interpret=True,
                                     raw=True, out_rows=H))
    ref = A @ x[: A.shape[1]]
    np.testing.assert_allclose(y_u[: A.shape[0]], ref, rtol=1e-4, atol=1e-4)
    grp = mu.inner.n_row_groups * mu.inner.rows_per_program * mu.inner.tile_m
    assert not y_u[grp:].any()


def test_unified_windowed_no_straddlers():
    A = banded_random(1500, 64, 0.2, seed=23)
    mu = windowed_bsr_from_csr(A, window_tiles=4, unified=True)
    n_pad = mu.inner.n_col_tiles * 128
    rng = np.random.default_rng(24)
    x = rng.standard_normal((n_pad, 128)).astype(np.float32)
    y = np.asarray(bsr_spmm_window(mu, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y[: A.shape[0]], A @ x[: A.shape[1]],
                               rtol=1e-4, atol=1e-4)


def test_paired_window_span2():
    """window_span=2: a band narrower than W tiles empties the residual and
    the paired-operand kernel matches scipy."""
    A = banded_random(3000, 400, 0.2, seed=31)
    m1 = windowed_bsr_from_csr(A, window_tiles=4)
    m2 = windowed_bsr_from_csr(A, window_tiles=4, window_span=2)
    assert m1.residual is not None
    assert m2.residual is None or m2.residual.n_tiles < m1.residual.n_tiles
    from arrow_matrix_tpu.ops.bsr_pallas import window_padded_rows

    H = window_padded_rows(m2)
    rng = np.random.default_rng(32)
    x = np.zeros((H, 16), np.float32)
    x[: A.shape[1]] = rng.standard_normal((A.shape[1], 16), dtype=np.float32)
    y = np.asarray(bsr_spmm_window(m2, jnp.asarray(x), interpret=True,
                                   raw=True, out_rows=H))
    ref = A @ x[: A.shape[1]]
    np.testing.assert_allclose(y[: A.shape[0]], ref, rtol=1e-4, atol=1e-4)


def test_paired_window_scattered_keeps_residual():
    """Uniform-random columns exceed even the 2W span: correctness holds
    through the residual path."""
    A = sparse.random(1200, 1200, density=0.01, format="csr",
                      dtype=np.float32, random_state=33)
    m = windowed_bsr_from_csr(A, window_tiles=2, window_span=2)
    n_pad = (m.n_windows + 1) * 2 * 128
    n_pad = max(n_pad, m.inner.n_col_tiles * 128)
    rng = np.random.default_rng(34)
    x = np.zeros((n_pad, 8), np.float32)
    x[: A.shape[1]] = rng.standard_normal((A.shape[1], 8), dtype=np.float32)
    y = np.asarray(bsr_spmm_window(m, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y[: A.shape[0]], A @ x[: A.shape[1]],
                               rtol=1e-4, atol=1e-4)


def test_resolve_tile_dtype_auto():
    """'auto' picks bfloat16 only when every value is exactly
    bf16-representable; explicit dtypes pass through untouched."""
    from arrow_matrix_tpu.ops.bsr_pallas import resolve_tile_dtype

    assert resolve_tile_dtype("auto", np.ones(7, np.float32)) == jnp.bfloat16
    assert resolve_tile_dtype("auto", np.array([1.0, -2.0, 0.5])) == jnp.bfloat16
    assert resolve_tile_dtype("auto", np.array([0.1], np.float32)) == np.float32
    assert resolve_tile_dtype("auto", np.array([np.nan])) == np.float32
    assert resolve_tile_dtype("auto", np.zeros(0)) == np.float32
    assert resolve_tile_dtype(None, np.array([1.0])) == np.float32
    assert resolve_tile_dtype(jnp.bfloat16, np.array([0.1])) == jnp.bfloat16


def test_bf16_tiles_bitexact_on_unit_weights():
    """Lossless bf16 tile payloads: the kernels upcast tiles to f32 before
    the dot, so unit-weight matrices give BIT-identical results to the f32
    payload with half the tile stream."""
    A = banded_random(3000, 300, 0.3, seed=40)
    A.data[:] = 1.0
    mf = windowed_bsr_from_csr(A, window_tiles=4, dtype=np.float32)
    mb = windowed_bsr_from_csr(A, window_tiles=4, dtype=jnp.bfloat16)
    assert mb.inner.tiles_data.dtype == jnp.bfloat16
    if mb.residual is not None:
        assert mb.residual.tiles_data.dtype == jnp.bfloat16
    n_pad = max((mf.n_windows + mf.window_span - 1) * 4 * 128,
                mf.inner.n_col_tiles * 128)
    rng = np.random.default_rng(41)
    x = np.zeros((n_pad, 16), np.float32)
    x[: A.shape[1]] = rng.standard_normal((A.shape[1], 16), dtype=np.float32)
    yf = np.asarray(bsr_spmm_window(mf, jnp.asarray(x), interpret=True))
    yb = np.asarray(bsr_spmm_window(mb, jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(yf, yb)


def test_compile_single_chip_auto_bf16(monkeypatch):
    """compile_single_chip's window branch packs bf16 tile payloads under
    matrix_dtype='auto' on unit-weight operators and stays correct."""
    import jax
    import arrow_matrix_tpu.ops.bsr_pallas as bp
    import arrow_matrix_tpu.parallel.region as rg_mod
    from arrow_matrix_tpu.parallel.local import (
        LocalArrowPlan,
        compile_single_chip,
        local_step,
        state_cols,
    )

    import arrow_matrix_tpu.ops.tiling as tiling

    monkeypatch.setattr(rg_mod, "BSR_REGION_ROWS", 1024)
    monkeypatch.setattr(tiling, "DEFAULT_VMEM_BUDGET", 1 << 18)
    monkeypatch.setattr(bp, "BSR_WINDOW_NS_PER_TILE", 1.0)
    A, width, decomp = _grid_decomp(side=60)
    plan, step = compile_single_chip(decomp, width, k_hint=16,
                                     refine="always")
    assert isinstance(plan, LocalArrowPlan)
    assert plan.levels[0].fmt == "window"
    assert plan.levels[0].mat.inner.tiles_data.dtype == jnp.bfloat16
    rng = np.random.default_rng(42)
    cols = state_cols(plan, 16)
    x = np.zeros((plan.padded_rows, cols), np.float32)
    x[:, :16] = rng.random((plan.padded_rows, 16), dtype=np.float32)
    y = np.asarray(jax.jit(step)(jax.device_put(plan), jnp.asarray(x)))
    np.testing.assert_allclose(
        _golden(A, plan, x[:, :16]), y[: x.shape[0], :16], rtol=1e-4, atol=1e-4
    )


def test_window_k_real_narrow_dots():
    """Opt-in k_real: dots run at the real feature count while the operand
    rides lane-padded 128 columns; lanes beyond k_real come back zero and
    the live lanes match the full-width result exactly (with and without a
    residual / aliased accumulate)."""
    from arrow_matrix_tpu.ops.bsr_pallas import window_padded_rows

    A = banded_random(3000, 400, 0.2, seed=21)  # straddlers -> residual
    m = windowed_bsr_from_csr(A, window_tiles=4)
    assert m.residual is not None
    H = window_padded_rows(m)
    rng = np.random.default_rng(5)
    k = 16
    x = np.zeros((H, 128), np.float32)
    x[: A.shape[1], :k] = rng.standard_normal(
        (A.shape[1], k), dtype=np.float32
    )
    full = np.asarray(bsr_spmm_window(m, jnp.asarray(x), interpret=True,
                                      raw=True, out_rows=H))
    narrow = np.asarray(bsr_spmm_window(m, jnp.asarray(x), interpret=True,
                                        raw=True, out_rows=H, k_real=k))
    np.testing.assert_allclose(narrow[:, :k], full[:, :k], rtol=1e-5,
                               atol=1e-5)
    assert not narrow[:, k:].any()
    np.testing.assert_allclose(
        narrow[: A.shape[0], :k], A @ x[: A.shape[1], :k],
        rtol=1e-4, atol=1e-4,
    )


def test_window_bf16_state_pipeline():
    """bf16 operand on the span-1 path: out dtype bf16, window/stream dots
    run natively (products exact in the f32 accumulator), result matches
    the f32 pipeline to one bf16 output rounding."""
    from arrow_matrix_tpu.ops.bsr_pallas import window_padded_rows

    A = banded_random(3000, 400, 0.2, seed=31)
    m = windowed_bsr_from_csr(A, dtype=jnp.bfloat16, window_tiles=4)
    assert m.residual is not None
    H = window_padded_rows(m)
    rng = np.random.default_rng(6)
    x32 = np.zeros((H, 128), np.float32)
    x32[: A.shape[1]] = rng.standard_normal(
        (A.shape[1], 128), dtype=np.float32
    )
    xb = jnp.asarray(x32).astype(jnp.bfloat16)
    y = bsr_spmm_window(m, xb, interpret=True, raw=True, out_rows=H)
    assert y.dtype == jnp.bfloat16
    # Golden on the bf16-rounded input: products exact, one output round.
    ref = (A.astype(np.float32)
           @ np.asarray(xb, dtype=np.float32)[: A.shape[1]])
    got = np.asarray(y[: A.shape[0]], dtype=np.float32)
    denom = max(np.abs(ref).max(), 1e-30)
    assert np.abs(got - ref).max() / denom < 1e-2


def test_auto_gate_picks_windowed_on_natural_banded():
    """Round-5 gate recalibration (VERDICT r4 item 3): a naturally banded
    operator beyond the VMEM residency bound (grid-202k in natural order —
    the 1.5D/PETSc baselines' own input, no RCM) must auto-select the
    windowed kernel. The old flat nnz*1.25*plateau ELL pricing ignored both
    the R>=8 slot rounding (grid rows: 4 nnz -> 8 slots) and the near-cliff
    source-rate ramp, rating ELL a wash where it measures 1.8x slower
    (tools/probe_ell_rate.py). Scattered families must stay unchanged."""
    from arrow_matrix_tpu.io.generate import barabasi_albert, grid_graph
    from arrow_matrix_tpu.ops.dispatch import maybe_windowed

    assert maybe_windowed(grid_graph(450), 16) is not None
    assert maybe_windowed(barabasi_albert(50_000, 4, seed=1), 16) is None


def test_ell_slot_ns_curve():
    """The measured slot-rate ramp: plateau below 40k rows, monotone
    non-decreasing, big-source rate at 1M+."""
    from arrow_matrix_tpu.ops.bsr_pallas import (
        ELL_NS_PER_SLOT_BIG,
        ell_slot_ns,
    )

    assert ell_slot_ns(1_000) == ell_slot_ns(40_000) == 2.0
    rates = [ell_slot_ns(r) for r in
             (40_000, 90_000, 202_500, 302_500, 1 << 20, 10 << 20)]
    assert all(a <= b + 1e-12 for a, b in zip(rates, rates[1:]))
    assert rates[-1] == ELL_NS_PER_SLOT_BIG
