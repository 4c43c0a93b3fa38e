"""Multi-row program grouping in the BSR kernels (rows_per_program > 1).

Round-3 hardware study (tools/bench_bsr_tb.py) measured a fixed ~312 ns
per grid step plus ~111 ns per streamed (128,128) tile; thin banded rows
(~4 occupied tiles per tile row after RCM) therefore pay 2x padding at the
historical TB=8 and one grid step per 4 tiles. Grouping consecutive tile
rows into one program removes the padding and amortizes the step cost.
These tests pin the packing invariants and interpret-mode correctness of
the grouped resident/stream/window kernels against scipy.
"""

import numpy as np
import pytest
from scipy import sparse

import jax.numpy as jnp

from arrow_matrix_tpu.ops.bsr_pallas import (
    bsr_from_csr,
    bsr_spmm,
    bsr_spmm_stream,
    bsr_spmm_window,
    choose_program_shape,
    stack_bsr_from_csr,
    windowed_bsr_from_csr,
)


def banded(n, bw, density, seed, n_cols=None):
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


def test_choose_program_shape_thin_rows():
    # 4 tiles in every row: grouping should eliminate padding (TB*RP a
    # multiple of 4) and amortize programs (RP > 1).
    counts = np.full(1600, 4)
    tb, rp = choose_program_shape(counts)
    assert rp > 1
    assert (tb * rp) % 4 == 0 or tb % 4 == 0
    # padded tiles at the choice must equal the real tiles (no padding)
    gc = counts.reshape(-1, rp).sum(axis=1)
    assert ((-(-gc // tb) * tb) == gc).all()


def test_choose_program_shape_wide_rows():
    # 64 tiles per row: padding is never an issue; larger TB just cuts
    # program count, bounded by max_tb.
    counts = np.full(64, 64)
    tb, rp = choose_program_shape(counts)
    assert tb * rp >= 16


@pytest.mark.parametrize("rp,tb", [(2, 4), (4, 8), (4, 16), (8, 4)])
def test_grouped_resident_matches_scipy(rp, tb):
    A = banded(1500, 100, 0.08, seed=1)
    m = bsr_from_csr(A, tiles_per_program=tb, rows_per_program=rp)
    assert m.rows_per_program == rp
    n_pad = m.n_col_tiles * 128
    x = np.random.default_rng(0).standard_normal((n_pad, 16)).astype(np.float32)
    y = np.asarray(bsr_spmm(m, jnp.asarray(x), interpret=True))
    ref = A @ x[: A.shape[1]]
    np.testing.assert_allclose(y[: A.shape[0]], ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("rp,tb", [(2, 4), (4, 8)])
def test_grouped_stream_matches_scipy(rp, tb):
    A = banded(1200, 80, 0.1, seed=2, n_cols=900)
    m = bsr_from_csr(A, tiles_per_program=tb, rows_per_program=rp)
    n_pad = m.n_col_tiles * 128
    x = np.random.default_rng(3).standard_normal((n_pad, 8)).astype(np.float32)
    y = np.asarray(bsr_spmm_stream(m, jnp.asarray(x), interpret=True))
    ref = A @ x[: A.shape[1]]
    np.testing.assert_allclose(y[: A.shape[0]], ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("rp", [2, 4])
def test_grouped_window_matches_scipy(rp):
    A = banded(2000, 150, 0.06, seed=4)
    m = windowed_bsr_from_csr(A, window_tiles=4, tiles_per_program=8,
                              rows_per_program=rp)
    assert m.inner.rows_per_program == rp
    n_pad = m.inner.n_col_tiles * 128
    x = np.random.default_rng(5).standard_normal((n_pad, 16)).astype(np.float32)
    y = np.asarray(bsr_spmm_window(m, jnp.asarray(x), interpret=True))
    ref = A @ x[: A.shape[1]]
    np.testing.assert_allclose(y[: A.shape[0]], ref, rtol=1e-4, atol=1e-4)


def test_grouped_window_auto_shape():
    """Default (auto) program shape on a banded matrix picks RP > 1 and
    stays correct, including residual straddlers."""
    A = banded(3000, 400, 0.05, seed=6)
    m = windowed_bsr_from_csr(A, window_tiles=4)
    n_pad = m.inner.n_col_tiles * 128
    x = np.random.default_rng(7).standard_normal((n_pad, 16)).astype(np.float32)
    y = np.asarray(bsr_spmm_window(m, jnp.asarray(x), interpret=True))
    ref = A @ x[: A.shape[1]]
    np.testing.assert_allclose(y[: A.shape[0]], ref, rtol=1e-4, atol=1e-4)


def test_grouped_empty_rows_and_groups():
    A = banded(2000, 60, 0.1, seed=8).tolil()
    A[256:640] = 0  # empty tile rows spanning whole groups
    A = A.tocsr()
    m = bsr_from_csr(A, tiles_per_program=4, rows_per_program=4)
    n_pad = m.n_col_tiles * 128
    x = np.random.default_rng(9).standard_normal((n_pad, 8)).astype(np.float32)
    y = np.asarray(bsr_spmm(m, jnp.asarray(x), interpret=True))
    ref = A @ x[: A.shape[1]]
    np.testing.assert_allclose(y[: A.shape[0]], ref, rtol=1e-4, atol=1e-4)


def test_stacked_grouped_shared_shape():
    """stack_bsr_from_csr with auto shape: one (TB, RP) across blocks,
    per-block results match scipy."""
    blocks = [banded(640, 50, 0.15, seed=s) for s in (10, 11, 12)]
    m = stack_bsr_from_csr(blocks, tiles_per_program=None)
    assert m.tiles_data.ndim == 4
    for i, b in enumerate(blocks):
        sub = type(m)(
            tiles_data=m.tiles_data[i],
            tiles_col=m.tiles_col[i],
            prog_rows=m.prog_rows[i],
            row_occupied=m.row_occupied[i],
            n_rows=m.n_rows,
            n_cols=m.n_cols,
            tile_m=m.tile_m,
            tile_n=m.tile_n,
            n_row_tiles=m.n_row_tiles,
            n_col_tiles=m.n_col_tiles,
            tiles_per_program=m.tiles_per_program,
            tiles_lrow=m.tiles_lrow[i],
            rows_per_program=m.rows_per_program,
        )
        n_pad = m.n_col_tiles * 128
        x = np.random.default_rng(i).standard_normal(
            (n_pad, 8)).astype(np.float32)
        y = np.asarray(bsr_spmm(sub, jnp.asarray(x), interpret=True))
        ref = b @ x[: b.shape[1]]
        np.testing.assert_allclose(y[: b.shape[0]], ref, rtol=1e-4, atol=1e-4)
