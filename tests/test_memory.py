"""HBM footprint accounting: the tiled-layout byte rule, exact plan
footprints, and the slim-vs-fat analysis at the production width
(reference: arrow/arrow_mpi.py:26-93 fat layout,
scripts/decomposition_main.py:123 width default)."""

import numpy as np

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert
from arrow_matrix_tpu.plan import compile_plan
from arrow_matrix_tpu.plan.memory import (
    HBM_BUDGET_V5E,
    arrow_hbm_footprint,
    slim_fat_model,
    tpu_padded_bytes,
)


def test_tpu_padded_bytes_matches_measured_layout():
    # Measured on v5e (NOTES.md): an f32 (200064, 8) operand allocates
    # ~100 MB — 200064 sublane-aligned rows x 128 lanes x 4 B.
    assert tpu_padded_bytes((200064, 8)) == 200064 * 128 * 4
    # k = 128 carries zero lane padding.
    assert tpu_padded_bytes((64, 128)) == 64 * 128 * 4
    # Sublane padding: 3 rows round up to 8.
    assert tpu_padded_bytes((3, 130)) == 8 * 256 * 4
    # Leading (stacked) dims multiply, only the two minor dims pad.
    assert tpu_padded_bytes((5, 3, 130)) == 5 * 8 * 256 * 4
    # 1-D and scalar occupy whole tiles.
    assert tpu_padded_bytes((7,)) == 8 * 128 * 4
    assert tpu_padded_bytes(()) == 8 * 128 * 4
    # int16 itemsize halves the bytes (tile shape held at (8, 128)).
    assert tpu_padded_bytes((8, 128), itemsize=2) == 8 * 128 * 2


def test_footprint_of_compiled_plan():
    n, width, q, k = 400, 64, 8, 16
    A = barabasi_albert(n, 4, seed=11)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=3
    )
    plan = compile_plan(decomp, width, q)
    fp = arrow_hbm_footprint(plan, k)
    assert fp["matrix_bytes"] > 0
    assert fp["state_bytes"] == 2 * tpu_padded_bytes((-(-width // q) + width, k))
    assert fp["transient_bytes"] > 0
    assert fp["total_bytes"] == (
        fp["matrix_bytes"]
        + fp["route_bytes"]
        + fp["state_bytes"]
        + fp["transient_bytes"]
    )
    # A toy plan is nowhere near the budget.
    assert fp["fits_v5e"]
    # Multi-level decompositions carry routing tables.
    if fp["levels"] > 1:
        assert fp["route_bytes"] > 0


def test_footprint_is_device_count_independent():
    # The arrow guarantee: per-device memory is O(width*k + nnz/block),
    # INDEPENDENT of device count (reference: README.md:3) — each device
    # holds one width-block of each panel whatever q is, and the state is
    # width-dominated (the block-0 shard w_q is the only q-dependent term).
    n, width = 1024, 128
    A = barabasi_albert(n, 4, seed=1)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=0
    )
    f16 = arrow_hbm_footprint(compile_plan(decomp, width, 16), 16)
    f8 = arrow_hbm_footprint(compile_plan(decomp, width, 8), 16)
    assert f16["matrix_bytes"] == f8["matrix_bytes"]
    assert f16["state_bytes"] <= f8["state_bytes"]


def test_production_width_slim_vs_fat():
    """The quantified fat-layout decision at the reference's production
    scale: width 5M (decompose default), mawi-like totals (~226M rows,
    ~480M nnz -> q = 46 blocks, ~10.4M nnz per block-level)."""
    m = slim_fat_model(
        width=5_000_000, q=46, k=16, nnz_per_block=10.4e6, n_levels=3
    )
    # At k = 16 f32 the 512 B/row lane padding makes the slim device's
    # resident+transient rows (~30M) land within ~2x of the 16 GiB v5e
    # budget — the regime where the reference's fat split is a real lever,
    # not an MPI artifact.
    assert 0.5 * HBM_BUDGET_V5E < m["slim_bytes"] < 2 * HBM_BUDGET_V5E
    # The fat split strictly reduces the bottleneck device's bytes...
    assert m["fat_max_bytes"] < m["slim_bytes"]
    assert m["fat_row_bytes"] < m["fat_col_bytes"]
    # ...and the saving grows when nonzeros concentrate in the head panel
    # (power-law regime), because the head leaves the column device.
    m_head = slim_fat_model(
        width=5_000_000,
        q=46,
        k=16,
        nnz_per_block=10.4e6,
        n_levels=3,
        head_frac=0.8,
        diag_frac=0.1,
    )
    assert m_head["fat_saving_frac"] >= m["fat_saving_frac"]


def test_k128_costs_no_more_hbm_than_k16():
    # The TPU-native remedy for HBM pressure is NOT the fat split but wide
    # features: k = 128 f32 rows cost exactly the same 512 physical bytes
    # as k = 16 (zero lane padding), i.e. 8x the useful work per byte.
    m16 = slim_fat_model(width=5_000_000, q=46, k=16, nnz_per_block=10.4e6)
    m128 = slim_fat_model(width=5_000_000, q=46, k=128, nnz_per_block=10.4e6)
    assert m128["slim_bytes"] == m16["slim_bytes"]


def test_fat_needed_flag():
    # Small config: slim fits, fat is pointless.
    small = slim_fat_model(width=25_000, q=8, k=16, nnz_per_block=200_000)
    assert small["slim_fits"] and not small["fat_needed"]
    # Forced-tiny budget: slim overflows; fat pays iff it fits.
    tight = slim_fat_model(
        width=5_000_000,
        q=46,
        k=16,
        nnz_per_block=10.4e6,
        n_levels=3,
        hbm_budget=int(12e9),
    )
    assert not tight["slim_fits"]
    assert tight["fat_needed"] == tight["fat_fits"]


def test_bf16_state_footprint():
    # bf16 state halves the lane-padded state/replica/wire bytes; matrix
    # panels and the f32 per-block kernel transients are unchanged.
    n, width, q, k = 400, 64, 8, 16
    A = barabasi_albert(n, 4, seed=11)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=3
    )
    plan = compile_plan(decomp, width, q)
    f32 = arrow_hbm_footprint(plan, k)
    f16 = arrow_hbm_footprint(plan, k, state_itemsize=2)
    assert f16["matrix_bytes"] == f32["matrix_bytes"]
    assert f16["route_bytes"] == f32["route_bytes"]
    # Lane padding halves exactly; sublane rounding can only help.
    assert f16["state_bytes"] <= 0.55 * f32["state_bytes"]
    assert f16["transient_bytes"] < f32["transient_bytes"]
    assert f16["total_bytes"] < f32["total_bytes"]
