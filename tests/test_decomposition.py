"""Decomposition property tests — tier (a) of the reference test strategy
(reference: tests/test_arrowdecomposition.py): permutation validity,
edge-disjoint union reconstruction, arrow-width criterion, numerical SpMM
reconstruction, and save/load roundtrips."""

import numpy as np
import pytest
from scipy import sparse

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.decomposition.arrow import compute_spmm, get_arrow_width
from arrow_matrix_tpu.io import graphio
from arrow_matrix_tpu.io.generate import barabasi_albert, erdos_renyi


def fixtures():
    """Synthetic fixtures mirroring the reference's
    (reference: tests/test_arrowdecomposition.py:14-22)."""
    out = [barabasi_albert(2**i, 4, seed=503 + i) for i in range(4, 8)]
    out += [barabasi_albert(2**i, 8, seed=3434 + i) for i in range(5, 8)]
    out += [erdos_renyi(2**i, 0.1, seed=i) for i in range(5, 8)]
    out += [barabasi_albert(2**i, 3, seed=i, directed=True) for i in range(8, 10)]
    return out


WIDTH_DIVISORS = [4, 8, 10]


@pytest.mark.parametrize("block_diagonal", [True, False])
def test_arrow_properties(block_diagonal):
    rng = np.random.default_rng(42)
    for A in fixtures():
        n = A.shape[0]
        X = rng.random((n, 16), dtype=np.float32)
        for wc in WIDTH_DIVISORS:
            width = n // wc + 1
            decomp = arrow_decomposition(
                A, width, max_number_of_levels=100,
                block_diagonal=block_diagonal, seed=7,
            )

            total_nnz = 0
            acc = sparse.csr_matrix((n, n), dtype=np.float32)
            for li, ag in enumerate(decomp):
                # Permutations are true permutations.
                assert np.array_equal(np.sort(ag.permutation), np.arange(n))

                # Arrow-width criterion for every edge.
                coo = ag.matrix.tocoo()
                w = ag.arrow_width
                last = li == len(decomp) - 1
                if block_diagonal and not last:
                    ok = (
                        ((coo.row // w) == (coo.col // w))
                        | (coo.row < w)
                        | (coo.col < w)
                    )
                else:
                    ok = (
                        (np.abs(coo.row - coo.col) <= w)
                        | (coo.row < w)
                        | (coo.col < w)
                    )
                assert ok.all()

                total_nnz += ag.matrix.nnz
                P = sparse.csr_matrix(
                    (np.ones(n, np.float32), (np.arange(n), ag.permutation)),
                    shape=(n, n),
                )
                acc = acc + P.T @ ag.matrix @ P

            # Levels are edge-disjoint and their union is A: exact additive
            # reconstruction sum_i P_i^T B_i P_i == A.
            assert total_nnz == A.nnz
            diff = (acc - A.astype(np.float32)).tocoo()
            assert diff.nnz == 0 or np.abs(diff.data).max() < 1e-6

            # Numerical SpMM reconstruction vs. scipy golden.
            assert np.allclose(compute_spmm(decomp, X), A @ X, atol=1e-4)


def test_max_levels_best_effort():
    A = barabasi_albert(256, 4, seed=1)
    decomp = arrow_decomposition(A, 40, max_number_of_levels=2, seed=3)
    assert len(decomp) <= 2
    # Last level may report a larger best-effort width.
    last = decomp[-1]
    assert last.arrow_width >= 40
    assert last.arrow_width == get_arrow_width(last.matrix, 40)
    X = np.random.default_rng(0).random((256, 16), dtype=np.float32)
    assert np.allclose(compute_spmm(decomp, X), A @ X, atol=1e-4)


def test_weighted_matrix_supported():
    """Weighted matrices round-trip through the decomposition (beyond the
    reference, whose igraph path only supports unit weights)."""
    rng = np.random.default_rng(5)
    A = barabasi_albert(128, 4, seed=9).astype(np.float32)
    A.data = rng.uniform(0.5, 2.0, A.nnz).astype(np.float32)
    decomp = arrow_decomposition(A, 33, max_number_of_levels=100, seed=11)
    X = rng.random((128, 8), dtype=np.float32)
    assert np.allclose(compute_spmm(decomp, X), A @ X, atol=1e-4)


@pytest.mark.parametrize("new_format", [True, False])
def test_save_load_roundtrip(tmp_path, new_format):
    A = barabasi_albert(128, 4, seed=77)
    width = 33
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=1
    )
    base = str(tmp_path / "d")
    if new_format:
        graphio.save_decomposition_new(A, decomp, base, block_diagonal=True)
        loaded = graphio.load_decomposition_new(base, width, block_diagonal=True)
    else:
        graphio.save_decomposition(A, decomp, base, block_diagonal=True)
        loaded = graphio.load_decomposition(base, width, block_diagonal=True)
    assert len(loaded) == len(decomp)
    residual = sparse.csr_matrix(A, dtype=np.float32)
    n = A.shape[0]
    for B, perm in loaded:
        P = sparse.csr_matrix(
            (np.ones(n, np.float32), (np.arange(n), perm)), shape=(n, n)
        )
        residual = residual - P.T @ B @ P
    assert abs(residual).max() if residual.nnz else 0.0 == 0.0


@pytest.mark.parametrize("legacy_naming", [False, True])
def test_convert_decomposition(tmp_path, legacy_naming):
    """Legacy npz -> npy-triplet converter (reference: graphio.py:317-358),
    covering both historical npz naming schemes."""
    A = barabasi_albert(96, 4, seed=3)
    width = 25
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=1
    )
    base = str(tmp_path / "c")
    if legacy_naming:
        # Older scheme: bd marker BEFORE the level index.
        for i, (B, _) in enumerate(decomp):
            sparse.save_npz(f"{base}_B_{width}_bd_{i}.npz", sparse.csr_matrix(B))
    else:
        graphio.save_decomposition(A, decomp, base, block_diagonal=True)
    converted = graphio.convert_decomposition(base, width, block_diagonal=True)
    assert len(converted) == len(decomp)
    assert all(p is None for _, p in converted)
    # The written triplets load back (permutations saved separately when the
    # non-legacy save produced them).
    for i, (B, _) in enumerate(decomp):
        path = graphio.format_path(
            base, width, i, True, graphio.DecompositionFileType.indices_npy
        )
        got = np.load(path)
        assert np.array_equal(got, sparse.csr_matrix(B).indices)


def test_mmap_load(tmp_path):
    A = barabasi_albert(64, 3, seed=4)
    decomp = arrow_decomposition(A, 17, max_number_of_levels=100, seed=2)
    base = str(tmp_path / "m")
    graphio.save_decomposition_new(A, decomp, base, block_diagonal=True)
    loaded = graphio.load_decomposition_new(base, 17, block_diagonal=True, mem_map=True)
    assert len(loaded) == len(decomp)
    data, indices, indptr = loaded[0][0]
    B0 = sparse.csr_matrix((np.asarray(data), np.asarray(indices), np.asarray(indptr)))
    assert abs(B0 - decomp[0].matrix).max() if (B0 - decomp[0].matrix).nnz else 0.0 == 0.0


def test_dataless_load_means_ones(tmp_path):
    """Missing _data.npy means unweighted → ones
    (reference: graphio.py:292-298)."""
    import os

    A = barabasi_albert(64, 3, seed=4)
    decomp = arrow_decomposition(A, 17, max_number_of_levels=100, seed=2)
    base = str(tmp_path / "u")
    graphio.save_decomposition_new(A, decomp, base, block_diagonal=True)
    for i, ag in enumerate(decomp):
        os.remove(
            graphio.format_path(
                base, ag.arrow_width, i, True, graphio.DecompositionFileType.data_npy
            )
        )
    loaded = graphio.load_decomposition_new(base, 17, block_diagonal=True)
    assert all(np.all(B.data == 1.0) for B, _ in loaded)


def test_grid_graph_planar_family():
    """Planar-family fixture (the reference's headline graph class,
    README.md:3): decomposition is shallow and exactly reconstructs."""
    from arrow_matrix_tpu.io.generate import grid_graph

    A = grid_graph(32)  # 1024 vertices
    decomp = arrow_decomposition(
        A, 128, max_number_of_levels=100, block_diagonal=True, seed=0
    )
    assert len(decomp) <= 3  # planar graphs decompose shallowly
    X = np.random.default_rng(0).random((1024, 8), dtype=np.float32)
    np.testing.assert_allclose(compute_spmm(decomp, X), A @ X, rtol=1e-4, atol=1e-4)


def test_native_partition_matches_numpy():
    # The fused C++ edge split must produce byte-identical levels to the
    # numpy mask pipeline for the same linear orders (same seed).
    from arrow_matrix_tpu.decomposition import native

    if not native.AVAILABLE:
        import pytest

        pytest.skip("native core not built")
    import numpy as np

    from arrow_matrix_tpu.io.generate import barabasi_albert

    A = barabasi_albert(600, 5, seed=3)
    for block_diagonal in (True, False):
        d_native = arrow_decomposition(
            A, 97, max_number_of_levels=100,
            block_diagonal=block_diagonal, seed=7, native=True,
        )
        d_numpy = arrow_decomposition(
            A, 97, max_number_of_levels=100,
            block_diagonal=block_diagonal, seed=7, native=False,
        )
        # native=False also changes the forest backend; orders may differ, so
        # compare reconstructions, level counts and per-level widths instead
        # of bytes.
        assert len(d_native) == len(d_numpy)
        X = np.random.default_rng(0).random((600, 4)).astype(np.float32)
        np.testing.assert_allclose(
            compute_spmm(d_native, X), compute_spmm(d_numpy, X),
            rtol=1e-4, atol=1e-4,
        )


def test_native_partition_edges_exact():
    from arrow_matrix_tpu.decomposition import native

    if not native.AVAILABLE:
        import pytest

        pytest.skip("native core not built")
    import numpy as np
    from scipy import sparse as sp

    rng = np.random.default_rng(5)
    n = 300
    A = sp.random(n, n, density=0.05, random_state=rng, format="csr")
    A = sp.csr_matrix(A, dtype=np.float32)
    A.sum_duplicates()
    A.sort_indices()
    order = rng.permutation(n)
    inv = np.argsort(order)
    width = 40
    for block_diagonal in (True, False):
        for prune in (True, False):
            B, L = native.partition_edges(A, inv, width, block_diagonal, prune)
            coo = A.tocoo()
            pu, pv = inv[coo.row], inv[coo.col]
            if block_diagonal:
                in_arrow = (pu // width) == (pv // width)
            else:
                in_arrow = np.abs(pu - pv) <= width
            if prune:
                in_arrow |= (pu < width) | (pv < width)
            B_ref = sp.csr_matrix(
                (coo.data[in_arrow], (pu[in_arrow], pv[in_arrow])), shape=A.shape
            )
            L_ref = sp.csr_matrix(
                (coo.data[~in_arrow], (coo.row[~in_arrow], coo.col[~in_arrow])),
                shape=A.shape,
            )
            assert (B != B_ref).nnz == 0
            assert (L != L_ref).nnz == 0
    B_all, L_none = native.partition_edges(
        A, inv, width, True, True, keep_all=True
    )
    coo = A.tocoo()
    B_ref = sp.csr_matrix((coo.data, (inv[coo.row], inv[coo.col])), shape=A.shape)
    assert (B_all != B_ref).nnz == 0 and L_none is None


def test_native_bincount_matches_numpy():
    from arrow_matrix_tpu.decomposition import native

    if not native.AVAILABLE:
        import pytest

        pytest.skip("native core not built")
    import numpy as np

    rng = np.random.default_rng(5)
    for dt in (np.int32, np.int64):
        idx = rng.integers(0, 500, size=4000).astype(dt)
        np.testing.assert_array_equal(
            native.bincount_indices(idx, 500),
            np.bincount(idx, minlength=500),
        )
    # Huge-bin regime: per-thread histograms would cost threads * n_bins *
    # 8 B (tens of GB at reference vertex counts); above the 256 MB budget
    # the C++ core switches to zero-extra-memory bin-range partitioning.
    n_bins = 12_000_000
    idx = rng.integers(0, n_bins, size=(1 << 21) + 17).astype(np.int64)
    np.testing.assert_array_equal(
        native.bincount_indices(idx, n_bins),
        np.bincount(idx, minlength=n_bins),
    )


def test_symmetric_flag_identical_decomposition():
    # symmetric=True only swaps the degree computation (2*out vs out+in);
    # on a symmetric pattern the decomposition must be byte-identical.
    import numpy as np
    from scipy import sparse as sp

    from arrow_matrix_tpu.io.generate import barabasi_albert

    A = barabasi_albert(800, 4, seed=11)  # symmetrized by construction
    assert (A != A.T).nnz == 0
    for block_diagonal in (True, False):
        d_sym = arrow_decomposition(
            A, 120, max_number_of_levels=100,
            block_diagonal=block_diagonal, seed=3, symmetric=True,
        )
        d_gen = arrow_decomposition(
            A, 120, max_number_of_levels=100,
            block_diagonal=block_diagonal, seed=3, symmetric=False,
        )
        assert len(d_sym) == len(d_gen)
        for a, b in zip(d_sym, d_gen):
            np.testing.assert_array_equal(a.permutation, b.permutation)
            assert (a.matrix != b.matrix).nnz == 0
            assert a.arrow_width == b.arrow_width
