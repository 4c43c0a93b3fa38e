"""CLI, metrics, bench driver, and native-core tests."""

import json
import os

import numpy as np
import pytest
from scipy import sparse

from arrow_matrix_tpu.decomposition import arrow_decomposition, native
from arrow_matrix_tpu.decomposition.arrow import compute_spmm
from arrow_matrix_tpu.io import graphio
from arrow_matrix_tpu.io.generate import barabasi_albert, random_dense
from arrow_matrix_tpu.utils import metrics


def test_metrics_buffer_and_sink(tmp_path):
    metrics.wandb_init("TestAlgo", "testdata", config={"width": 7})
    metrics.set_iteration_data({"iteration": 0})
    metrics.log({"spmm_kernel_time": 0.5})
    metrics.log({"spmm_kernel_time": 0.25})  # accumulates
    metrics.set_iteration_data({"iteration": 1})
    metrics.log({"spmm_time": 1.0})
    path = metrics.finish(str(tmp_path))
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["spmm_kernel_time"] == 0.75
    assert recs[1]["spmm_time"] == 1.0
    config = json.load(open(path.replace(".jsonl", ".config")))
    assert config["algorithm"] == "TestAlgo" and config["width"] == 7


def test_metrics_span(tmp_path):
    metrics.wandb_init("SpanAlgo", "d")
    metrics.set_iteration_data({"iteration": 0})
    with metrics.span("phase_time"):
        pass
    path = metrics.finish(str(tmp_path))
    rec = json.loads(open(path).readline())
    assert "phase_time" in rec


def test_bench_spmm_smoke(tmp_path):
    from arrow_matrix_tpu.bench import bench_spmm

    stats = bench_spmm(
        width=32,
        features=8,
        iterations=2,
        ba_vertices=128,
        ba_neighbors=3,
        n_devices=4,
        log_dir=str(tmp_path),
    )
    assert stats["iterations"] == 2
    assert stats["nnz_per_s"] > 0
    assert os.path.exists(stats["log_path"])


def test_bench_spmm_single_device(tmp_path):
    from arrow_matrix_tpu.bench import bench_spmm

    stats = bench_spmm(
        width=32,
        features=8,
        iterations=2,
        ba_vertices=96,
        ba_neighbors=3,
        n_devices=1,
        log_dir=str(tmp_path),
    )
    assert stats["median_spmm_time"] > 0


def test_bench_spmm_from_path(tmp_path):
    from arrow_matrix_tpu.bench import bench_spmm

    A = barabasi_albert(128, 3, seed=5)
    decomp = arrow_decomposition(A, 33, max_number_of_levels=100,
                                 block_diagonal=True, seed=0)
    base = str(tmp_path / "g")
    graphio.save_decomposition_new(A, decomp, base, block_diagonal=True)
    stats = bench_spmm(
        path=base, width=33, features=4, iterations=1, n_devices=4,
        log_dir=str(tmp_path),
    )
    assert stats["levels"] == len(decomp)


def test_bench_spmm_mmap_path(tmp_path):
    from arrow_matrix_tpu.bench import bench_spmm

    A = barabasi_albert(128, 3, seed=5)
    decomp = arrow_decomposition(A, 33, max_number_of_levels=100,
                                 block_diagonal=True, seed=0)
    base = str(tmp_path / "g")
    graphio.save_decomposition_new(A, decomp, base, block_diagonal=True)
    stats = bench_spmm(
        path=base, width=33, features=4, iterations=1, n_devices=1,
        use_mmap=True, log_dir=str(tmp_path),
    )
    assert stats["levels"] == len(decomp)
    assert stats["nnz"] == sum(int(g.matrix.nnz) for g in decomp)


def test_mixed_width_levels_load_fully(tmp_path):
    # Power-law graphs commonly produce a best-effort last level whose arrow
    # width exceeds the requested width; loaders key on ONE width, so the
    # save must not hide deeper levels behind their own widths (previously
    # 40% of nonzeros silently dropped).
    from arrow_matrix_tpu.decomposition.arrow import ArrowGraph

    rng = np.random.default_rng(3)
    n = 64
    B0 = sparse.random(n, n, density=0.05, random_state=rng, format="csr")
    B1 = sparse.random(n, n, density=0.05, random_state=rng, format="csr")
    decomp = [
        ArrowGraph(B0, np.arange(n), 16, n),
        ArrowGraph(B1, np.arange(n), 47, n),  # wider best-effort level
    ]
    base = str(tmp_path / "mixed")
    graphio.save_decomposition_new(None, decomp, base)
    loaded = graphio.load_decomposition_new(base, 16)
    assert len(loaded) == 2
    np.testing.assert_allclose(loaded[1][0].toarray(), B1.toarray(), rtol=1e-6)

    # Reference-written layout: each level under its own width. The glob
    # fallback must still find level 1.
    base2 = str(tmp_path / "refstyle")
    for i, (ag, w) in enumerate(zip(decomp, (16, 47))):
        B = sparse.csr_matrix(ag.matrix, dtype=np.float32)
        for ft, arr in (
            (graphio.DecompositionFileType.indptr_npy, B.indptr),
            (graphio.DecompositionFileType.indices_npy, B.indices),
            (graphio.DecompositionFileType.data_npy, B.data),
            (graphio.DecompositionFileType.permutation_npy, ag.permutation),
        ):
            np.save(graphio.format_path(base2, w, i, True, ft), arr)
    loaded2 = graphio.load_decomposition_new(base2, 16)
    assert len(loaded2) == 2


def test_same_base_other_width_does_not_splice(tmp_path):
    # Two decompositions of the same graph saved under ONE base name with
    # different widths: loading one width must not splice in the other's
    # deeper levels through the any-width fallback (reproduced corruption:
    # a 2-level width-60 load returned 3 levels, max abs err 1.95 on A@X).
    from arrow_matrix_tpu.decomposition import arrow_decomposition
    from arrow_matrix_tpu.io.generate import barabasi_albert

    A = barabasi_albert(400, 6, seed=7)
    wide = arrow_decomposition(A, 120, max_number_of_levels=10, seed=0)
    narrow = arrow_decomposition(A, 25, max_number_of_levels=10, seed=0)
    assert len(narrow) > len(wide)
    base = str(tmp_path / "shared")
    graphio.save_decomposition_new(A, wide, base)
    graphio.save_decomposition_new(A, narrow, base)
    with pytest.raises(ValueError, match="level"):
        graphio.load_decomposition_new(base, 120)
    # The other width still loads consistently.
    assert len(graphio.load_decomposition_new(base, 25)) == len(narrow)


def test_missing_level_raises(tmp_path):
    from arrow_matrix_tpu.decomposition.arrow import ArrowGraph

    rng = np.random.default_rng(4)
    n = 32
    decomp = [
        ArrowGraph(
            sparse.random(n, n, density=0.1, random_state=rng, format="csr"),
            np.arange(n), 8, n,
        )
        for _ in range(2)
    ]
    base = str(tmp_path / "broken")
    graphio.save_decomposition_new(None, decomp, base)
    os.remove(
        graphio.format_path(
            base, 8, 1, True, graphio.DecompositionFileType.indptr_npy
        )
    )
    with pytest.raises(ValueError, match="recorded 2"):
        graphio.load_decomposition_new(base, 8)


def test_csr_nnz_and_as_csr_triplet(tmp_path):
    A = barabasi_albert(64, 3, seed=7)
    decomp = arrow_decomposition(A, 17, max_number_of_levels=100,
                                 block_diagonal=True, seed=0)
    base = str(tmp_path / "t")
    graphio.save_decomposition_new(A, decomp, base)
    mm = graphio.load_decomposition_new(base, 17, mem_map=True)
    mat = graphio.load_decomposition_new(base, 17)
    for (t, _), (m, _) in zip(mm, mat):
        assert isinstance(t, tuple)
        assert graphio.csr_nnz(t) == graphio.csr_nnz(m) == m.nnz
        np.testing.assert_array_equal(
            graphio.as_csr(t).toarray(), graphio.as_csr(m).toarray()
        )


def test_cli_decompose_roundtrip(tmp_path):
    from arrow_matrix_tpu.cli import decompose

    A = barabasi_albert(96, 3, seed=2)
    from scipy import io as scio

    scio.mmwrite(str(tmp_path / "g.mtx"), A)
    decompose.main([
        "--dataset_dir", str(tmp_path), "--dataset_name", "g",
        "--format", "mtx", "--width", "25", "--max_levels", "50",
    ])
    loaded = graphio.load_decomposition_new(str(tmp_path / "g"), 25)
    assert loaded
    X = random_dense(96, 8, seed=1)
    np.testing.assert_allclose(
        compute_spmm(loaded, X), A.astype(np.float32).maximum(A.T) @ X,
        rtol=1e-4, atol=1e-4,
    )


def test_cli_spmm_15d(capsys):
    from arrow_matrix_tpu.cli import spmm_15d

    spmm_15d.main([
        "--vertices", "200", "--edges", "1000", "--columns", "8",
        "--iterations", "1", "--devices", "8", "--validate", "true",
        "--log_dir", "/tmp/logs_test_15d",
    ])
    out = capsys.readouterr().out
    assert "validation relative error" in out


def test_cli_spmm_petsc_dryrun(capsys):
    from arrow_matrix_tpu.cli import spmm_petsc

    spmm_petsc.main([
        "--vertices", "200", "--edges", "800", "--devices", "4",
        "--dryrun", "true",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["n_devices"] == 4


def test_cli_spmm_petsc_partitioned_slices(tmp_path, capsys):
    """Reference slice naming {name}.part.P.slice.i.npz
    (reference: spmm_petsc.py:82-102)."""
    from arrow_matrix_tpu.cli import spmm_petsc

    n, q = 80, 4
    A = barabasi_albert(n, 3, seed=7).astype(np.float32)
    counts = [30, 10, 25, 15]
    start = 0
    for i, cnt in enumerate(counts):
        sl = A[start : start + cnt]
        sparse.save_npz(str(tmp_path / f"m.part.{q}.slice.{i}.npz"), sl)
        start += cnt
    spmm_petsc.main([
        "--file", str(tmp_path / "m"), "--devices", str(q),
        "--columns", "4", "--iterations", "1", "--validate", "true",
        "--log_dir", str(tmp_path),
    ])
    assert "validation relative error" in capsys.readouterr().out


@pytest.mark.skipif(not native.AVAILABLE, reason="C++ core not built")
def test_native_linearize_matches_properties():
    """The native path must produce a valid decomposition with identical
    invariants (orders may differ from numpy: different forest)."""
    A = barabasi_albert(512, 4, seed=3)
    X = random_dense(512, 8, seed=0)
    d = arrow_decomposition(A, 120, max_number_of_levels=100,
                            block_diagonal=True, seed=1, native=True)
    for ag in d:
        assert np.array_equal(np.sort(ag.permutation), np.arange(512))
    np.testing.assert_allclose(compute_spmm(d, X), A @ X, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not native.AVAILABLE, reason="C++ core not built")
def test_native_forest_is_spanning():
    from arrow_matrix_tpu.decomposition import graphalgs

    A = barabasi_albert(256, 3, seed=9)
    S = graphalgs.symmetrize_pattern(A)
    rng = np.random.default_rng(0)
    w = rng.uniform(0.1, 1.0, S.nnz)
    pred, ncomp = native.random_spanning_forest(S.indptr, S.indices, w)
    n_scipy, _ = graphalgs.connected_component_labels(S)
    assert ncomp == n_scipy
    roots = np.flatnonzero(pred == -1)
    assert roots.size == ncomp
    order = native.linearize_forest(pred, roots)
    assert np.array_equal(np.sort(order), np.arange(256))


def test_bench_spmm_blocked_mode(tmp_path):
    from arrow_matrix_tpu.bench import bench_spmm

    stats = bench_spmm(
        width=32,
        features=8,
        iterations=2,
        ba_vertices=128,
        ba_neighbors=3,
        n_devices=1,
        mode="blocked",
        log_dir=str(tmp_path),
    )
    assert stats["nnz_per_s"] > 0


def test_cli_spmm_15d_fori_timing(capsys):
    from arrow_matrix_tpu.cli import spmm_15d

    spmm_15d.main([
        "--vertices", "200", "--edges", "1000", "--columns", "8",
        "--iterations", "3", "--devices", "8", "--timing", "fori",
        "--log_dir", "/tmp/logs_test_15d_fori",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["timing"] == "fori" and out["nnz_per_s"] > 0


def test_cli_spmm_petsc_fori_timing(capsys):
    from arrow_matrix_tpu.cli import spmm_petsc

    spmm_petsc.main([
        "--vertices", "200", "--edges", "800", "--devices", "4",
        "--columns", "4", "--iterations", "3", "--timing", "fori",
        "--log_dir", "/tmp/logs_test_petsc_fori",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["timing"] == "fori" and out["nnz_per_s"] > 0


def test_bench_spmm_row_split_fat(tmp_path):
    """--row_split runs the fat layout end-to-end through the bench driver
    (reference --ranksperside analogue, scripts/spmm_arrow_main.py:10-29)."""
    from arrow_matrix_tpu.bench import bench_spmm

    stats = bench_spmm(
        width=32,
        features=8,
        iterations=2,
        ba_vertices=96,
        ba_neighbors=3,
        n_devices=4,
        row_split=2,
        validate=True,
        log_dir=str(tmp_path),
    )
    assert stats["validate_rel_err"] < 1e-4
    assert stats["nnz_per_s"] > 0


def test_bench_spmm_fresh_features_flag(tmp_path):
    """The per-iteration re-randomization (reference contract,
    arrow/arrow_bench.py:113-117) runs in both single- and multi-device
    paths without breaking the loop."""
    from arrow_matrix_tpu.bench import bench_spmm

    for ndev in (1, 4):
        stats = bench_spmm(
            width=32,
            features=8,
            iterations=2,
            ba_vertices=96,
            ba_neighbors=3,
            n_devices=ndev,
            fresh_features=True,
            log_dir=str(tmp_path),
        )
        assert stats["nnz_per_s"] > 0
