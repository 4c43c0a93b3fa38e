"""End-to-end CLI chain on REAL (empirical, non-synthetic) graphs.

The reference validates on SuiteSparse matrices (kmer_V2a, mawi,
roadNet-PA — reference: scripts/decomposition_main.py:126,
julia/arrow/ArrowDecompositionMain.jl:35). This environment has no network
egress, so the real graphs available are the empirical datasets bundled
with networkx (Zachary karate club 1977, Les Misérables co-occurrence —
genuine measured social networks, weighted in the latter case). They are
small, but they exercise the exact ingestion path a SuiteSparse .mtx would:
mmwrite -> cli.decompose (--format mtx) -> graphio load -> spmm_arrow bench
with --validate (gather-and-compare vs the compute_spmm golden).
"""

import json

import numpy as np
import pytest
from scipy import io as scio, sparse

from arrow_matrix_tpu.decomposition.arrow import compute_spmm
from arrow_matrix_tpu.io import graphio
from arrow_matrix_tpu.io.generate import random_dense

nx = pytest.importorskip("networkx")


def _real_graph(name):
    if name == "karate":
        G = nx.karate_club_graph()
    else:
        G = nx.les_miserables_graph()  # weighted
    A = nx.to_scipy_sparse_array(G, format="csr", dtype=np.float32)
    return sparse.csr_matrix(A)


@pytest.mark.parametrize("name,width", [("karate", 8), ("lesmis", 16)])
def test_real_graph_cli_chain(tmp_path, name, width, monkeypatch, capsys):
    from arrow_matrix_tpu.cli import decompose, spmm_arrow

    A = _real_graph(name)
    scio.mmwrite(str(tmp_path / f"{name}.mtx"), A)

    decompose.main([
        "--dataset_dir", str(tmp_path), "--dataset_name", name,
        "--format", "mtx", "--width", str(width), "--max_levels", "50",
    ])
    loaded = graphio.load_decomposition_new(str(tmp_path / name), width)
    assert loaded

    # Decomposition reconstructs the (symmetrized) matrix.
    X = random_dense(A.shape[0], 8, seed=3)
    ref = sparse.csr_matrix(A.maximum(A.T), dtype=np.float32) @ X
    np.testing.assert_allclose(compute_spmm(loaded, X), ref,
                               rtol=1e-4, atol=1e-4)

    # Full bench CLI with --validate (device product vs host golden).
    spmm_arrow.main([
        "--path", str(tmp_path / name), "--width", str(width),
        "--features", "8", "--iterations", "2", "--devices", "1",
        "--validate", "true", "--log_dir", str(tmp_path / "logs"),
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["validate_rel_err"] < 1e-4
    assert stats["nnz_per_s"] > 0


def test_real_graph_weighted_values_preserved(tmp_path):
    """Les Misérables edge weights survive the mtx round trip and the
    decomposition reconstruction (weighted-graph parity: the reference's
    Julia path carries values, julia/arrow/convert_to_csr.jl)."""
    from arrow_matrix_tpu.cli import decompose

    A = _real_graph("lesmis")
    assert not np.allclose(A.data, 1.0)  # genuinely weighted
    scio.mmwrite(str(tmp_path / "w.mtx"), A)
    decompose.main([
        "--dataset_dir", str(tmp_path), "--dataset_name", "w",
        "--format", "mtx", "--width", "12", "--max_levels", "50",
    ])
    loaded = graphio.load_decomposition_new(str(tmp_path / "w"), 12)
    total = None
    for m, p in loaded:
        inv = np.argsort(p)
        M = sparse.csr_matrix(m)[inv][:, inv]
        total = M if total is None else total + M
    ref = sparse.csr_matrix(A.maximum(A.T), dtype=np.float32)
    assert abs(total - ref).max() < 1e-6
