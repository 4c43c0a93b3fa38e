"""End-to-end real-graph rehearsal: a roadNet-PA-scale road network through
the full CLI chain (decompose -> spmm_arrow --validate) on hardware.

The reference's Julia pipeline ingests SuiteSparse roadNet-PA
(reference: julia/arrow/ArrowDecompositionMain.jl:35 — 1.09M vertices,
1.54M edges, near-planar). This environment has no network egress, so the
graph is a structural surrogate with the same statistics: a Delaunay
triangulation of 1.09M uniform points thinned to avg degree 2.83 — planar,
irregular-degree, long-range-free, i.e. the family the arrow claim covers.
The run exercises the byte-level .mtx ingestion path, the decomposition
CLI with reference flags, disk round-trip of the decomposition, and the
auto-selected single-chip executor with full-result validation.

Usage: tools/roadnet_run.py [vertices] [out_dir]
"""
import sys
import time

import numpy as np
from scipy import io as scio
from scipy import sparse
from scipy.spatial import Delaunay

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_088_092  # roadNet-PA nodes
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/roadnet"
TARGET_EDGES = int(round(N * 1.417))  # roadNet-PA: 1,541,898 / 1,088,092

import os

os.makedirs(OUT, exist_ok=True)

tic = time.perf_counter()
rng = np.random.default_rng(7)
pts = rng.random((N, 2))
tri = Delaunay(pts)
# Triangulation edges (deduped, undirected).
e = np.vstack([tri.simplices[:, [0, 1]], tri.simplices[:, [1, 2]],
               tri.simplices[:, [0, 2]]])
e.sort(axis=1)
e = np.unique(e, axis=0)
keep = rng.permutation(e.shape[0])[:TARGET_EDGES]
e = e[keep]
w = rng.random(e.shape[0]).astype(np.float32) + 0.1
A = sparse.csr_matrix((w, (e[:, 0], e[:, 1])), shape=(N, N))
A = A.maximum(A.T)  # symmetric road network
print(f"surrogate built: n={N} edges={e.shape[0]} nnz={A.nnz} "
      f"({time.perf_counter()-tic:.1f}s)", flush=True)

mtx = os.path.join(OUT, "roadnet.mtx")
if not os.path.exists(mtx):
    tic = time.perf_counter()
    # mmwrite's symmetric form stores the LOWER triangle (row >= col).
    scio.mmwrite(mtx, sparse.tril(A), symmetry="symmetric")
    print(f"mtx written ({time.perf_counter()-tic:.1f}s)", flush=True)

from arrow_matrix_tpu.cli import decompose, spmm_arrow

width = N // 8 + 1
tic = time.perf_counter()
decompose.main([
    "--dataset_dir", OUT, "--dataset_name", "roadnet",
    "--format", "mtx", "--width", str(width), "--max_levels", "100",
])
print(f"decomposed ({time.perf_counter()-tic:.1f}s)", flush=True)

spmm_arrow.main([
    "--path", os.path.join(OUT, "roadnet"), "--width", str(width),
    "--features", "16", "--iterations", "30", "--mode", "auto",
    "--validate", "true", "--timing", "fori",
    "--log_dir", os.path.join(OUT, "logs"),
])
