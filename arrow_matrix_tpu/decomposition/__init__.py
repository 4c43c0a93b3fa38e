"""Offline arrow decomposition pipeline (host-side, numpy/scipy).

Capability-parity replacement for the reference's igraph pipeline
(reference: arrow/decomposition.py) and its Julia performance rewrite
(reference: julia/arrow/ArrowDecomposition.jl, julia/arrow/GraphAlgorithms.jl).
Everything operates directly on scipy CSR adjacency matrices with vectorized
numpy kernels instead of per-edge igraph lambdas; a C++ native core
(``arrow_matrix_tpu.decomposition.native``) accelerates the sequential parts
for very large graphs.
"""

from arrow_matrix_tpu.decomposition.arrow import (
    ArrowGraph,
    arrow_decomposition,
    get_arrow_width,
)

__all__ = ["ArrowGraph", "arrow_decomposition", "get_arrow_width"]
