"""arrow_matrix_tpu — a TPU-native framework for communication-efficient
iterated sparse-matrix × tall-skinny-dense multiplication via arrow matrix
decomposition (Gianinazzi et al., PPoPP 2024).

Capability parity with the reference library ``spcl/arrow-matrix`` (mounted at
/root/reference), redesigned TPU-first:

* the offline decomposition stage is a vectorized numpy/scipy pipeline (with a
  C++ native core for billion-edge graphs) instead of igraph/Julia
  (reference: arrow/decomposition.py, julia/arrow/*.jl);
* the distributed runtime replaces the mpi4py rank choreography of
  ``ArrowDecompositionMPI`` (reference: arrow/arrow_dec_mpi.py) with a static
  execution plan compiled ahead of time and a jit-compiled iterated SpMM over a
  ``jax.sharding.Mesh``, where every MPI collective becomes an XLA collective
  inside ``shard_map``;
* the local CSR kernel (reference: scipy / cuSPARSE via arrow/common/sp2cp.py)
  becomes padded-ELL gather SpMM and Pallas TPU kernels with the dense operand
  resident in VMEM.

Public API (mirrors the reference's import surface):

    from arrow_matrix_tpu import arrow_decomposition, ArrowGraph
    from arrow_matrix_tpu.plan import compile_plan
    from arrow_matrix_tpu.parallel import ArrowSpmm, ArrowOperator
    from arrow_matrix_tpu.parallel.session import ArrowSession
"""

from arrow_matrix_tpu.decomposition import ArrowGraph, arrow_decomposition
from arrow_matrix_tpu.version import __version__

__all__ = [
    "ArrowGraph",
    "arrow_decomposition",
    "__version__",
]
