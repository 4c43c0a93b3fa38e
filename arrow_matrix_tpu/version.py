__version__ = "0.1.0"

# Algorithm version strings embedded in benchmark run names, mirroring the
# reference's convention (reference: arrow/arrow_bench.py:43-47,
# scripts/spmm_15d_main.py:233, arrow/baseline/spmm_petsc.py:415).
ARROW_ALGO_VERSION = "ArrowTPU_v0.1"
SPMM_15D_ALGO_VERSION = "15D_TPU_v0.1"
SPMM_1D_ALGO_VERSION = "PETSc1D_TPU_v0.1"
