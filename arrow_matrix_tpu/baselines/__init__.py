from arrow_matrix_tpu.baselines.spmm_15d import Spmm15D, grid_mesh
from arrow_matrix_tpu.baselines.spmm_petsc import Spmm1D
from arrow_matrix_tpu.baselines.matrix_slice import MatrixSlicePlan, build_slice_plan

__all__ = ["Spmm15D", "grid_mesh", "Spmm1D", "MatrixSlicePlan", "build_slice_plan"]
