from arrow_matrix_tpu.parallel.arrow_spmm import ArrowSpmm, block_mesh
from arrow_matrix_tpu.parallel.blocked import blocked_step, compile_blocked_plan
from arrow_matrix_tpu.parallel.emulate import EmulatedSpmm
from arrow_matrix_tpu.parallel.operator import ArrowOperator, transpose_decomposition

__all__ = [
    "ArrowSpmm",
    "block_mesh",
    "blocked_step",
    "compile_blocked_plan",
    "EmulatedSpmm",
    "ArrowOperator",
    "transpose_decomposition",
]
