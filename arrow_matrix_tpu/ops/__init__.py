from arrow_matrix_tpu.ops.formats import EllMat, ell_from_csr, stack_ells_from_csr
from arrow_matrix_tpu.ops.ell import ell_spmm

__all__ = ["EllMat", "ell_from_csr", "stack_ells_from_csr", "ell_spmm"]
