from arrow_matrix_tpu.parallel.arrow_spmm import ArrowSpmm, block_mesh

__all__ = ["ArrowSpmm", "block_mesh"]
