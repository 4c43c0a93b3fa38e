from arrow_matrix_tpu.bench.arrow import bench_spmm

__all__ = ["bench_spmm"]
