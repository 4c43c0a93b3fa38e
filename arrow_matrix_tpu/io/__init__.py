from arrow_matrix_tpu.io import generate, graphio  # noqa: F401
