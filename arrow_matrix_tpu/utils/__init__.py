from arrow_matrix_tpu.utils.args import str2bool
from arrow_matrix_tpu.utils import metrics  # noqa: F401

__all__ = ["str2bool", "metrics"]
