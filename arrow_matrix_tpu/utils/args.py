"""CLI helpers (reference: arrow/common/utils.py)."""

from __future__ import annotations

import argparse


def str2bool(v) -> bool:
    """Parse cluster-style string booleans (reference:
    arrow/common/utils.py:9-17 — exists because bools are passed as strings
    in batch scripts)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def host_print(*args, **kwargs):
    """Print only from process 0 (reference: utils.mpi_print,
    arrow/common/utils.py:58-60)."""
    import jax

    if jax.process_index() == 0:
        print(*args, **kwargs, flush=True)
