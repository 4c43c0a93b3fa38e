"""Collective failure detection.

The reference converts per-rank exceptions into a boolean
``allreduce(LOR/LAND)`` so all ranks abort together instead of deadlocking
(reference: arrow/arrow_bench.py:119-134, arrow/baseline/spmm_petsc.py:479-492).
The TPU analogue: on multi-host meshes the success flag is all-reduced across
processes; single-host runs short-circuit locally. Ranks beyond the needed
count simply don't exist here — device meshes are exact — so the reference's
graceful non-participation (``initialize`` returning None,
arrow_dec_mpi.py:143-144) is replaced by plan/mesh size validation at
construction."""

from __future__ import annotations

import numpy as np

import jax


def all_processes_succeeded(local_ok: bool) -> bool:
    """True iff every participating host reports success."""
    if jax.process_count() == 1:
        return bool(local_ok)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([1 if local_ok else 0], dtype=np.int32)
    )
    return bool(np.all(np.asarray(flags) == 1))


class CollectiveAbort(RuntimeError):
    """Raised when any host failed an iteration."""
