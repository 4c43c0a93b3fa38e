"""Gather-based padded-ELL SpMM (the XLA compute path).

``Y = A @ X`` for an :class:`EllMat` A and dense tall-skinny X:

    partial[v] = sum_r val[v, r] * X[idx[v, r]]          (gather + FMA)
    Y[row]     = sum_g partial[combine[row, g]]          (combine gather)

Everything is static-shaped gathers and reductions — no scatter, no dynamic
control flow — so XLA fuses it into a single pass. With X resident on-chip
the memory traffic is the ELL arrays themselves (~8 bytes/nnz), which is the
speed-of-light regime for very sparse operands; the Pallas kernel in
``bsr_pallas.py`` covers the denser band blocks on the MXU.

Replaces the reference's scipy-CSR / cuSPARSE local kernel
(reference: arrow/arrow_mpi.py:196-272, arrow/common/sp2cp.py:6-16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arrow_matrix_tpu.ops.formats import EllMat


def ell_spmm(A: EllMat, x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Multiply a (single, unstacked) EllMat by a dense (n_cols, k) matrix.

    Returns (n_rows, k) in ``x.dtype`` with float32 accumulation.
    """
    assert A.idx.ndim == 2, "use vmap/shard_map for stacked EllMats"
    gathered = jnp.take(x, A.idx.reshape(-1), axis=0)  # (V*R, k)
    gathered = gathered.reshape(A.idx.shape + (x.shape[-1],))  # (V, R, k)
    partial = jnp.einsum(
        "vr,vrk->vk",
        A.val.astype(jnp.float32),
        gathered.astype(jnp.float32),
        precision=precision,
    )
    if A.needs_combine:
        y = jnp.take(partial, A.combine.reshape(-1), axis=0)
        y = y.reshape(A.combine.shape + (x.shape[-1],)).sum(axis=1)
    else:
        y = jnp.take(partial, A.combine[:, 0], axis=0)
    return y[: A.n_rows].astype(x.dtype)
