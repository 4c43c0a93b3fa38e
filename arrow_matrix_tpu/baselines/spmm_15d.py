"""1.5D A-stationary SpMM baseline on a 2-D device mesh.

TPU-native re-design of the reference baseline (reference:
arrow/baseline/spmm_15d.py): the reference lays A out on a (P/c) x c process
grid, keeps it stationary, and per iteration runs ``rounds = P/c**2`` steps of
{Bcast an X block over the grid column, accumulate ``Y += lA[r] @ buf``},
then ``Allreduce(SUM)`` of Y over the replication axis (reference:
spmm_15d.py:312-368).

Here, X is sharded so that device (i, j) of the ``(row=P/c, repl=c)`` mesh
owns X sub-block ``j * P/c + i``; the reference's whole round-loop of
broadcasts within a grid column then IS one ``all_gather`` along the ``row``
axis (identical received volume, NK·k/c per device), and the iteration
collapses to:

    X_cols = all_gather(X_local, 'row')   # == all Bcast rounds of the column
    Y_partial = lA @ X_cols               # one ELL SpMM, not `rounds` small ones
    Y = psum(Y_partial, 'repl')           # == Allreduce(SUM) over replication

The communication-volume comparison against the arrow algorithm (per-device
NK·k/c + NI·k here vs. O(width·k) for arrow) is the reference's headline
experiment (reference: README.md:3,100-103).
"""

from __future__ import annotations

import functools

import numpy as np
from scipy import sparse

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from arrow_matrix_tpu.ops.bsr_pallas import (
    preferred_format_blocks,
    stack_bsr_from_csr,
)
from arrow_matrix_tpu.ops.formats import stack_ells_from_csr

ROW_AXIS = "row"
REPL_AXIS = "repl"


def grid_mesh(p_div_c: int, c: int, devices=None) -> Mesh:
    """(P/c) x c mesh — the reference's ``Create_cart`` grid
    (reference: spmm_15d.py:43-67)."""
    devices = devices if devices is not None else jax.devices()
    n = p_div_c * c
    assert len(devices) >= n
    return Mesh(np.asarray(devices[:n]).reshape(p_div_c, c), (ROW_AXIS, REPL_AXIS))


def replication_factor(n_devices: int) -> int:
    """Auto replication: the largest power of two c with c**2 <= P and c | P
    (reference: scripts/spmm_15d_main.py:87-96)."""
    c = 1
    while (2 * c) ** 2 <= n_devices and n_devices % (2 * c) == 0:
        c *= 2
    return c


def _pad_csr(A: sparse.csr_matrix, rows: int, cols: int) -> sparse.csr_matrix:
    out = A.tocsr(copy=True)
    out.resize((rows, cols))
    return out


# Memory-mapped stripe slicing is shared with out-of-core plan compilation.
from arrow_matrix_tpu.io.graphio import load_row_stripe as _materialize_row_stripe


class Spmm15D:
    """A-stationary 1.5D SpMM runner.

    Usage::

        mesh = grid_mesh(p_div_c, c)
        runner = Spmm15D(A, mesh)       # stations A on the grid
        x = runner.distribute(X)        # host (n_cols, k) -> device shards
        y = runner.spmm(x)              # Y = A @ X (sharded over 'row')
        Y = runner.collect(y)
        x = runner.step(x)              # square A: X <- A X, re-sharded
    """

    def __init__(
        self,
        A,
        mesh: Mesh,
        slots_per_row: int | None = None,
        k_hint: int = 128,
        force_format: str | None = None,
    ):
        """:param A: csr_matrix, or a (data, indices, indptr) triplet of
        (possibly memory-mapped) arrays of a SQUARE matrix — the analogue of
        the reference's memmap-aware decomposition
        (reference: arrow/baseline/spmm_15d.py:158-309): blocks are built one
        row stripe at a time, never materializing the full matrix.

        :param k_hint: expected feature-column count, feeding the ELL/BSR
            format cost model (the reference's 1.5D default is 128, where
            the MXU path shines; k-tiling engages automatically when the
            operand overflows VMEM)."""
        assert set(mesh.axis_names) == {ROW_AXIS, REPL_AXIS}
        self.mesh = mesh
        p_div_c = mesh.shape[ROW_AXIS]
        c = mesh.shape[REPL_AXIS]
        triplet = isinstance(A, tuple)
        if triplet:
            NI = NK = A[2].shape[0] - 1
        else:
            A = sparse.csr_matrix(A, dtype=np.float32)
            NI, NK = A.shape

        # Uniform padded shard sizes: X holds s_in rows per device; Y holds
        # lNI rows per row-group; for square A the padded X and Y layouts
        # coincide so iteration can re-shard without reshaping.
        s_in = -(-NK // (p_div_c * c))
        lNI = c * (-(-NI // (p_div_c * c)))
        self.s_in, self.lNI = s_in, lNI
        self.p_div_c, self.c = p_div_c, c
        self.NI, self.NK = NI, NK
        self.NK_pad = p_div_c * c * s_in
        self.NI_pad = p_div_c * lNI
        lNK = p_div_c * s_in  # A-columns per replication group
        self.lNK = lNK

        # Station A: device (i, j) holds A[i-th row block, j-th column group]
        # (reference scatters CSR triplets rank by rank, spmm_15d.py:86-117;
        # here the blocks become one stacked ELL pytree placed once). With a
        # triplet input each row stripe is materialized on its own from the
        # memory-mapped arrays — peak host memory is one stripe, not the
        # matrix (reference: spmm_15d.py:158-309).
        flat_blocks = []
        if triplet:
            for i in range(p_div_c):
                stripe = _materialize_row_stripe(A, i * lNI, lNI, self.NK_pad)
                for j in range(c):
                    flat_blocks.append(
                        stripe[:, j * lNK : (j + 1) * lNK].tocsr()
                    )
        else:
            Apad = _pad_csr(A, self.NI_pad, self.NK_pad)
            for i in range(p_div_c):
                for j in range(c):
                    blk = Apad[
                        i * lNI : (i + 1) * lNI, j * lNK : (j + 1) * lNK
                    ].tocsr()
                    flat_blocks.append(blk)
        # Format choice: gather-ELL for scattered blocks, Pallas BSR for
        # dense-enough ones (k = 128 is the reference default — the MXU
        # regime; reference: scripts/spmm_15d_main.py:57), and windowed BSR
        # for NATURALLY banded matrices beyond the VMEM residency bound
        # (the calibrated gate; the baseline has no decomposition/RCM, so
        # only inputs that arrive banded qualify — grids do).
        stacked = None
        if force_format == "window":
            from arrow_matrix_tpu.ops.bsr_pallas import stack_windowed_from_csr

            stacked, self.fmt = stack_windowed_from_csr(flat_blocks), "window"
        elif force_format is None:
            from arrow_matrix_tpu.ops.dispatch import stacked_windowed_or_none

            wm = stacked_windowed_or_none(flat_blocks, k_hint)
            if wm is not None:
                stacked, self.fmt = wm, "window"
        if stacked is None:
            self.fmt = force_format or preferred_format_blocks(
                flat_blocks, k_hint
            )
            stacked = (
                stack_bsr_from_csr(flat_blocks)  # (P, T, TM, TN)
                if self.fmt == "bsr"
                else stack_ells_from_csr(flat_blocks, slots_per_row)  # (P, V, R)
            )
        # One stacked pytree whose leading P axis splits into the
        # (row-group, replication) grid; statics ride through tree.map.
        self.lA = jax.tree.map(
            lambda a: a.reshape((p_div_c, c) + a.shape[1:]), stacked
        )

        self._x_sharding = NamedSharding(mesh, P((REPL_AXIS, ROW_AXIS), None))
        self._y_sharding = NamedSharding(mesh, P(ROW_AXIS, None))
        self._plan_spec = jax.tree.map(
            lambda a: P(ROW_AXIS, REPL_AXIS, *([None] * (a.ndim - 2))), self.lA
        )
        self.device_lA = jax.device_put(
            self.lA, jax.tree.map(lambda s: NamedSharding(mesh, s), self._plan_spec)
        )

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(self._plan_spec, P((REPL_AXIS, ROW_AXIS), None)),
            out_specs=P(ROW_AXIS, None),
            check_vma=False,
        )
        def spmm_body(lA, x_local):
            from arrow_matrix_tpu.ops.dispatch import apply_mat

            # x_local: (s_in, k) — this device's X shard.
            x_cols = lax.all_gather(x_local, ROW_AXIS, tiled=True)  # (lNK, k)
            m = jax.tree.map(lambda a: a[0, 0], lA)
            y_partial = apply_mat(m, x_cols, lNI)  # (lNI, k)
            return lax.psum(y_partial, REPL_AXIS)

        self._spmm = jax.jit(spmm_body)

        x_sharding = self._x_sharding

        @jax.jit
        def step_body(lA, x_flat):
            y = spmm_body(lA, x_flat)
            return jax.lax.with_sharding_constraint(y, x_sharding)

        self._step = step_body

    def spmm(self, x_sharded):
        """One product Y = A @ X; Y sharded over 'row', replicated over
        'repl' (the reference's post-Allreduce state)."""
        return self._spmm(self.device_lA, x_sharded)

    def step(self, x_sharded):
        """Square A: X <- A @ X, result re-sharded into the X layout (the
        resharding collective is XLA-inserted; the reference's benchmark
        never feeds Y back, spmm_15d_main.py:231-276 — this is an extension)."""
        assert self.NI_pad == self.NK_pad, "step() requires square (padded) A"
        return self._step(self.device_lA, x_sharded)

    # ------------------------------------------------------------------ I/O

    def distribute(self, X: np.ndarray):
        Xp = np.zeros((self.NK_pad, X.shape[1]), dtype=np.float32)
        Xp[: X.shape[0]] = X
        # Global row r lives in shard j*p_div_c + i; flat order for a
        # P((repl, row)) spec is exactly this shard-major order.
        return jax.device_put(jnp.asarray(Xp), self._x_sharding)

    def collect(self, y_sharded) -> np.ndarray:
        return np.asarray(jax.device_get(y_sharded))[: self.NI]

    def collect_x(self, x_sharded) -> np.ndarray:
        return np.asarray(jax.device_get(x_sharded))[: self.NK]
