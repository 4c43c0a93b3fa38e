"""Hypergraph/1-D-partitioned SpMM baseline (PETSc-style).

TPU-native re-design of the reference baseline (reference:
arrow/baseline/spmm_petsc.py): per iteration the reference posts bulk
Isend/Irecv of the X rows each peer needs, overlaps them with the local-block
product, then multiplies the nonlocal block with the received rows
(reference: spmm_petsc.py:105-221). Here the ragged row exchange is one
static ``lax.all_to_all`` driven by plan-time tables
(:mod:`arrow_matrix_tpu.baselines.matrix_slice`), and the nonlocal block's
columns were relabeled at plan time to read the receive buffer directly; XLA
overlaps the collective with the local ELL SpMM exactly as the reference's
nonblocking sends do.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from arrow_matrix_tpu.baselines.matrix_slice import MatrixSlicePlan
from arrow_matrix_tpu.ops.dispatch import apply_mat, local_slice

AXIS = "slice"


def slice_mesh(n_devices: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices[:n_devices]), (AXIS,))


class Spmm1D:
    """Runner for the 1-D slice-partitioned SpMM.

    Usage::

        plan = build_slice_plan(A, row_counts, n_devices=q)
        runner = Spmm1D(plan, slice_mesh(q))
        x = runner.distribute(X)
        x = runner.step(x)              # X <- A X (layouts coincide in 1-D)
        Y = runner.collect(x)
    """

    def __init__(self, plan: MatrixSlicePlan, mesh: Mesh):
        assert mesh.shape[AXIS] == plan.n_devices
        self.plan = plan
        self.mesh = mesh
        lmax = plan.lmax

        def spec_of(a):
            return P(AXIS, *([None] * (np.ndim(a) - 1)))

        self._plan_spec = jax.tree.map(spec_of, plan)
        self.device_plan = jax.device_put(
            plan, jax.tree.map(lambda s: NamedSharding(mesh, s), self._plan_spec)
        )
        self._x_sharding = NamedSharding(mesh, P(AXIS, None))

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(self._plan_spec, P(AXIS, None)),
            out_specs=P(AXIS, None),
            check_vma=False,
        )
        def step_body(plan: MatrixSlicePlan, x_local):
            k = x_local.shape[1]
            xp = jnp.concatenate(
                [x_local, jnp.zeros((1, k), dtype=x_local.dtype)], axis=0
            )
            send = jnp.take(xp, plan.send_idx[0], axis=0)  # (q, M, k)
            recv = lax.all_to_all(send, AXIS, 0, 0)

            # Local product overlaps the exchange (XLA schedules the
            # collective alongside it — the reference's nonblocking-send
            # overlap, spmm_petsc.py:179-221); each role dispatches to its
            # chosen format (gather-ELL or Pallas BSR).
            y = apply_mat(local_slice(plan.A_local), x_local, lmax)
            y = y + apply_mat(
                local_slice(plan.A_nonlocal), recv.reshape(-1, k), lmax
            )
            return y

        self._step = jax.jit(step_body)

    def step(self, x_sharded):
        return self._step(self.device_plan, x_sharded)

    def run(self, x_sharded, iterations: int):
        for _ in range(iterations):
            x_sharded = self.step(x_sharded)
        return x_sharded

    # ------------------------------------------------------------------ I/O

    def distribute(self, X: np.ndarray):
        """Host (n, k) -> per-device padded row slices."""
        plan = self.plan
        k = X.shape[1]
        Xp = np.zeros((plan.n_devices * plan.lmax, k), dtype=np.float32)
        for d in range(plan.n_devices):
            lo, hi = plan.row_starts[d], plan.row_starts[d + 1]
            Xp[d * plan.lmax : d * plan.lmax + (hi - lo)] = X[lo:hi]
        return jax.device_put(jnp.asarray(Xp), self._x_sharding)

    def collect(self, x_sharded) -> np.ndarray:
        plan = self.plan
        Xp = np.asarray(jax.device_get(x_sharded))
        out = np.zeros((plan.n_rows, Xp.shape[1]), dtype=Xp.dtype)
        for d in range(plan.n_devices):
            lo, hi = plan.row_starts[d], plan.row_starts[d + 1]
            out[lo:hi] = Xp[d * plan.lmax : d * plan.lmax + (hi - lo)]
        return out
