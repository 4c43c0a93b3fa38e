"""Distributed iterated arrow SpMM over a device mesh.

This is the TPU-native re-design of the reference's whole MPI runtime stack —
``ArrowDecompositionMPI.step`` (reference: arrow/arrow_dec_mpi.py:283-307),
``ArrowSlimMPI._arrow_spmm`` (reference: arrow/arrow_slim_mpi.py:78-156,
246-280) and the banded halo path of ``ArrowMPI`` (reference:
arrow/arrow_mpi.py:123-223) — as ONE jit-compiled function over a
``jax.sharding.Mesh`` with a single "block" axis:

* MPI ``Bcast(X_0)`` + ``Reduce(C_0)`` (reference: arrow_slim_mpi.py:273,116)
  fuse into a single ``lax.psum`` of the stacked pair [X_0-masked, A_0j X_j]:
  one collective delivers both the head features and the reduced head result
  to every device;
* the banded ±1 halo Isend/Irecv ring (reference: arrow_mpi.py:123-175)
  becomes two ``lax.ppermute`` shifts;
* the inter-level ragged ``Ialltoallv`` feature propagation / aggregation
  (reference: arrow_dec_mpi.py:404-610) becomes static-shape
  ``lax.all_to_all`` driven by precomputed :class:`RouteTables`;
* the MPI overlap of communication with compute (nonblocking requests) falls
  out automatically: all levels live in one XLA program, their collectives
  are independent until the final accumulation, and the scheduler overlaps
  them with the ELL kernels.

Iteration semantics match the reference exactly: after ``step``, the features
in level-0 permuted order have been replaced by ``A @ X`` (reference
postconditions, arrow_dec_mpi.py:283-292).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from arrow_matrix_tpu.ops.bsr_pallas import BsrMat, bsr_spmm
from arrow_matrix_tpu.ops.ell import ell_spmm
from arrow_matrix_tpu.plan.compile import ArrowPlan, LevelPlan
from arrow_matrix_tpu.plan.routing import RouteTables

AXIS = "block"


def block_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the block axis."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def _shard_spec(pytree):
    """Shard every array leaf along its leading (device-stacked) axis."""
    return jax.tree.map(
        lambda a: P(AXIS, *([None] * (a.ndim - 1))), pytree
    )


def _local(m):
    """Strip the per-device leading axis of size 1 inside shard_map."""
    if isinstance(m, BsrMat):
        return m.replace(
            tiles_data=m.tiles_data[0],
            tiles_col=m.tiles_col[0],
            prog_rows=m.prog_rows[0],
        )
    return m.replace(
        idx=m.idx[0],
        val=m.val[0],
        combine=tuple(t[0] for t in m.combine),
    )


def _route_local(rt: RouteTables) -> RouteTables:
    return rt.replace(
        send_idx=rt.send_idx[0],
        recv_idx=rt.recv_idx[0],
        fwd_gather=rt.fwd_gather[0],
        bwd_gather=rt.bwd_gather[0],
    )


def _zero_pad_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Append one zero row: index ``width`` becomes a safe gather target for
    padding slots in the routing tables."""
    return jnp.concatenate([x, jnp.zeros((1, x.shape[1]), dtype=x.dtype)], axis=0)


def _apply_block(m, x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Multiply one (width x width-ish) block by (width, k) features,
    dispatching to the gather-ELL or Pallas BSR kernel."""
    m = _local(m)
    if isinstance(m, BsrMat):
        pad = m.n_col_tiles * m.tile_n - x.shape[0]
        if pad > 0:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0
            )
        return bsr_spmm(m, x)[:width].astype(x.dtype)
    return ell_spmm(m, x)


def _level_spmm(lvl: LevelPlan, x: jnp.ndarray, width: int) -> jnp.ndarray:
    """One arrow matrix SpMM; x is this device's (width, k) feature block in
    the level's permuted order; returns this device's (width, k) result block.

    Block 0's result is the reduced head-row product sum_j A_0j X_j; block
    j>0's is A_jj X_j + A_j0 X_0 (+ banded neighbor terms)
    (reference: arrow/arrow_slim_mpi.py:78-156, arrow/arrow_mpi.py:177-299).
    """
    j = lax.axis_index(AXIS)

    head_partial = _apply_block(lvl.head, x, width)  # A_0j @ X_j

    # Fused Bcast(X_0) + Reduce(C_0): one psum carries both.
    x0_masked = jnp.where(j == 0, x, jnp.zeros_like(x))
    packed = lax.psum(jnp.concatenate([x0_masked, head_partial], axis=0), AXIS)
    x_0, c_0 = packed[:width], packed[width:]

    c_j = _apply_block(lvl.diag, x, width) + _apply_block(lvl.col, x_0, width)

    if lvl.band_lo is not None:
        q = lax.axis_size(AXIS)
        fwd = [(d, d + 1) for d in range(q - 1)]  # x_{j-1} arrives at j
        bwd = [(d + 1, d) for d in range(q - 1)]  # x_{j+1} arrives at j
        x_lo = lax.ppermute(x, AXIS, fwd)
        x_hi = lax.ppermute(x, AXIS, bwd)
        c_j = c_j + _apply_block(lvl.band_lo, x_lo, width)
        c_j = c_j + _apply_block(lvl.band_hi, x_hi, width)

    return jnp.where(j == 0, c_0, c_j)


def _route_forward(rt: RouteTables, x: jnp.ndarray) -> jnp.ndarray:
    """Re-shard features from level-0 order into a level's order
    (reference: arrow_dec_mpi.py:507-610 ``_propagate_features_forwards``).

    Gather-only: received slots and local rows are assembled through the
    precomputed inverse table ``fwd_gather`` — no scatter (TPU scatters
    serialize and dominate the step)."""
    k = x.shape[1]
    xp = _zero_pad_rows(x)  # (w+1, k)
    send = jnp.take(xp, rt.send_idx, axis=0)  # (q, M, k)
    recv = lax.all_to_all(send, AXIS, 0, 0)  # recv[s] = from device s
    buf = jnp.concatenate(
        [x, recv.reshape(-1, k), jnp.zeros((1, k), x.dtype)], axis=0
    )  # [local ; received ; zero]
    (buf,) = lax.optimization_barrier((buf,))
    return jnp.take(buf, rt.fwd_gather, axis=0)


def _route_backward_add(
    rt: RouteTables, c_level: jnp.ndarray, c_accum: jnp.ndarray
) -> jnp.ndarray:
    """Aggregate a level's partial result back into level-0 order:
    ``C_0 += route^{-1}(C_i)`` (reference: arrow_dec_mpi.py:404-505
    ``_aggregate_features_backwards``). The inverse routing reuses the
    forward tables with send/receive roles swapped."""
    k = c_level.shape[1]
    cp = _zero_pad_rows(c_level)
    send_back = jnp.take(cp, rt.recv_idx, axis=0)  # (q, M, k) to each source
    recv_back = lax.all_to_all(send_back, AXIS, 0, 0)
    buf = jnp.concatenate(
        [c_level, recv_back.reshape(-1, k), jnp.zeros((1, k), c_level.dtype)],
        axis=0,
    )  # [level-local partials ; received partials ; zero]
    (buf,) = lax.optimization_barrier((buf,))
    return c_accum + jnp.take(buf, rt.bwd_gather, axis=0)


class ArrowSpmm:
    """Runner for a compiled :class:`ArrowPlan` on a block mesh.

    Usage::

        plan = compile_plan(decomposition, width, n_devices=q)
        runner = ArrowSpmm(plan, mesh)
        x = runner.distribute(X)        # (n, k) host -> sharded level-0 order
        x = runner.step(x)              # X <- A @ X   (jit, one XLA program)
        C = runner.collect(x)           # sharded -> (n, k) host order
    """

    def __init__(self, plan: ArrowPlan, mesh: Mesh):
        assert mesh.shape[AXIS] == plan.n_blocks, (
            f"plan compiled for {plan.n_blocks} blocks, mesh has {mesh.shape[AXIS]}"
        )
        self.plan = plan
        self.mesh = mesh
        self._plan_specs = _shard_spec(plan)
        self._x_spec = P(AXIS, None)
        # Place the plan once; it stays in HBM across iterations (unlike the
        # reference's per-call host->GPU staging, arrow_mpi.py:246-270).
        self.device_plan = jax.device_put(
            plan, jax.tree.map(lambda s: NamedSharding(mesh, s), self._plan_specs)
        )
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        plan_specs = self._plan_specs
        x_spec = self._x_spec
        width = self.plan.width

        @functools.partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(plan_specs, x_spec),
            out_specs=x_spec,
            # Pallas calls inside shard_map don't carry varying-mesh-axis
            # metadata; skip the check.
            check_vma=False,
        )
        def step_body(plan: ArrowPlan, x):
            c = _level_spmm(plan.levels[0], x, width)
            for lvl in plan.levels[1:]:
                rt = _route_local(lvl.route)
                x_i = _route_forward(rt, x)
                c_i = _level_spmm(lvl, x_i, width)
                c = _route_backward_add(rt, c_i, c)
            return c

        return step_body

    def step(self, x_sharded):
        """One iteration ``X <- A X`` on level-0-ordered sharded features."""
        return self._step(self.device_plan, x_sharded)

    def run(self, x_sharded, iterations: int):
        for _ in range(iterations):
            x_sharded = self.step(x_sharded)
        return x_sharded

    # ------------------------------------------------------------------ I/O

    def distribute(self, X: np.ndarray):
        """Host (n, k) features in original order -> device-sharded features
        in level-0 permuted order (the reference's root-side scatter,
        arrow_dec_mpi.py:753-823, as a single device_put). On multi-host
        meshes every process must call this with the same X; each host
        places only its addressable shards."""
        n_pad = self.plan.padded_rows
        Xp = np.zeros((n_pad, X.shape[1]), dtype=np.float32)
        Xp[: X.shape[0]] = X
        x0 = Xp[np.asarray(self.plan.permutations[0])]
        sharding = NamedSharding(self.mesh, self._x_spec)
        if jax.process_count() > 1:
            return jax.make_array_from_callback(
                x0.shape, sharding, lambda idx: x0[idx]
            )
        return jax.device_put(jnp.asarray(x0), sharding)

    def collect(self, x_sharded) -> np.ndarray:
        """Device-sharded level-0-ordered features -> host (n, k) original
        order (reference: allgather_result, arrow_slim_mpi.py:415-425).
        Multi-host meshes all-gather across processes first."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            x0 = np.asarray(
                multihost_utils.process_allgather(x_sharded, tiled=True)
            )
        else:
            x0 = np.asarray(jax.device_get(x_sharded))
        inv = np.argsort(np.asarray(self.plan.permutations[0]))
        return x0[inv][: self.plan.n_rows]
