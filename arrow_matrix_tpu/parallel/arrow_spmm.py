"""Distributed iterated arrow SpMM over a device mesh (sharded-head design).

This is the TPU-native re-design of the reference's whole MPI runtime stack —
``ArrowDecompositionMPI.step`` (reference: arrow/arrow_dec_mpi.py:283-307),
``ArrowSlimMPI._arrow_spmm`` (reference: arrow/arrow_slim_mpi.py:78-156,
246-280) and the banded halo path of ``ArrowMPI`` (reference:
arrow/arrow_mpi.py:123-223) — as ONE jit-compiled function over a
``jax.sharding.Mesh`` with a single "block" axis.

The head exchange is the communication-volume-critical piece. The reference's
``Bcast(X_0)`` + ``Reduce(C_0)`` costs ~2·width·k sent per rank per level
(reference: arrow_slim_mpi.py:273,116); a masked-psum emulation would cost
~4·width·k (allreduce sends twice per element). Matching the reference's
volume on TPU requires block 0's features to live SHARDED across all q
devices as iteration state:

* ``Bcast(X_0)``  ->  ``lax.all_gather`` of the (width/q)-row shards:
  ~width·k sent per device, and every device ends holding the replica the
  column panels need anyway;
* ``Reduce(C_0)`` ->  ``lax.psum_scatter`` of the per-device head partials:
  ~width·k sent per device, and the result lands already sharded — exactly
  the next iteration's input layout. No root hot-spot, collectives ride the
  full ICI bisection.

Block j >= 1 lives whole on device j (slim layout, one device per block row,
reference: arrow/arrow_slim_mpi.py:298-326). The banded ±1 halo
Isend/Irecv ring (reference: arrow_mpi.py:123-175) is two ``lax.ppermute``
shifts. The inter-level ragged ``Ialltoallv`` propagation/aggregation
(reference: arrow_dec_mpi.py:404-610) is a static-shape ``lax.all_to_all``
driven by :class:`ShardedRouteTables`; rows sourced in block 0 are read from
the all_gathered replica and never enter the collective. MPI's comm/compute
overlap (nonblocking requests) falls out automatically: all levels live in
one XLA program and the scheduler overlaps their independent collectives
with the local kernels.

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

from arrow_matrix_tpu.ops.dispatch import apply_mat, local_slice
from arrow_matrix_tpu.plan.compile import ArrowPlan, LevelPlan
from arrow_matrix_tpu.plan.routing import ShardedRouteTables

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


def _route_local(rt: ShardedRouteTables) -> ShardedRouteTables:
    """Strip the leading device axis from every table (inside shard_map each
    shard arrives as (1, ...)) — including the per-round send tables."""
    return jax.tree.map(lambda a: a[0], rt)


def _zero_pad_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Append one zero row: a safe gather target for padding slots."""
    return jnp.concatenate([x, jnp.zeros((1, x.shape[1]), dtype=x.dtype)], axis=0)


def _apply_block(m, x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Multiply one (width x width-ish) block by (width, k) features,
    dispatching to the gather-ELL, compact-ELL or (k-tiled) Pallas BSR
    kernel. bf16 iteration state upcasts here — per-block (width, k)
    transients ride f32 while the resident state, the all_gathered replica
    and the routing wire stay half-width."""
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    return apply_mat(local_slice(m), x, width)


def _level_spmm(
    lvl: LevelPlan,
    x_loc: jnp.ndarray,
    x0_full: jnp.ndarray,
    width: int,
    w_q: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One arrow-matrix SpMM in the sharded-head layout.

    :param x_loc: (width, k) — this device's block-j features (zeros on
        device 0, whose block lives sharded).
    :param x0_full: (w0 >= width, k) — the all_gathered block-0 features.
    :return: (c0_shard (w_q, k), c_loc (width, k)) — this device's shard of
        the reduced head result sum_j A_0j X_j, and its block result
        C_j = A_jj X_j + A_j0 X_0 (+ banded neighbor terms)
        (reference: arrow/arrow_slim_mpi.py:78-156, arrow/arrow_mpi.py:177-299).
    """
    j = lax.axis_index(AXIS)
    q = lax.axis_size(AXIS)
    w0 = q * w_q

    x_head = jnp.where(j == 0, x0_full[:width], x_loc)
    head_partial = _apply_block(lvl.head, x_head, width)  # A_0j @ X_j
    hp = jnp.concatenate(
        [
            head_partial,
            jnp.zeros((w0 - width, x_loc.shape[1]), head_partial.dtype),
        ],
        axis=0,
    )
    # Reduce(C_0) -> psum_scatter: the reduced head result lands sharded,
    # which is exactly the next all_gather's input layout.
    c0_shard = lax.psum_scatter(hp, AXIS, scatter_dimension=0, tiled=True)

    c_loc = _apply_block(lvl.diag, x_loc, width) + _apply_block(
        lvl.col, x0_full[:width], width
    )

    if lvl.band_lo is not None:
        fwd = [(d, d + 1) for d in range(q - 1)]  # x_{j-1} arrives at j
        bwd = [(d + 1, d) for d in range(q - 1)]  # x_{j+1} arrives at j
        x_lo = lax.ppermute(x_loc, AXIS, fwd)
        x_hi = lax.ppermute(x_loc, AXIS, bwd)
        c_loc = c_loc + _apply_block(lvl.band_lo, x_lo, width)
        c_loc = c_loc + _apply_block(lvl.band_hi, x_hi, width)

    return c0_shard, c_loc


def _perm_pairs(perm, perm_of):
    """Translate a round's static (src, dst) pairs into the collective's
    device numbering. ``lax.ppermute`` under a TUPLE axis numbers devices in
    MESH row-major order, NOT the tuple's flattened order that
    ``lax.all_to_all`` uses (measured on the ('half', 'block') fat mesh:
    a +1 shift in half-major ids permuted block-major) — the fat runner
    passes ``perm_of`` to remap the tables' half-major ids."""
    if perm_of is None:
        return perm
    return tuple((perm_of(s), perm_of(d)) for s, d in perm)


def _route_forward(
    rt: ShardedRouteTables,
    x_loc: jnp.ndarray,
    x0_full: jnp.ndarray,
    axis=AXIS,
    perm_of=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Re-shard features from level-0 order into a level's order
    (reference: arrow_dec_mpi.py:507-610 ``_propagate_features_forwards``).

    Gather-only (TPU scatters serialize): send-side slot gathers feed one
    fixed-shape all_to_all; the receive side assembles through precomputed
    inverse tables from ``[x_loc ; x0_full ; received ; zero]``. Rows whose
    source lies in block 0 read the local replica — no wire traffic.

    :return: (x_i_loc (width, k), x_i0_shard (w_q, k)).
    """
    k = x_loc.shape[1]
    xp = _zero_pad_rows(x_loc)  # (w+1, k)
    if rt.rounds_mode:
        # Round-decomposed exchange: one ppermute per partial-permutation
        # round, sized to that round's largest edge — bytes move only on
        # real (src, dst) pairs (plan/routing.py to_round_exchange).
        recvs = [
            lax.ppermute(
                jnp.take(xp, rd.send, axis=0), axis,
                _perm_pairs(rd.perm, perm_of),
            )
            for rd in rt.fwd_rounds
        ]
    else:
        send = jnp.take(xp, rt.fwd_send, axis=0)  # (q, Mf, k)
        recv = lax.all_to_all(send, axis, 0, 0)  # recv[s] = from device s
        recvs = [recv.reshape(-1, k)]
    buf = jnp.concatenate(
        [x_loc, x0_full, *recvs, jnp.zeros((1, k), x_loc.dtype)],
        axis=0,
    )  # [local ; replica ; received ; zero]
    (buf,) = lax.optimization_barrier((buf,))
    return (
        jnp.take(buf, rt.fwd_gather, axis=0),
        jnp.take(buf, rt.fwd0_gather, axis=0),
    )


def _route_backward(
    rt: ShardedRouteTables,
    c_loc: jnp.ndarray,
    c0_shard: jnp.ndarray,
    axis=AXIS,
    perm_of=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Aggregate a level's partial results back into level-0 order
    (reference: arrow_dec_mpi.py:404-505 ``_aggregate_features_backwards``).

    :param c_loc: (width, k) this device's level-order block result.
    :param c0_shard: (w_q, k) this device's shard of the level's head result.
    :return: (add0 (w_q, k), add_loc (width, k)) — contributions to this
        device's level-0 shard and block, to be accumulated.
    """
    k = c_loc.shape[1]
    payload = jnp.concatenate(
        [c_loc, c0_shard, jnp.zeros((1, k), c_loc.dtype)], axis=0
    )
    if rt.rounds_mode:
        recvs = [
            lax.ppermute(
                jnp.take(payload, rd.send, axis=0), axis,
                _perm_pairs(rd.perm, perm_of),
            )
            for rd in rt.bwd_rounds
        ]
    else:
        send = jnp.take(payload, rt.bwd_send, axis=0)  # (q, Mb, k)
        recv = lax.all_to_all(send, axis, 0, 0)
        recvs = [recv.reshape(-1, k)]
    buf = jnp.concatenate(
        [payload[:-1], *recvs, jnp.zeros((1, k), c_loc.dtype)],
        axis=0,
    )
    (buf,) = lax.optimization_barrier((buf,))
    return (
        jnp.take(buf, rt.bwd0_gather, axis=0),
        jnp.take(buf, rt.bwd_gather, axis=0),
    )


def state_from_host(plan: ArrowPlan, X: np.ndarray) -> np.ndarray:
    """Host (n, k) original order -> (q*(w_q+width), k) device-major state
    of the slim sharded-head layout: per device [block-0 shard ; block j]
    (zeros on device 0's block slot). Shared by the distributed runner and
    the single-chip SPMD emulation (parallel/emulate.py)."""
    q, w = plan.n_blocks, plan.width
    w_q = -(-w // q)
    k = X.shape[1]
    Xp = np.zeros((plan.padded_rows, k), dtype=np.float32)
    Xp[: X.shape[0]] = X
    x0 = Xp[np.asarray(plan.permutations[0])]
    shards = np.zeros((q * w_q, k), dtype=np.float32)
    shards[:w] = x0[:w]
    state = np.zeros((q, w_q + w, k), dtype=np.float32)
    state[:, :w_q] = shards.reshape(q, w_q, k)
    state[1:, w_q:] = x0[w:].reshape(q - 1, w, k)
    return state.reshape(q * (w_q + w), k)


def state_to_host(plan: ArrowPlan, state: np.ndarray) -> np.ndarray:
    """Inverse of :func:`state_from_host` (drops padding rows)."""
    q, w = plan.n_blocks, plan.width
    w_q = -(-w // q)
    k = state.shape[-1]
    s = np.asarray(state).reshape(q, w_q + w, k)
    x0 = np.concatenate(
        [s[:, :w_q].reshape(q * w_q, k)[:w], s[1:, w_q:].reshape((q - 1) * w, k)],
        axis=0,
    )
    inv = np.argsort(np.asarray(plan.permutations[0]))
    return x0[inv][: plan.n_rows]


class ArrowSpmm:
    """Runner for a compiled :class:`ArrowPlan` on a block mesh.

    Usage::

        plan = compile_plan(decomposition, width, n_devices=q)
        runner = ArrowSpmm(plan, mesh)
        x = runner.distribute(X)        # (n, k) host -> sharded state
        x = runner.step(x)              # X <- A @ X   (jit, one XLA program)
        C = runner.collect(x)           # sharded -> (n, k) host order

    Device state layout: each device holds ``(w_q + width, k)`` rows — its
    shard of block 0 followed by its whole block j (zeros on device 0).
    """

    def __init__(self, plan: ArrowPlan, mesh: Mesh, state_dtype=jnp.float32):
        """:param state_dtype: dtype of the iteration state. ``jnp.bfloat16``
        halves the resident state, the all_gathered block-0 replica and the
        routing/collective wire bytes (the HBM capacity lever quantified in
        plan/memory.py); kernels upcast per block and accumulate in f32, so
        values round to bf16 once per level per iteration."""
        assert mesh.shape[AXIS] == plan.n_blocks, (
            f"plan compiled for {plan.n_blocks} blocks, mesh has {mesh.shape[AXIS]}"
        )
        self.plan = plan
        self.mesh = mesh
        self.state_dtype = jnp.dtype(state_dtype)
        self.w_q = -(-plan.width // plan.n_blocks)
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
        w_q = self.w_q

        @functools.partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(plan_specs, x_spec),
            out_specs=x_spec,
            # Pallas calls inside shard_map don't carry varying-mesh-axis
            # metadata; skip the check.
            check_vma=False,
        )
        def step_body(plan: ArrowPlan, xs):
            x0_shard, x_loc = xs[:w_q], xs[w_q:]
            # Bcast(X_0) -> all_gather of the shards; the replica also feeds
            # every level's column panels and routing replica-reads.
            x0_full = lax.all_gather(x0_shard, AXIS, tiled=True)  # (w0, k)
            c0_shard, c_loc = _level_spmm(plan.levels[0], x_loc, x0_full, width, w_q)
            for lvl in plan.levels[1:]:
                rt = _route_local(lvl.route)
                x_i_loc, x_i0_shard = _route_forward(rt, x_loc, x0_full)
                x_i0_full = lax.all_gather(x_i0_shard, AXIS, tiled=True)
                ci0_shard, ci_loc = _level_spmm(lvl, x_i_loc, x_i0_full, width, w_q)
                # Backward routing rides the state dtype (bf16 halves the
                # wire); each level's contribution rounds once, the
                # accumulation stays f32.
                add0, add_loc = _route_backward(
                    rt, ci_loc.astype(xs.dtype), ci0_shard.astype(xs.dtype)
                )
                c0_shard = c0_shard + add0
                c_loc = c_loc + add_loc
            return jnp.concatenate([c0_shard, c_loc], axis=0).astype(xs.dtype)

        return step_body

    def step(self, x_sharded):
        """One iteration ``X <- A X`` on the sharded state."""
        return self._step(self.device_plan, x_sharded)

    def run(self, x_sharded, iterations: int):
        for _ in range(iterations):
            x_sharded = self.step(x_sharded)
        return x_sharded

    # ------------------------------------------------------- profile mode

    def _make_phases(self):
        """Separately jitted phase functions for profile mode, one set per
        level. The fused step is ONE XLA program whose phases overlap by
        design; these slice it at the reference's span boundaries (kernel /
        bcast / reduce / forward / backward aggregation) so each can be
        fenced and timed — at the cost of the overlap, so use for
        attribution, not headline numbers (reference spans:
        arrow/arrow_mpi.py:196-299, arrow/arrow_dec_mpi.py:420-440)."""
        mesh = self.mesh
        width = self.plan.width
        w_q = self.w_q
        shard2 = P(AXIS, None)
        rep2 = P(None, None)

        def smap(fn, in_specs, out_specs):
            return jax.jit(
                functools.partial(
                    jax.shard_map,
                    mesh=mesh,
                    in_specs=in_specs,
                    out_specs=out_specs,
                    check_vma=False,
                )(fn)
            )

        phases = []
        for i, lvl in enumerate(self.plan.levels):
            specs = jax.tree.map(
                lambda a: P(AXIS, *([None] * (a.ndim - 1))), lvl
            )

            def bcast(lvl, x0_shard):
                return lax.all_gather(x0_shard, AXIS, tiled=True)

            def kernel(lvl, x_loc, x0_full):
                j = lax.axis_index(AXIS)
                x_head = jnp.where(j == 0, x0_full[:width], x_loc)
                head_partial = _apply_block(lvl.head, x_head, width)
                c_loc = _apply_block(lvl.diag, x_loc, width) + _apply_block(
                    lvl.col, x0_full[:width], width
                )
                if lvl.band_lo is not None:
                    q = lax.axis_size(AXIS)
                    x_lo = lax.ppermute(
                        x_loc, AXIS, [(d, d + 1) for d in range(q - 1)]
                    )
                    x_hi = lax.ppermute(
                        x_loc, AXIS, [(d + 1, d) for d in range(q - 1)]
                    )
                    c_loc = c_loc + _apply_block(lvl.band_lo, x_lo, width)
                    c_loc = c_loc + _apply_block(lvl.band_hi, x_hi, width)
                return head_partial, c_loc

            def reduce_head(lvl, head_partial):
                q = lax.axis_size(AXIS)
                hp = jnp.concatenate(
                    [
                        head_partial,
                        jnp.zeros(
                            (q * w_q - width, head_partial.shape[1]),
                            head_partial.dtype,
                        ),
                    ],
                    axis=0,
                )
                return lax.psum_scatter(
                    hp, AXIS, scatter_dimension=0, tiled=True
                )

            entry = {
                "bcast": smap(bcast, (specs, shard2), rep2),
                "kernel": smap(
                    kernel, (specs, shard2, rep2), (shard2, shard2)
                ),
                "reduce": smap(reduce_head, (specs, shard2), shard2),
            }
            if i > 0:

                def fwd(lvl, x_loc, x0_full):
                    rt = _route_local(lvl.route)
                    return _route_forward(rt, x_loc, x0_full)

                def bwd(lvl, c_loc_lvl, c0_shard_lvl):
                    rt = _route_local(lvl.route)
                    return _route_backward(rt, c_loc_lvl, c0_shard_lvl)

                entry["fwd"] = smap(
                    fwd, (specs, shard2, rep2), (shard2, shard2)
                )
                entry["bwd"] = smap(
                    bwd, (specs, shard2, shard2), (shard2, shard2)
                )
            phases.append(entry)
        return phases

    def step_phased(self, x_sharded, record=None):
        """One iteration with separately jitted, fenced phases, each wall
        span recorded through ``record`` (defaults to the metrics module)
        under the reference's span taxonomy. Returns the new state."""
        import time as _time

        from arrow_matrix_tpu.utils import metrics as _metrics

        record = record if record is not None else _metrics
        if not hasattr(self, "_phases"):
            self._phases = self._make_phases()
        q, w, w_q = self.plan.n_blocks, self.plan.width, self.w_q
        k = x_sharded.shape[1]

        def span(name, fn, *args):
            tic = _time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            record.log({name: _time.perf_counter() - tic})
            return out

        xs = x_sharded.reshape(q, w_q + w, k)
        x0_shard = xs[:, :w_q].reshape(q * w_q, k)
        x_loc = xs[:, w_q:].reshape(q * w, k)

        lvl0 = self.device_plan.levels[0]
        ph0 = self._phases[0]
        x0_full = span("spmm_x_bcast_time", ph0["bcast"], lvl0, x0_shard)
        head_partial, c_loc = span(
            "spmm_kernel_time", ph0["kernel"], lvl0, x_loc, x0_full
        )
        c0_shard = span("spmm_row_reduce", ph0["reduce"], lvl0, head_partial)

        for lvl, ph in zip(self.device_plan.levels[1:], self._phases[1:]):
            x_i_loc, x_i0_shard = span(
                "forward_agg_all_to_all_v", ph["fwd"], lvl, x_loc, x0_full
            )
            x_i0_full = span("spmm_x_bcast_time", ph["bcast"], lvl, x_i0_shard)
            hp_i, ci_loc = span(
                "spmm_kernel_time", ph["kernel"], lvl, x_i_loc, x_i0_full
            )
            ci0_shard = span("spmm_row_reduce", ph["reduce"], lvl, hp_i)
            add0, add_loc = span(
                "back_agg_all_to_all_v", ph["bwd"], lvl, ci_loc, ci0_shard
            )
            c0_shard = c0_shard + add0
            c_loc = c_loc + add_loc

        out = jnp.concatenate(
            [c0_shard.reshape(q, w_q, k), c_loc.reshape(q, w, k)], axis=1
        ).reshape(q * (w_q + w), k).astype(x_sharded.dtype)
        return jax.device_put(out, NamedSharding(self.mesh, self._x_spec))

    # ------------------------------------------------------------------ I/O

    def _to_state(self, X: np.ndarray) -> np.ndarray:
        return state_from_host(self.plan, X)

    def _from_state(self, state: np.ndarray) -> np.ndarray:
        return state_to_host(self.plan, state)

    def distribute(self, X: np.ndarray):
        """Host (n, k) features in original order -> device-sharded state
        (the reference's root-side scatter, arrow_dec_mpi.py:753-823, as a
        single device_put). On multi-host meshes every process must call
        this with the same X; each host places only its addressable
        shards."""
        state = self._to_state(np.asarray(X, dtype=np.float32)).astype(
            self.state_dtype
        )
        sharding = NamedSharding(self.mesh, self._x_spec)
        if jax.process_count() > 1:
            return jax.make_array_from_callback(
                state.shape, sharding, lambda idx: state[idx]
            )
        return jax.device_put(jnp.asarray(state), sharding)

    def collect(self, x_sharded) -> np.ndarray:
        """Device-sharded state -> host (n, k) original order
        (reference: allgather_result, arrow_slim_mpi.py:415-425).
        Multi-host meshes all-gather across processes first."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            state = np.asarray(
                multihost_utils.process_allgather(x_sharded, tiled=True)
            )
        else:
            state = np.asarray(jax.device_get(x_sharded))
        return self._from_state(state.astype(np.float32))
