"""Single-chip SPMD emulation of the distributed arrow program (batched).

``emulated_step`` runs the EXACT program of ``ArrowSpmm.step`` — the same
compiled :class:`ArrowPlan` (device-stacked role formats), the sharded-head
all_gather/psum_scatter, the banded halo and the inter-level routing — with
the device axis as a REAL leading array axis instead of a mesh axis:
collectives degenerate to reshapes/sums/shifts and each per-device kernel
becomes ONE vmapped launch per role per level (reference program:
arrow/arrow_dec_mpi.py:283-307 + arrow/arrow_slim_mpi.py:78-156; this file
emulates OUR shard_map re-design of it, parallel/arrow_spmm.py).

Why it exists, given the blocked executor (parallel/blocked.py) already runs
the distributed program on one chip:

1. *Dispatch-overhead floor of the fused SPMD program.* The blocked executor
   serializes part instances and pays a fitted ~430 us per instance
   (tools/fit_stripe_overhead.py) — 198 instances at ba-1m make it 2x slower
   than the merged plan. The emulated step issues each role ONCE (vmap over
   the block axis), so its wall time is what a fused q-device program costs
   in compute+assembly, serialized onto one chip — without the per-instance
   launch artifact.
2. *Narrowing the mesh projection band.* tools/mesh_projection.py brackets
   multi-chip projections with [0, 435 us] x role instances because only the
   serialized executor had been measured. emulated_time/q (plus modeled ICI
   wire time from plan/memory.py byte counts) is a measured, much tighter
   per-device estimate: the emulation executes every gather/assembly the
   SPMD program executes and skips exactly the ICI transfers.

Collective emulation (all on one chip, no mesh):

* ``all_gather(x0_shard)``   -> ``reshape(q*w_q, k)`` (the stacked shards
  ARE the gathered buffer; devices share it by closure, not by copy);
* ``psum_scatter(partials)`` -> ``sum(axis=0)`` + ``reshape(q, w_q, k)``;
* banded ``ppermute`` shift  -> zero-padded slice shift on the block axis;
* all_to_all                 -> ``swapaxes(0, 1)`` of the (q, q, M, k) slots;
* rounds ``ppermute``        -> static source-index gather with a zero mask
  (non-receivers get zeros, matching lax.ppermute).

Semantics match ``ArrowSpmm.step`` exactly (same formats, same per-level
bf16 rounding points); goldens in tests/test_emulate.py check it against the
merged single-chip step AND the virtual-mesh distributed runner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from arrow_matrix_tpu.ops.dispatch import apply_mat
from arrow_matrix_tpu.parallel.arrow_spmm import state_from_host, state_to_host
from arrow_matrix_tpu.plan.compile import ArrowPlan, LevelPlan
from arrow_matrix_tpu.plan.routing import ExchangeRound, ShardedRouteTables


def _apply_stacked(m, x, width: int):
    """One batched launch of a (q, ...)-stacked role format against
    (q, width-ish, k) features; None roles contribute nothing. Upcasts a
    bf16 state per block exactly like the distributed ``_apply_block``."""
    if m is None:
        return None
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    return jax.vmap(lambda mm, xb: apply_mat(mm, xb, width), in_axes=(0, 0))(m, x)


def _apply_stacked_shared(m, x_shared, width: int):
    """Batched launch where every block reads the SAME features (the
    all_gathered block-0 replica feeding the column panels)."""
    if m is None:
        return None
    if x_shared.dtype != jnp.float32:
        x_shared = x_shared.astype(jnp.float32)
    return jax.vmap(
        lambda mm: apply_mat(mm, x_shared, width), in_axes=(0,)
    )(m)


def _shift_blocks(x: jnp.ndarray, direction: int) -> jnp.ndarray:
    """Banded-halo ppermute: block j receives block j-direction; boundary
    blocks receive zeros (lax.ppermute zero-fills non-receivers)."""
    zero = jnp.zeros_like(x[:1])
    if direction > 0:  # x_lo: block j reads x_{j-1}
        return jnp.concatenate([zero, x[:-1]], axis=0)
    return jnp.concatenate([x[1:], zero], axis=0)


def _round_recv(rd: ExchangeRound, payload: jnp.ndarray, q: int) -> jnp.ndarray:
    """One partial-permutation round: per-device slot gather + static
    source-index exchange (≙ lax.ppermute with rd.perm)."""
    send = jax.vmap(lambda p, idx: jnp.take(p, idx, axis=0))(payload, rd.send)
    src = np.full(q, -1, dtype=np.int64)
    for s, d in rd.perm:
        src[d] = s
    gathered = jnp.take(send, jnp.asarray(np.maximum(src, 0)), axis=0)
    mask = jnp.asarray(src >= 0)[:, None, None]
    return jnp.where(mask, gathered, jnp.zeros_like(gathered))


def _exchange(payload: jnp.ndarray, send_table, rounds, rounds_mode: bool, q: int):
    """The level exchange on stacked payloads: returns the per-device recv
    buffers (list of (q, M, k)) in the same layout the distributed gather
    tables index."""
    if rounds_mode:
        return [_round_recv(rd, payload, q) for rd in rounds]
    send = jax.vmap(lambda p, idx: jnp.take(p, idx, axis=0))(payload, send_table)
    recv = jnp.swapaxes(send, 0, 1)  # recv[d, s] = send[s, d]
    return [recv.reshape(q, -1, payload.shape[-1])]


def _route_forward_emu(
    rt: ShardedRouteTables, x_loc: jnp.ndarray, x0_full: jnp.ndarray, q: int
):
    """Stacked emulation of ``_route_forward`` (level-0 -> level-i order)."""
    k = x_loc.shape[-1]
    xp = jnp.concatenate(
        [x_loc, jnp.zeros((q, 1, k), x_loc.dtype)], axis=1
    )  # per-device [x_loc ; zero]
    recvs = _exchange(xp, rt.fwd_send, rt.fwd_rounds, rt.rounds_mode, q)

    def assemble(x_loc_j, recv_j, fg_j, f0_j):
        buf = jnp.concatenate(
            [x_loc_j, x0_full, *recv_j, jnp.zeros((1, k), x_loc.dtype)],
            axis=0,
        )
        return jnp.take(buf, fg_j, axis=0), jnp.take(buf, f0_j, axis=0)

    return jax.vmap(assemble)(x_loc, tuple(recvs), rt.fwd_gather, rt.fwd0_gather)


def _route_backward_emu(
    rt: ShardedRouteTables, c_loc: jnp.ndarray, c0_shard: jnp.ndarray, q: int
):
    """Stacked emulation of ``_route_backward`` (level-i -> level-0 order)."""
    k = c_loc.shape[-1]
    payload = jnp.concatenate(
        [c_loc, c0_shard, jnp.zeros((q, 1, k), c_loc.dtype)], axis=1
    )  # per-device [c_loc ; c0_shard ; zero]
    recvs = _exchange(payload, rt.bwd_send, rt.bwd_rounds, rt.rounds_mode, q)

    def assemble(payload_j, recv_j, bg_j, b0_j):
        buf = jnp.concatenate(
            [payload_j[:-1], *recv_j, jnp.zeros((1, k), c_loc.dtype)], axis=0
        )
        return jnp.take(buf, b0_j, axis=0), jnp.take(buf, bg_j, axis=0)

    return jax.vmap(assemble)(payload, tuple(recvs), rt.bwd_gather, rt.bwd0_gather)


def _level_emulated(
    lvl: LevelPlan, x_loc: jnp.ndarray, x0_full: jnp.ndarray, width: int, w_q: int
):
    """Batched level SpMM in the sharded-head layout: one vmapped launch per
    role (head/diag/col, ± bands); head reduce is a sum over the block axis
    (≙ psum_scatter)."""
    q, k = x_loc.shape[0], x_loc.shape[-1]
    x_head = jnp.concatenate([x0_full[None, :width], x_loc[1:]], axis=0)
    head_partials = _apply_stacked(lvl.head, x_head, width)  # (q, width, k)
    c0_full = head_partials.sum(axis=0)  # Reduce(C_0)
    c0_shard = jnp.concatenate(
        [c0_full, jnp.zeros((q * w_q - width, k), c0_full.dtype)], axis=0
    ).reshape(q, w_q, k)

    c_loc = _apply_stacked(lvl.diag, x_loc, width)
    col = _apply_stacked_shared(lvl.col, x0_full[:width], width)
    c_loc = col if c_loc is None else (c_loc if col is None else c_loc + col)
    if lvl.band_lo is not None:
        c_loc = c_loc + _apply_stacked(lvl.band_lo, _shift_blocks(x_loc, +1), width)
        c_loc = c_loc + _apply_stacked(lvl.band_hi, _shift_blocks(x_loc, -1), width)
    return c0_shard, c_loc


def emulated_step(plan: ArrowPlan, xs: jnp.ndarray) -> jnp.ndarray:
    """One iteration ``X <- A X`` of the distributed program, batched on one
    device.

    :param xs: (q, w_q + width, k) stacked device states (the distributed
        runner's flat state reshaped; see :func:`make_state`).
    :return: (q, w_q + width, k) new stacked state, same dtype.
    """
    if plan.row_split != 1:
        raise NotImplementedError("emulated_step covers the slim layout only")
    q, width = plan.n_blocks, plan.width
    w_q = -(-width // q)
    k = xs.shape[-1]

    x0_shard, x_loc = xs[:, :w_q], xs[:, w_q:]
    x0_full = x0_shard.reshape(q * w_q, k)  # Bcast(X_0) ≙ the shards in place
    c0_shard, c_loc = _level_emulated(plan.levels[0], x_loc, x0_full, width, w_q)
    for lvl in plan.levels[1:]:
        rt = lvl.route
        x_i_loc, x_i0_shard = _route_forward_emu(rt, x_loc, x0_full, q)
        x_i0_full = x_i0_shard.reshape(q * w_q, k)
        ci0_shard, ci_loc = _level_emulated(lvl, x_i_loc, x_i0_full, width, w_q)
        # Backward routing rides the state dtype (same rounding point as the
        # distributed step: each level's contribution rounds once).
        add0, add_loc = _route_backward_emu(
            rt, ci_loc.astype(xs.dtype), ci0_shard.astype(xs.dtype), q
        )
        c0_shard = c0_shard + add0
        c_loc = c_loc + add_loc
    return jnp.concatenate([c0_shard, c_loc], axis=1).astype(xs.dtype)


class EmulatedSpmm:
    """Single-chip runner of the distributed program with batched dispatch.

    Same user surface as :class:`ArrowSpmm` (distribute/step/run/collect) but
    no mesh: the whole stacked state lives on the default device. ``run``
    iterates under one jitted ``fori_loop`` with the ping-pong ``unroll=2``
    (NOTES round-5: removes the back-edge carry copy)."""

    def __init__(self, plan: ArrowPlan, state_dtype=jnp.float32):
        if plan.row_split != 1:
            raise NotImplementedError("EmulatedSpmm covers the slim layout only")
        self.plan = plan
        self.state_dtype = jnp.dtype(state_dtype)
        self.w_q = -(-plan.width // plan.n_blocks)
        self.device_plan = jax.device_put(plan)
        self._step = jax.jit(emulated_step)

    def distribute(self, X: np.ndarray) -> jnp.ndarray:
        q, w, w_q = self.plan.n_blocks, self.plan.width, self.w_q
        state = state_from_host(self.plan, np.asarray(X, dtype=np.float32))
        return jnp.asarray(
            state.reshape(q, w_q + w, -1).astype(self.state_dtype)
        )

    def step(self, xs: jnp.ndarray) -> jnp.ndarray:
        return self._step(self.device_plan, xs)

    def run(self, xs: jnp.ndarray, iterations: int) -> jnp.ndarray:
        @functools.partial(jax.jit, static_argnums=2)
        def _run(plan, xs, iters):
            return jax.lax.fori_loop(
                0, iters, lambda i, x: emulated_step(plan, x), xs, unroll=2
            )

        return _run(self.device_plan, xs, iterations)

    def collect(self, xs: jnp.ndarray) -> np.ndarray:
        q, w, w_q = self.plan.n_blocks, self.plan.width, self.w_q
        state = np.asarray(jax.device_get(xs), dtype=np.float32)
        return state_to_host(self.plan, state.reshape(q * (w_q + w), -1))
