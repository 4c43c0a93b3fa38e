"""Single-chip SPMD emulation of the distributed arrow program.

``emulated_step`` runs the EXACT program of ``ArrowSpmm.step`` — the same
compiled :class:`ArrowPlan` (device-stacked role formats), the sharded-head
all_gather/psum_scatter, the banded halo and the inter-level routing — with
the device axis as a REAL leading array axis instead of a mesh axis
(reference program: arrow/arrow_dec_mpi.py:283-307 +
arrow/arrow_slim_mpi.py:78-156; this file emulates OUR shard_map re-design
of it, parallel/arrow_spmm.py).

Why it exists, given the blocked executor (parallel/blocked.py) already runs
the distributed program on one chip:

1. *Format fidelity.* The blocked executor picks per-block optimal formats
   and routes by direct gathers; the emulation executes the COMMON stacked
   formats and the real exchange tables — the program a mesh actually runs,
   including its padding cost.
2. *Narrowing the mesh projection band.* tools/mesh_projection.py brackets
   multi-chip projections with [0, 435 us] x role instances because only the
   serialized blocked executor had been measured. emulated_time/q (plus
   modeled ICI wire time from plan/comm.py byte counts) is a measured, much
   tighter per-device estimate: the emulation executes every gather/assembly
   the SPMD program executes and skips exactly the ICI transfers.

Three batching modes over the device axis:

* ``batch="scan"`` (default): one ``lax.scan`` iteration per device — every
  per-device gather reads a BARRIERED (width, k)-sized source exactly like a
  real device does, so the gather engine stays on its small-source plateau
  (ops/ell.py FOLD_SOURCE_ROWS). All q devices' role kernels still live in
  ONE fused while loop (no per-part dispatch).
* ``batch="unroll"``: the same per-device bodies, unrolled at trace time —
  static format slices are views (no per-iteration dynamic-slice copy of
  the format leaves), at the cost of a q-times larger program. Best for
  the smaller plans (ba-200k 38.3 vs 43.4 ms, grid-202k 18.1 vs 19.5);
  loses to scan at ba-1m (305 vs 238 ms) where program size wins.
* ``batch="vmap"``: one batched launch per role per level. MEASURED NEGATIVE
  on TPU for gather-family plans: XLA lowers the batched ``take`` against
  the fused (q, width, k) operand as one big-source gather, which falls off
  the plateau — ba-200k q=8 measured 101.7 ms/step vs ~20 ms of modeled
  padded-slot work (tools/probe_emulate_profile.py, round 5). Kept for
  tile-dominated plans and as the banked comparison point.

Collective emulation (all on one chip, no mesh):

* ``all_gather(x0_shard)``   -> ``reshape(q*w_q, k)`` (the stacked shards
  ARE the gathered buffer; devices share it by closure, not by copy);
* ``psum_scatter(partials)`` -> sum over the device axis (scan carry) +
  ``reshape(q, w_q, k)``;
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
from jax import lax

from arrow_matrix_tpu.ops.dispatch import apply_mat
from arrow_matrix_tpu.parallel.arrow_spmm import state_from_host, state_to_host
from arrow_matrix_tpu.plan.compile import ArrowPlan, LevelPlan
from arrow_matrix_tpu.plan.routing import ExchangeRound, ShardedRouteTables


def _f32(x: jnp.ndarray) -> jnp.ndarray:
    """Per-block upcast of a bf16 state, matching the distributed
    ``_apply_block`` (kernels accumulate in f32)."""
    return x if x.dtype == jnp.float32 else x.astype(jnp.float32)


# --------------------------------------------------------------- vmap mode


def _apply_stacked(m, x, width: int):
    """One batched launch of a (q, ...)-stacked role format against
    (q, width-ish, k) features; None roles contribute nothing."""
    if m is None:
        return None
    x = _f32(x)
    return jax.vmap(lambda mm, xb: apply_mat(mm, xb, width), in_axes=(0, 0))(m, x)


def _apply_stacked_shared(m, x_shared, width: int):
    """Batched launch where every block reads the SAME features (the
    all_gathered block-0 replica feeding the column panels)."""
    if m is None:
        return None
    x_shared = _f32(x_shared)
    return jax.vmap(
        lambda mm: apply_mat(mm, x_shared, width), in_axes=(0,)
    )(m)


def _level_vmapped(
    lvl: LevelPlan, x_loc: jnp.ndarray, x0_full: jnp.ndarray, width: int, w_q: int
):
    """Batched level SpMM: one vmapped launch per role; head reduce is a sum
    over the block axis (≙ psum_scatter)."""
    q, k = x_loc.shape[0], x_loc.shape[-1]
    x_head = jnp.concatenate([x0_full[None, :width], x_loc[1:]], axis=0)
    head_partials = _apply_stacked(lvl.head, x_head, width)  # (q, width, k)
    c0_full = head_partials.sum(axis=0)  # Reduce(C_0)

    c_loc = _apply_stacked(lvl.diag, x_loc, width)
    col = _apply_stacked_shared(lvl.col, x0_full[:width], width)
    c_loc = col if c_loc is None else (c_loc if col is None else c_loc + col)
    if lvl.band_lo is not None:
        c_loc = c_loc + _apply_stacked(lvl.band_lo, _shift_blocks(x_loc, +1), width)
        c_loc = c_loc + _apply_stacked(lvl.band_hi, _shift_blocks(x_loc, -1), width)
    return c0_full, c_loc


def _take_vmapped(payload: jnp.ndarray, tables) -> jnp.ndarray:
    return jax.vmap(lambda p, idx: jnp.take(p, idx, axis=0))(payload, tables)


def _assemble_fwd_vmapped(rt, x_loc, x0_full, recvs, k):
    def assemble(x_loc_j, recv_j, fg_j, f0_j):
        buf = jnp.concatenate(
            [x_loc_j, x0_full, *recv_j, jnp.zeros((1, k), x_loc.dtype)],
            axis=0,
        )
        return jnp.take(buf, fg_j, axis=0), jnp.take(buf, f0_j, axis=0)

    return jax.vmap(assemble)(x_loc, tuple(recvs), rt.fwd_gather, rt.fwd0_gather)


def _assemble_bwd_vmapped(rt, payload, recvs, k):
    def assemble(payload_j, recv_j, bg_j, b0_j):
        buf = jnp.concatenate(
            [payload_j[:-1], *recv_j, jnp.zeros((1, k), payload.dtype)], axis=0
        )
        return jnp.take(buf, b0_j, axis=0), jnp.take(buf, bg_j, axis=0)

    return jax.vmap(assemble)(payload, tuple(recvs), rt.bwd_gather, rt.bwd0_gather)


# --------------------------------------------------------------- scan mode


def _barrier(*arrs):
    """Materialize per-device buffers so the gathers that read them see a
    SMALL physical source (lazy slices of the stacked (q, ...) state fuse
    back into one big-source gather — the measured vmap-mode failure)."""
    return lax.optimization_barrier(arrs)


def _device_loop(body, init, xs, unrolled: bool):
    """Run ``body(carry, per_device_slice)`` over the stacked device axis:
    as one ``lax.scan`` (``unrolled=False`` — compact program, but every
    iteration pays a dynamic-slice COPY of its format leaves, measured
    ~0.4 ms/device on the grid-202k tiles) or as a trace-time Python loop
    (``unrolled=True`` — static slices are views, no copy, at the cost of a
    q-times larger program)."""
    if not unrolled:
        return lax.scan(body, init, xs)
    q = len(jax.tree.leaves(xs)[0])
    carry, ys = init, []
    for j in range(q):
        carry, y = body(carry, jax.tree.map(lambda a: a[j], xs))
        ys.append(y)
    return carry, jax.tree.map(lambda *t: jnp.stack(t), *ys)


def _level_scanned(
    lvl: LevelPlan, x_loc: jnp.ndarray, x0_full: jnp.ndarray, width: int,
    w_q: int, unrolled: bool = False,
):
    """Level SpMM as one device loop: step j runs device j's role kernels
    against barriered (width, k) sources. The head reduce rides the carry
    (≙ psum_scatter); block results are the stacked ys."""
    q, k = x_loc.shape[0], x_loc.shape[-1]
    x0w = _f32(x0_full[:width])
    x_head = jnp.concatenate([x0_full[None, :width], x_loc[1:]], axis=0)
    banded = lvl.band_lo is not None

    xs = {"head": lvl.head, "diag": lvl.diag, "col": lvl.col,
          "xh": x_head, "xl": x_loc}
    if banded:
        xs.update(
            lo=lvl.band_lo, hi=lvl.band_hi,
            xlo=_shift_blocks(x_loc, +1), xhi=_shift_blocks(x_loc, -1),
        )

    def body(c0_acc, dev):
        if banded:
            xh, xl, xlo, xhi = _barrier(dev["xh"], dev["xl"], dev["xlo"], dev["xhi"])
        else:
            xh, xl = _barrier(dev["xh"], dev["xl"])
        hp = apply_mat(dev["head"], _f32(xh), width)
        cl = apply_mat(dev["diag"], _f32(xl), width) + apply_mat(
            dev["col"], x0w, width
        )
        if banded:
            cl = cl + apply_mat(dev["lo"], _f32(xlo), width)
            cl = cl + apply_mat(dev["hi"], _f32(xhi), width)
        return c0_acc + hp, cl

    c0_full, c_loc = _device_loop(
        body, jnp.zeros((width, k), jnp.float32), xs, unrolled
    )
    return c0_full, c_loc


def _take_scanned(payload: jnp.ndarray, tables, unrolled: bool = False):
    """Per-device slot gather as a device loop: each take reads a barriered
    (P, k) source."""

    def body(_, pt):
        p, t = pt
        (p,) = _barrier(p)
        return None, jnp.take(p, t, axis=0)

    _, out = _device_loop(body, None, (payload, tables), unrolled)
    return out


def _assemble_fwd_scanned(rt, x_loc, x0_full, recvs, k, unrolled: bool = False):
    def body(_, dev):
        x_loc_j, recv_j, fg_j, f0_j = dev
        buf = jnp.concatenate(
            [x_loc_j, x0_full, *recv_j, jnp.zeros((1, k), x_loc.dtype)],
            axis=0,
        )
        (buf,) = _barrier(buf)
        return None, (jnp.take(buf, fg_j, axis=0), jnp.take(buf, f0_j, axis=0))

    _, out = _device_loop(
        body, None, (x_loc, tuple(recvs), rt.fwd_gather, rt.fwd0_gather),
        unrolled,
    )
    return out


def _assemble_bwd_scanned(rt, payload, recvs, k, unrolled: bool = False):
    def body(_, dev):
        payload_j, recv_j, bg_j, b0_j = dev
        buf = jnp.concatenate(
            [payload_j[:-1], *recv_j, jnp.zeros((1, k), payload.dtype)], axis=0
        )
        (buf,) = _barrier(buf)
        return None, (jnp.take(buf, b0_j, axis=0), jnp.take(buf, bg_j, axis=0))

    _, out = _device_loop(
        body, None, (payload, tuple(recvs), rt.bwd_gather, rt.bwd0_gather),
        unrolled,
    )
    return out


# ------------------------------------------------------------ shared pieces


def _shift_blocks(x: jnp.ndarray, direction: int) -> jnp.ndarray:
    """Banded-halo ppermute: block j receives block j-direction; boundary
    blocks receive zeros (lax.ppermute zero-fills non-receivers)."""
    zero = jnp.zeros_like(x[:1])
    if direction > 0:  # x_lo: block j reads x_{j-1}
        return jnp.concatenate([zero, x[:-1]], axis=0)
    return jnp.concatenate([x[1:], zero], axis=0)


def _round_recv(rd: ExchangeRound, send: jnp.ndarray, q: int) -> jnp.ndarray:
    """Exchange one round's (q, Mr, k) sends: static source-index gather
    (≙ lax.ppermute with rd.perm; leading-axis takes are contiguous copies,
    no gather-engine pathology)."""
    src = np.full(q, -1, dtype=np.int64)
    for s, d in rd.perm:
        src[d] = s
    gathered = jnp.take(send, jnp.asarray(np.maximum(src, 0)), axis=0)
    mask = jnp.asarray(src >= 0)[:, None, None]
    return jnp.where(mask, gathered, jnp.zeros_like(gathered))


def _exchange(payload, send_table, rounds, rounds_mode, q, take_fn):
    """The level exchange on stacked payloads: per-device slot gathers
    (take_fn: scanned or vmapped) + the static wire permutation. Returns the
    per-device recv buffers (list of (q, M, k)) in the layout the gather
    tables index."""
    if rounds_mode:
        return [_round_recv(rd, take_fn(payload, rd.send), q) for rd in rounds]
    send = take_fn(payload, send_table)  # (q, q, M, k)
    recv = jnp.swapaxes(send, 0, 1)  # recv[d, s] = send[s, d]
    return [recv.reshape(q, -1, payload.shape[-1])]


def _route_forward_emu(rt, x_loc, x0_full, q, take_fn, assemble_fn):
    """Stacked emulation of ``_route_forward`` (level-0 -> level-i order)."""
    k = x_loc.shape[-1]
    xp = jnp.concatenate(
        [x_loc, jnp.zeros((q, 1, k), x_loc.dtype)], axis=1
    )  # per-device [x_loc ; zero]
    recvs = _exchange(xp, rt.fwd_send, rt.fwd_rounds, rt.rounds_mode, q, take_fn)
    return assemble_fn(rt, x_loc, x0_full, recvs, k)


def _route_backward_emu(rt, c_loc, c0_shard, q, take_fn, assemble_fn):
    """Stacked emulation of ``_route_backward`` (level-i -> level-0 order)."""
    k = c_loc.shape[-1]
    payload = jnp.concatenate(
        [c_loc, c0_shard, jnp.zeros((q, 1, k), c_loc.dtype)], axis=1
    )  # per-device [c_loc ; c0_shard ; zero]
    recvs = _exchange(
        payload, rt.bwd_send, rt.bwd_rounds, rt.rounds_mode, q, take_fn
    )
    return assemble_fn(rt, payload, recvs, k)


_MODES = {
    "scan": (_level_scanned, _take_scanned, _assemble_fwd_scanned,
             _assemble_bwd_scanned),
    # Same per-device bodies, unrolled at trace time: static format slices
    # are views (no per-iteration dynamic-slice copy), q-times larger program.
    "unroll": tuple(
        functools.partial(f, unrolled=True)
        for f in (_level_scanned, _take_scanned, _assemble_fwd_scanned,
                  _assemble_bwd_scanned)
    ),
    "vmap": (_level_vmapped, _take_vmapped, _assemble_fwd_vmapped,
             _assemble_bwd_vmapped),
}


def emulated_step(plan: ArrowPlan, xs: jnp.ndarray, batch: str = "scan"):
    """One iteration ``X <- A X`` of the distributed program on one device.

    :param xs: (q, w_q + width, k) stacked device states (the distributed
        runner's flat state reshaped; see :class:`EmulatedSpmm`).
    :param batch: ``"scan"`` (per-device loop in one fused program, small
        gather sources — default), ``"unroll"`` (same bodies, trace-time
        loop, no format-slice copies) or ``"vmap"`` (one batched launch per
        role; measured slow for gather-family plans, see module docstring).
    :return: (q, w_q + width, k) new stacked state, same dtype.
    """
    if plan.row_split != 1:
        raise NotImplementedError("emulated_step covers the slim layout only")
    level_fn, take_fn, asm_fwd, asm_bwd = _MODES[batch]
    q, width = plan.n_blocks, plan.width
    w_q = -(-width // q)
    k = xs.shape[-1]

    def scatter_head(c0_full):
        """psum_scatter: the summed head result lands sharded."""
        return jnp.concatenate(
            [c0_full, jnp.zeros((q * w_q - width, k), c0_full.dtype)], axis=0
        ).reshape(q, w_q, k)

    x0_shard, x_loc = xs[:, :w_q], xs[:, w_q:]
    x0_full = x0_shard.reshape(q * w_q, k)  # Bcast(X_0) ≙ the shards in place
    c0_full, c_loc = level_fn(plan.levels[0], x_loc, x0_full, width, w_q)
    c0_shard = scatter_head(c0_full)
    for lvl in plan.levels[1:]:
        rt = lvl.route
        x_i_loc, x_i0_shard = _route_forward_emu(
            rt, x_loc, x0_full, q, take_fn, asm_fwd
        )
        x_i0_full = x_i0_shard.reshape(q * w_q, k)
        ci0_full, ci_loc = level_fn(lvl, x_i_loc, x_i0_full, width, w_q)
        # Backward routing rides the state dtype (same rounding point as the
        # distributed step: each level's contribution rounds once).
        add0, add_loc = _route_backward_emu(
            rt, ci_loc.astype(xs.dtype), scatter_head(ci0_full).astype(xs.dtype),
            q, take_fn, asm_bwd,
        )
        c0_shard = c0_shard + add0
        c_loc = c_loc + add_loc
    return jnp.concatenate([c0_shard, c_loc], axis=1).astype(xs.dtype)


class EmulatedSpmm:
    """Single-chip runner of the distributed program.

    Same user surface as :class:`ArrowSpmm` (distribute/step/run/collect) but
    no mesh: the whole stacked state lives on the default device. ``run``
    iterates under one jitted ``fori_loop`` with the ping-pong ``unroll=2``
    (NOTES round-5: removes the back-edge carry copy)."""

    def __init__(self, plan: ArrowPlan, state_dtype=jnp.float32,
                 batch: str = "scan"):
        if plan.row_split != 1:
            raise NotImplementedError("EmulatedSpmm covers the slim layout only")
        if batch not in _MODES:
            raise ValueError(f"batch must be one of {sorted(_MODES)}")
        self.plan = plan
        self.state_dtype = jnp.dtype(state_dtype)
        self.batch = batch
        self.w_q = -(-plan.width // plan.n_blocks)
        self.device_plan = jax.device_put(plan)
        self._step = jax.jit(functools.partial(emulated_step, batch=batch))

    def distribute(self, X: np.ndarray) -> jnp.ndarray:
        q, w, w_q = self.plan.n_blocks, self.plan.width, self.w_q
        state = state_from_host(self.plan, np.asarray(X, dtype=np.float32))
        return jnp.asarray(
            state.reshape(q, w_q + w, -1).astype(self.state_dtype)
        )

    def step(self, xs: jnp.ndarray) -> jnp.ndarray:
        return self._step(self.device_plan, xs)

    def run(self, xs: jnp.ndarray, iterations: int) -> jnp.ndarray:
        batch = self.batch

        @functools.partial(jax.jit, static_argnums=2)
        def _run(plan, xs, iters):
            return jax.lax.fori_loop(
                0, iters, lambda i, x: emulated_step(plan, x, batch=batch),
                xs, unroll=2,
            )

        return _run(self.device_plan, xs, iterations)

    def collect(self, xs: jnp.ndarray) -> np.ndarray:
        q, w, w_q = self.plan.n_blocks, self.plan.width, self.w_q
        state = np.asarray(jax.device_get(xs), dtype=np.float32)
        return state_to_host(self.plan, state.reshape(q * (w_q + w), -1))
