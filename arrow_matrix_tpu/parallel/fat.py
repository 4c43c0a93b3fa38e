"""Fat-layout distributed arrow SpMM: every block row-split over extra devices.

TPU-native re-design of the reference's fat layout ``ArrowMPI`` (reference:
arrow/arrow_mpi.py:26-93): there, 2q−1 MPI ranks split each matrix between a
*row* rank (head panel A_0i) and a *column* rank (A_i0, A_ii, band panels),
halving per-rank matrix memory. Separate rank roles are an MPI artifact; the
TPU-native form is a second mesh axis: a ``(block=q, half=r)`` mesh where
device ``(j, h)`` holds rows ``[h*w_loc, (h+1)*w_loc)`` (``w_loc = width/r``)
of EVERY panel of block j — head, diagonal, column and band alike — so
per-device matrix AND block-state bytes scale 1/r (the reference's fat saving
is the r = 2 case, generalized to any r and to all panels, not just the head).

Per step, relative to the slim :class:`~arrow_matrix_tpu.parallel.ArrowSpmm`:

* ``all_gather(X_j over "half")`` reassembles the block operand each level
  (the analogue of the reference's diagonal-tile send from column rank to row
  rank, arrow_mpi.py:123-175) — (r−1)/r · width·k extra bytes per device;
* the head ``all_gather``/``psum_scatter`` ride the flattened
  ``("half", "block")`` axis at unchanged per-device volume (block 0 is
  sharded over all q·r devices);
* inter-level routing uses the same static all_to_all machinery with
  fat-aware tables (``build_sharded_route_tables(row_split=r)``).

Device linearization is HALF-major everywhere (``s = h*q + j``), matching
``PartitionSpec(("half", "block"))`` sharding, ``lax.axis_index(("half",
"block"))`` and the collectives' flattened-axis order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from arrow_matrix_tpu.ops.dispatch import apply_mat, local_slice
from arrow_matrix_tpu.plan.compile import ArrowPlan, LevelPlan
from arrow_matrix_tpu.parallel.arrow_spmm import (
    _route_backward,
    _route_forward,
    _route_local,
)

BLOCK = "block"
HALF = "half"
ALL = (HALF, BLOCK)  # flattened-axis order = half-major linear device id


def fat_mesh(q: int, row_split: int, devices=None) -> Mesh:
    """2-D ``(block=q, half=row_split)`` mesh over ``q * row_split`` devices."""
    devices = devices if devices is not None else jax.devices()
    if len(devices) < q * row_split:
        raise ValueError(
            f"need {q * row_split} devices for q={q}, row_split={row_split}; "
            f"have {len(devices)}"
        )
    return Mesh(
        np.asarray(devices[: q * row_split]).reshape(q, row_split),
        (BLOCK, HALF),
    )


def _apply_panel(m, x: jnp.ndarray, w_loc: int) -> jnp.ndarray:
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    return apply_mat(local_slice(m), x, w_loc)


def _fat_level_spmm(
    lvl: LevelPlan,
    x_blk: jnp.ndarray,
    x0_full: jnp.ndarray,
    width: int,
    w_loc: int,
    w_q: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One arrow SpMM in the fat layout.

    :param x_blk: (width, k) — block j's features, reassembled over "half".
    :param x0_full: (w0 >= width, k) — the all_gathered block-0 features.
    :return: (c0_shard (w_q, k), c_loc (w_loc, k)) — this device's shard of
        the reduced head result and its row slice of
        C_j = A_jj X_j + A_j0 X_0 (+ banded neighbor terms)
        (reference row/column-rank products: arrow/arrow_mpi.py:177-299).
    """
    j = lax.axis_index(BLOCK)
    h = lax.axis_index(HALF)
    q = lax.axis_size(BLOCK)
    r = lax.axis_size(HALF)
    k = x_blk.shape[1]
    w0 = q * r * w_q

    x_head = jnp.where(j == 0, x0_full[:width], x_blk)
    head_partial = _apply_panel(lvl.head, x_head, w_loc)  # rows h of A_0j X_j
    hp = lax.dynamic_update_slice(
        jnp.zeros((w0, k), head_partial.dtype), head_partial, (h * w_loc, 0)
    )
    # Halves fill disjoint row ranges, blocks sum; the scatter lands each
    # device its contiguous w_q-row shard (half-major order = global rows).
    c0_shard = lax.psum_scatter(hp, ALL, scatter_dimension=0, tiled=True)

    c_loc = _apply_panel(lvl.diag, x_blk, w_loc) + _apply_panel(
        lvl.col, x0_full[:width], w_loc
    )

    if lvl.band_lo is not None:
        fwd = [(d, d + 1) for d in range(q - 1)]
        bwd = [(d + 1, d) for d in range(q - 1)]
        x_lo = lax.ppermute(x_blk, BLOCK, fwd)
        x_hi = lax.ppermute(x_blk, BLOCK, bwd)
        c_loc = c_loc + _apply_panel(lvl.band_lo, x_lo, w_loc)
        c_loc = c_loc + _apply_panel(lvl.band_hi, x_hi, w_loc)

    return c0_shard, c_loc


class FatArrowSpmm:
    """Runner for a fat-compiled :class:`ArrowPlan` (``row_split > 1``) on a
    ``(block, half)`` mesh.

    Usage::

        plan = compile_plan(decomposition, width, q, row_split=2)
        runner = FatArrowSpmm(plan, fat_mesh(q, 2))
        x = runner.distribute(X)
        x = runner.step(x)
        C = runner.collect(x)

    Device state layout: ``(w_q + w_loc, k)`` rows — the device's shard of
    block 0 followed by its row slice of block j (zeros on block-0 devices).
    """

    def __init__(self, plan: ArrowPlan, mesh: Mesh, state_dtype=jnp.float32):
        if plan.row_split < 2:
            raise ValueError("FatArrowSpmm needs a plan with row_split >= 2")
        assert mesh.shape[BLOCK] == plan.n_blocks, (
            mesh.shape,
            plan.n_blocks,
        )
        assert mesh.shape[HALF] == plan.row_split, (
            mesh.shape,
            plan.row_split,
        )
        self.plan = plan
        self.mesh = mesh
        self.state_dtype = jnp.dtype(state_dtype)
        self.q = plan.n_blocks
        self.r = plan.row_split
        self.w_loc = plan.width // self.r
        self.w_q = -(-plan.width // (self.q * self.r))
        self._plan_specs = jax.tree.map(
            lambda a: P(ALL, *([None] * (a.ndim - 1))), plan
        )
        self._x_spec = P(ALL, None)
        self.device_plan = jax.device_put(
            plan,
            jax.tree.map(lambda s: NamedSharding(mesh, s), self._plan_specs),
        )
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        width = self.plan.width
        w_loc, w_q = self.w_loc, self.w_q
        q, row_split = self.q, self.r

        @functools.partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(self._plan_specs, self._x_spec),
            out_specs=self._x_spec,
            check_vma=False,
        )
        def step_body(plan: ArrowPlan, xs):
            x0_shard, x_loc = xs[:w_q], xs[w_q:]
            x0_full = lax.all_gather(x0_shard, ALL, tiled=True)  # (w0, k)
            x_blk = lax.all_gather(x_loc, HALF, tiled=True)  # (width, k)
            c0_shard, c_loc = _fat_level_spmm(
                plan.levels[0], x_blk, x0_full, width, w_loc, w_q
            )
            for lvl in plan.levels[1:]:
                rt = _route_local(lvl.route)
                # ppermute under the tuple axis numbers devices MESH
                # row-major ((j, h) -> j*r + h), not half-major; remap the
                # tables' static pair ids (arrow_spmm._perm_pairs).
                perm_of = lambda s: (s % q) * row_split + s // q  # noqa: E731
                x_i_loc, x_i0_shard = _route_forward(
                    rt, x_loc, x0_full, axis=ALL, perm_of=perm_of
                )
                x_i0_full = lax.all_gather(x_i0_shard, ALL, tiled=True)
                x_i_blk = lax.all_gather(x_i_loc, HALF, tiled=True)
                ci0_shard, ci_loc = _fat_level_spmm(
                    lvl, x_i_blk, x_i0_full, width, w_loc, w_q
                )
                add0, add_loc = _route_backward(
                    rt,
                    ci_loc.astype(xs.dtype),
                    ci0_shard.astype(xs.dtype),
                    axis=ALL,
                    perm_of=perm_of,
                )
                c0_shard = c0_shard + add0
                c_loc = c_loc + add_loc
            return jnp.concatenate([c0_shard, c_loc], axis=0).astype(xs.dtype)

        return step_body

    def step(self, x_sharded):
        return self._step(self.device_plan, x_sharded)

    def run(self, x_sharded, iterations: int):
        for _ in range(iterations):
            x_sharded = self.step(x_sharded)
        return x_sharded

    # ------------------------------------------------------------------ I/O

    def _to_state(self, X: np.ndarray) -> np.ndarray:
        """Host (n, k) original order -> (q*r*(w_q+w_loc), k) half-major
        device state."""
        q, r, w = self.q, self.r, self.plan.width
        w_loc, w_q = self.w_loc, self.w_q
        k = X.shape[1]
        Xp = np.zeros((self.plan.padded_rows, k), dtype=np.float32)
        Xp[: X.shape[0]] = X
        x0 = Xp[np.asarray(self.plan.permutations[0])]
        shards = np.zeros((q * r * w_q, k), dtype=np.float32)
        shards[:w] = x0[:w]
        state = np.zeros((q * r, w_q + w_loc, k), dtype=np.float32)
        state[:, :w_q] = shards.reshape(q * r, w_q, k)
        # Device s = h*q + j (j >= 1) holds rows [h*w_loc, (h+1)*w_loc) of
        # block j.
        blk = x0[w:].reshape(q - 1, r, w_loc, k).transpose(1, 0, 2, 3)
        state.reshape(r, q, w_q + w_loc, k)[:, 1:, w_q:] = blk
        return state.reshape(q * r * (w_q + w_loc), k)

    def _from_state(self, state: np.ndarray) -> np.ndarray:
        q, r, w = self.q, self.r, self.plan.width
        w_loc, w_q = self.w_loc, self.w_q
        k = state.shape[1]
        s = state.reshape(r, q, w_q + w_loc, k)
        head = s[:, :, :w_q].reshape(q * r * w_q, k)[:w]
        blk = s[:, 1:, w_q:].transpose(1, 0, 2, 3).reshape((q - 1) * w, k)
        x0 = np.concatenate([head, blk], axis=0)
        inv = np.argsort(np.asarray(self.plan.permutations[0]))
        return x0[inv][: self.plan.n_rows]

    def distribute(self, X: np.ndarray):
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
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            state = np.asarray(
                multihost_utils.process_allgather(x_sharded, tiled=True)
            )
        else:
            state = np.asarray(jax.device_get(x_sharded))
        return self._from_state(state.astype(np.float32))
