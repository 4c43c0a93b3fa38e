"""High-level session API mirroring the reference's runtime surface.

A user of the reference drives the computation through
``ArrowDecompositionMPI`` + ``ArrowMatrix`` methods (``initialize``,
``load_decomposition_new``, ``zero_rhs``, ``set_features``, ``step``,
``allgather_result`` — reference: arrow/arrow_dec_mpi.py:106-307,
arrow/arrow_matrix.py:12-111). :class:`ArrowSession` offers the same verbs on
top of the TPU plan compiler and runners, so reference users can migrate
call-for-call:

==========================================  ====================================
reference (MPI)                             arrow_matrix_tpu
==========================================  ====================================
``load_decomposition_new(comm, path, w)``   ``ArrowSession.from_path(path, w)``
``ArrowDecompositionMPI.initialize(...)``   ``ArrowSession(decomposition, w)``
``arrow.B.zero_rhs(rows, k)``               ``session.zero_rhs(k)``
``arrow.B.set_features(X)``                 ``session.set_features(X)``
``arrow.step()``                            ``session.step()``
``arrow.B.allgather_result(C)``             ``session.allgather_result()``
fat layout (2q-1 ranks, banded)             ``block_diagonal=False`` (banded
                                            ppermute halo); for the MEMORY
                                            split itself: ``row_split=r``
                                            (``parallel/fat.py`` — every
                                            block's panels row-split over a
                                            (block, half) mesh, per-device
                                            bytes 1/r; generalizes the 2q-1
                                            split to any r)
==========================================  ====================================

Why the fat layout's 2q-1 memory split is unnecessary on TPU (quantified at
the reference's production width w = 5,000,000, k = 16, float32;
reference: scripts/decomposition_main.py:123):

* dense state per device: X block (w, k) + head replica (w, k) + result
  block + head shard + routing buffers  ->  ~4.5 * w * k * 4B = 1.44 GB;
* sparse panels per device (A_0j, A_jj, A_j0 as ELL index+value pairs,
  8B/nonzero): the production graphs carry ~16-30 nonzeros/row, i.e. per
  device (one block row) <= 30 * w nonzeros  ->  ~1.2 GB;
* total < 3 GB against 16 GB HBM per v5e chip — comfortably resident even
  with double-buffering, so splitting the three panels across separate
  row/column ranks (the reference's reason for 2q-1 ranks per matrix,
  reference: arrow/arrow_mpi.py:26-93) would only idle half the mesh. The
  split becomes interesting above ~100 nonzeros/row at w = 5M, where the
  sparse panels alone approach 4 GB; none of the referenced datasets are in
  that regime.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from arrow_matrix_tpu.io import graphio
from arrow_matrix_tpu.parallel.arrow_spmm import ArrowSpmm, block_mesh
from arrow_matrix_tpu.parallel.local import compile_single_chip
from arrow_matrix_tpu.plan import compile_plan


class ArrowSession:
    """Iterated arrow SpMM session on however many devices are available.

    ``n_devices > 1`` uses the shard_map runner over a block mesh;
    ``n_devices == 1`` uses the best single-chip executor (merged plan, or
    the region-partitioned executor when the RCM refinement reveals banded
    structure — see :func:`compile_single_chip`).
    """

    def __init__(
        self,
        decomposition,
        width: int,
        n_devices: Optional[int] = None,
        block_diagonal: bool = True,
        features: int = 16,
        state_dtype=None,
        row_split: int = 1,
        routing: str = "auto",
    ):
        """:param state_dtype: multi-device iteration-state dtype;
        ``jnp.bfloat16`` halves per-device state/replica HBM and routing
        wire bytes (see plan/memory.py) at ~bf16 rounding per level per
        iteration. Default float32 (exact parity with the reference).

        :param row_split: fat layout — split every block's panels by rows
        over this many extra mesh devices (``n_devices`` counts BLOCKS;
        the mesh uses ``n_devices * row_split`` chips). The reference's
        2q-1-rank fat layout is the ``row_split=2`` case
        (reference: arrow/arrow_mpi.py:26-93).

        :param routing: inter-level exchange mode — ``"all_to_all"``,
        ``"rounds"``, or ``"auto"`` (see plan/compile.py:compile_plan)."""
        self.width = width
        self.n_devices = n_devices or (len(jax.devices()) // row_split)
        self.block_diagonal = block_diagonal
        self._x = None
        self.iteration = 0
        if row_split > 1:
            from arrow_matrix_tpu.parallel.fat import FatArrowSpmm, fat_mesh

            self.plan = compile_plan(
                decomposition,
                width,
                self.n_devices,
                block_diagonal=block_diagonal,
                k_hint=features,
                row_split=row_split,
                routing=routing,
            )
            self._runner = FatArrowSpmm(
                self.plan,
                fat_mesh(self.n_devices, row_split),
                **({} if state_dtype is None else {"state_dtype": state_dtype}),
            )
            self._step = self._runner.step
        elif self.n_devices > 1:
            self.plan = compile_plan(
                decomposition,
                width,
                self.n_devices,
                block_diagonal=block_diagonal,
                k_hint=features,
                routing=routing,
            )
            self._runner = ArrowSpmm(
                self.plan,
                block_mesh(self.n_devices),
                **({} if state_dtype is None else {"state_dtype": state_dtype}),
            )
            self._step = self._runner.step
        else:
            self.plan, step_fn = compile_single_chip(
                decomposition, width, k_hint=features,
                state_dtype=state_dtype,
            )
            self._state_dtype = state_dtype
            self._device_plan = jax.device_put(self.plan)
            self._step_fn = step_fn
            jitted = jax.jit(step_fn)
            self._step = lambda x: jitted(self._device_plan, x)
        self._run = None

    @classmethod
    def from_path(
        cls,
        path: str,
        width: int,
        n_devices: Optional[int] = None,
        block_diagonal: bool = True,
        use_npy: bool = True,
        use_mmap: bool = False,
        **kw,
    ) -> "ArrowSession":
        """Load a decomposition from disk (graphio naming scheme) and build a
        session — the reference's ``load_decomposition_new`` + ``initialize``
        (reference: arrow_dec_mpi.py:629-887,106-177)."""
        loader = (
            graphio.load_decomposition_new if use_npy else graphio.load_decomposition
        )
        kwargs = {"mem_map": use_mmap} if use_npy else {}
        decomposition = loader(path, width, block_diagonal=block_diagonal, **kwargs)
        if not decomposition:
            raise FileNotFoundError(f"decomposition '{path}' width {width} not found")
        return cls(
            decomposition, width, n_devices, block_diagonal=block_diagonal, **kw
        )

    # ----------------------------------------------------------- features

    @property
    def n_rows(self) -> int:
        return self.plan.n_rows

    def zero_rhs(self, n_columns: int, dtype=np.float32) -> None:
        """Initialize the feature buffers (reference:
        arrow_slim_mpi.py:354-394)."""
        self.set_features(np.zeros((self.plan.n_rows, n_columns), dtype=dtype))

    @property
    def plan_is_fat(self) -> bool:
        return getattr(self.plan, "row_split", 1) > 1

    def set_features(self, X: np.ndarray) -> None:
        """Load features in ORIGINAL row order (the reference distributes
        X slices to matrix-0 column ranks)."""
        if self.n_devices > 1 or self.plan_is_fat:
            self._x = self._runner.distribute(np.asarray(X, dtype=np.float32))
        else:
            n_pad = self.plan.padded_rows
            Xp = np.zeros((n_pad, X.shape[1]), dtype=np.float32)
            Xp[: X.shape[0]] = X
            perm0 = np.asarray(self.plan.permutations[0])
            x = jnp.asarray(Xp[perm0])
            if self._state_dtype is not None:
                x = x.astype(self._state_dtype)
            self._x = jax.device_put(x)

    def step(self) -> None:
        """One iteration X <- A X (reference: arrow_dec_mpi.py:283-307)."""
        assert self._x is not None, "call set_features/zero_rhs first"
        self._x = self._step(self._x)
        self.iteration += 1

    def run(self, iterations: int) -> None:
        """Iterate ``X <- A X`` ``iterations`` times.

        The single-chip path fuses the whole run into one ``fori_loop``
        dispatch with ``unroll=2`` — the ping-pong two-buffer iteration that
        lets XLA write each unrolled body's result straight into the loop
        carry instead of paying a full-state copy at the while back edge
        (measured -22% per step on the windowed family,
        tools/probe_pingpong.py), and one dispatch instead of ``iterations``
        (the relay charges ~15-40 ms fixed per dispatch)."""
        assert self._x is not None, "call set_features/zero_rhs first"
        if iterations <= 0:
            return
        if self.n_devices > 1 or self.plan_is_fat:
            for _ in range(iterations):
                self.step()
            return
        if self._run is None:
            step_fn = self._step_fn

            def fused(plan, x, iters):
                return jax.lax.fori_loop(
                    0, iters, lambda i, s: step_fn(plan, s), x, unroll=2)

            self._run = jax.jit(fused, static_argnums=2)
        self._x = self._run(self._device_plan, self._x, iterations)
        self.iteration += iterations

    def allgather_result(self) -> np.ndarray:
        """Materialize the current features in original row order
        (reference: arrow_slim_mpi.py:415-425)."""
        assert self._x is not None
        if self.n_devices > 1 or self.plan_is_fat:
            return self._runner.collect(self._x)
        inv = np.argsort(np.asarray(self.plan.permutations[0]))
        return np.asarray(jax.device_get(self._x))[inv][: self.plan.n_rows]

    # Aliases matching the reference's shorter names.
    result_tile = allgather_result

    # ----------------------------------------------------------- checkpoint

    def save_checkpoint(self, path: str) -> None:
        """Persist the iterated state (features + iteration counter). The
        reference has no runtime checkpointing (SURVEY §5.4) — this is an
        extension; the decomposition itself is already on disk via graphio."""
        np.savez(
            path,
            features=self.allgather_result(),
            iteration=self.iteration,
            width=self.width,
            block_diagonal=self.block_diagonal,
        )

    def load_checkpoint(self, path: str) -> None:
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        assert int(data["width"]) == self.width, "checkpoint width mismatch"
        self.set_features(data["features"])
        self.iteration = int(data["iteration"])
