"""Differentiable arrow SpMM operator (``jax.custom_vjp``).

A capability the MPI reference cannot offer: ``X -> A @ X`` through the
compiled arrow program as a *differentiable* JAX function, so GNN models
built on the propagation (GCN/SGC layers, spectral losses, PageRank-style
fixed points) train end-to-end under ``jax.grad`` — on the same mesh, with
the backward pass running as another arrow SpMM.

The math: the decomposition gives ``A = sum_i P_i^T B_i P_i`` (the golden
``compute_spmm`` semantics, decomposition/arrow.py:260), hence
``A^T = sum_i P_i^T B_i^T P_i`` — the *same permutations* with each level
transposed, and a transposed arrow matrix is still an arrow matrix (the head
row/column panels swap, diagonal blocks stay diagonal, the ±1 band maps to
itself). The VJP of ``x -> A @ x`` is therefore one step of the transpose
plan **in the same state layout** — gather-only like the forward program
(the naive autodiff transpose of a gather is a scatter, which serializes on
TPU; this never materializes one).

Layout safety: the forward map on the padded state is ``F = S A S^T`` with
``S`` the (orthogonal) pad-and-permute encoding, so ``F^T = S A^T S^T`` is
exactly the transpose plan's step — including the zeroed padding rows. On
the single-chip path the transpose plan is built from the *already merged
and refined* operator (``Bt^T`` under the same composed permutation), so
RCM refinement composes correctly into both directions.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from arrow_matrix_tpu.io.graphio import as_csr
from arrow_matrix_tpu.parallel.arrow_spmm import ArrowSpmm, block_mesh
from arrow_matrix_tpu.parallel.local import (
    local_plan_from_merged,
    local_step,
    merge_levels_to_matrix,
)
from arrow_matrix_tpu.plan import compile_plan
from arrow_matrix_tpu.plan.compile import pad_permutation
from arrow_matrix_tpu.plan.refine import rcm_refine_merged

__all__ = ["ArrowOperator", "transpose_decomposition"]


def transpose_decomposition(decomposition):
    """``[(B_i, p_i)] -> [(B_i^T, p_i)]`` — a decomposition of ``A^T``
    (still arrow-structured; see module docstring)."""
    return [(as_csr(m).T.tocsr(), p) for m, p in decomposition]


def _linear_pair(step_f, step_b):
    """Wrap two mutually-transposed linear steps as differentiable
    functions. Reverse-mode only (``custom_vjp``)."""

    @jax.custom_vjp
    def apply(x):
        return step_f(x)

    apply.defvjp(lambda x: (step_f(x), None), lambda _, g: (step_b(g),))

    @jax.custom_vjp
    def apply_t(x):
        return step_b(x)

    apply_t.defvjp(lambda x: (step_b(x), None), lambda _, g: (step_f(g),))
    return apply, apply_t


class ArrowOperator:
    """``A`` as a pair of differentiable device functions.

    :ivar apply: ``state -> state`` computing ``A @ X`` (custom VJP: the
        cotangent goes through the transpose plan).
    :ivar apply_t: ``state -> state`` computing ``A^T @ X`` (its VJP is the
        forward plan).

    Both run on the operator's state layout; move data with
    :meth:`distribute` / :meth:`collect` (multi-device: sharded over the
    block mesh; single chip: level-0 permuted padded array).
    """

    def __init__(
        self,
        decomposition,
        width: int,
        n_devices: Optional[int] = None,
        block_diagonal: bool = True,
        k_hint: int = 16,
        refine: str = "auto",
        state_dtype=None,
    ):
        """:param state_dtype: propagation-state dtype; ``jnp.bfloat16``
        halves every dense byte stream of both directions (measured ~2x on
        the windowed family) and the gradients ride the same dtype through
        the custom VJP. Also selects the bf16-regime 512-tile X window.
        ``distribute`` casts into it; default float32."""
        self.width = width
        self.n_devices = n_devices or len(jax.devices())
        self.state_dtype = state_dtype
        mats = [as_csr(d[0]) for d in decomposition]
        self.n_rows = mats[0].shape[0]

        if self.n_devices > 1:
            q = self.n_devices
            plan_f = compile_plan(
                decomposition, width, q,
                block_diagonal=block_diagonal, k_hint=k_hint,
            )
            plan_b = compile_plan(
                transpose_decomposition(decomposition), width, q,
                block_diagonal=block_diagonal, k_hint=k_hint,
            )
            mesh = block_mesh(q)
            kw = {} if state_dtype is None else {"state_dtype": state_dtype}
            self._fwd = ArrowSpmm(plan_f, mesh, **kw)
            self._bwd = ArrowSpmm(plan_b, mesh, **kw)
            step_f, step_b = self._fwd.step, self._bwd.step
        else:
            perms = [np.asarray(d[1], dtype=np.int64) for d in decomposition]
            q = max(1, -(-self.n_rows // width))
            padded_perms = [pad_permutation(p, q * width) for p in perms]
            inv0 = np.argsort(padded_perms[0])
            Bt, cut = merge_levels_to_matrix(mats, padded_perms, inv0, width, q)
            Bt, padded_perms, _ = rcm_refine_merged(Bt, padded_perms, refine)
            plan_f, plan_b = self._compile_pair(
                Bt, cut, padded_perms, q, k_hint, state_dtype
            )
            dpf, dpb = jax.device_put(plan_f), jax.device_put(plan_b)
            jf, jb = jax.jit(local_step), jax.jit(local_step)
            step_f = lambda x: jf(dpf, x)
            step_b = lambda x: jb(dpb, x)
            # Exposed so callers embedding the step in an OUTER jit (e.g.
            # an iterated fori_loop benchmark) can pass the plans as
            # arguments — closing over them inlines tens of MB of format
            # arrays as HLO constants (the relay's compile endpoint
            # rejects such programs with HTTP 413).
            self.device_plan_f, self.device_plan_b = dpf, dpb
            # The windowed pair re-pads the permutations to the shared
            # zero-copy state height — read the layout off the PLAN.
            self._perm0 = np.asarray(plan_f.permutations[0])
            self._padded_rows = plan_f.padded_rows
            self._fwd = self._bwd = None

        self.apply, self.apply_t = _linear_pair(step_f, step_b)

    def _compile_pair(self, Bt, cut, padded_perms, q, k_hint, state_dtype):
        """Compile forward + transpose merged plans on ONE shared state
        layout. Both directions get the windowed zero-copy treatment when
        the calibrated gate accepts BOTH (the transpose of an RCM-banded
        operator is banded with the same profile); the padded heights are
        aligned so the custom-VJP cotangent rides the forward layout
        unchanged. Falls back to the generic merged plans otherwise."""
        from arrow_matrix_tpu.parallel.local import windowed_merged_plan

        wt = (
            512
            if state_dtype is not None
            and jnp.dtype(state_dtype) == jnp.bfloat16
            else None
        )
        BtT = Bt.T.tocsr()
        wf = windowed_merged_plan(
            Bt, cut, padded_perms, self.width, q, self.n_rows,
            k_hint=k_hint, window_tiles=wt,
        )
        if wf is not None:
            wb = windowed_merged_plan(
                BtT, cut, padded_perms, self.width, q, self.n_rows,
                k_hint=k_hint, window_tiles=wt,
                min_padded=wf.padded_rows,
            )
            if wb is not None:
                # Align the two padded heights. Rounding to each side's
                # program-group unit can overshoot when the units differ
                # (the transpose's row-tile density profile picks its own
                # rows_per_program) — iterate to the fixed point, reusing
                # the built formats (padding is independent of the pack).
                for _ in range(4):
                    if wf.padded_rows == wb.padded_rows:
                        return wf, wb
                    h = max(wf.padded_rows, wb.padded_rows)
                    wf = windowed_merged_plan(
                        Bt, cut, padded_perms, self.width, q, self.n_rows,
                        k_hint=k_hint, min_padded=h,
                        wm=wf.levels[0].mat,
                    )
                    wb = windowed_merged_plan(
                        BtT, cut, padded_perms, self.width, q, self.n_rows,
                        k_hint=k_hint, min_padded=h,
                        wm=wb.levels[0].mat,
                    )
                if wf.padded_rows == wb.padded_rows:
                    return wf, wb
                # Units never converged (co-prime program groups) — fall
                # back to the generic merged pair rather than crash.
        plan_f = local_plan_from_merged(
            Bt, cut, padded_perms, self.width, q, self.n_rows, k_hint=k_hint
        )
        plan_b = local_plan_from_merged(
            BtT, cut, padded_perms, self.width, q, self.n_rows,
            k_hint=k_hint,
        )
        return plan_f, plan_b

    # -------------------------------------------------------------- data

    def distribute(self, X: np.ndarray):
        """(n, k) host features -> device state (cast to ``state_dtype``
        when the operator declares one)."""
        if self._fwd is not None:
            return self._fwd.distribute(X)
        X = np.asarray(X, dtype=np.float32)
        Xp = np.zeros((self._padded_rows, X.shape[1]), dtype=np.float32)
        Xp[: X.shape[0]] = X
        x = jnp.asarray(Xp[self._perm0])
        if self.state_dtype is not None:
            x = x.astype(self.state_dtype)
        return x

    def collect(self, x) -> np.ndarray:
        """Device state -> (n, k) host features in original row order."""
        if self._fwd is not None:
            return self._fwd.collect(x)
        inv = np.argsort(self._perm0)
        return np.asarray(jax.device_get(x))[inv][: self.n_rows]
