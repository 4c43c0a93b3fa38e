"""Single-chip layout refinement of the merged operator.

The distributed plans must preserve the arrow structure per level (head
rows/cols + block diagonal — that is what bounds communication, reference:
arrow/arrow_mpi.py:26-93). The single-chip executors, however, run the
MERGED operator ``P_0 A P_0^T`` (all levels summed in level-0 order), and
there any *global* relayout is legal so long as it is composed into the
plan's I/O permutation (``plan.permutations[0]`` — every caller lays out
features by it and inverts it on output).

This module refines the merged layout with reverse-Cuthill-McKee on the
symmetrized pattern. Effects (measured, v5e):

* tile clustering — on the planar grid-202k family RCM cuts occupied
  (128,128) tiles 2.1x (13.1k -> 6.2k, 62 -> 130 nnz/tile), turning most of
  the matrix BSR/MXU-eligible;
* bandedness — the region executor's stripes then touch only neighboring
  column regions (parts/stripe ~2-3 instead of ~6), and gather indices
  become band-local (the fast regime of the gather engine).

On scattered power-law families RCM makes tiling WORSE (BA-200k: 628k ->
861k occupied tiles), so refinement is gated twice in ``auto`` mode:

* a degree-skew pre-gate skips RCM outright on power-law structure —
  measured p99.9/mean symmetrized degree: grid 1.0, ER 1.3 (worth trying)
  vs BA 17.3, RMAT-s18 39.7 (always rejected, and RCM on a 31M-nnz RMAT
  costs 46s of pure compile-time waste);
* the relayout is then adopted only when it reduces occupied tiles by at
  least 15%.

Within-block RCM (which would be a valid *arrow* refinement usable by the
distributed path too) was measured a no-op — the spanning-forest
linearization already provides that locality (grid: 1.05x) — so only the
global variant exists.
"""

from __future__ import annotations

import numpy as np
from scipy import sparse
from scipy.sparse.csgraph import reverse_cuthill_mckee

from arrow_matrix_tpu.ops.bsr_pallas import tile_density_stats

#: ``auto`` adopts RCM only when occupied tiles shrink by this factor.
AUTO_TILE_GAIN = 0.85

#: ``auto`` skips RCM when p99.9 of the symmetrized degrees exceeds this
#: multiple of the mean (power-law structure; measured separation above).
AUTO_SKEW_SKIP = 4.0


def rcm_refine_merged(
    Bt: sparse.csr_matrix,
    padded_perms: list[np.ndarray],
    mode: str = "auto",
) -> tuple[sparse.csr_matrix, list[np.ndarray], bool]:
    """Maybe relayout the merged operator with global RCM.

    :param Bt: merged (cut, cut) CSR in level-0 order.
    :param padded_perms: per-level padded permutations (position ->
        original vertex); entry 0 is the plan's I/O layout.
    :param mode: ``"never"`` | ``"auto"`` | ``"always"``.
    :returns: ``(Bt', padded_perms', applied)`` — inputs unchanged unless
        ``applied``.
    """
    if mode == "never" or Bt.shape[0] == 0 or Bt.nnz == 0:
        return Bt, padded_perms, False
    if mode not in ("auto", "always"):
        raise ValueError(f"unknown refine mode {mode!r}")

    cut = Bt.shape[0]
    if mode == "auto":
        deg = np.diff(Bt.indptr) + np.bincount(Bt.indices, minlength=cut)
        nz = deg[deg > 0]
        if nz.size and np.percentile(nz, 99.9) > AUTO_SKEW_SKIP * nz.mean():
            return Bt, padded_perms, False
    # Symmetrize the PATTERN, not the values: A + A.T cancels antisymmetric
    # entry pairs (scipy drops the resulting explicit zeros), which would
    # hand RCM an emptier graph than the structure it must order.
    absBt = abs(Bt)
    sym = (absBt + absBt.T).tocsr()
    order = np.asarray(
        reverse_cuthill_mckee(sym, symmetric_mode=True), dtype=np.int64
    )
    Bt2 = Bt[order][:, order].tocsr()
    if mode == "auto":
        occ0, _, _ = tile_density_stats(Bt)
        occ2, _, _ = tile_density_stats(Bt2)
        if occ2 > AUTO_TILE_GAIN * occ0:
            return Bt, padded_perms, False
    # New position r holds old position order[r], which holds original
    # vertex perm0[order[r]]; positions >= cut (padding) are untouched.
    p0 = np.array(padded_perms[0], dtype=np.int64, copy=True)
    p0[:cut] = np.asarray(padded_perms[0])[order]
    return Bt2, [p0, *padded_perms[1:]], True
