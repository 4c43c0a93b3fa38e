"""Host-side study: does within-block RCM refinement of the level-0 order
raise the merged matrix's tile density (BSR eligibility)?

For each family, build the merged single-chip matrix, then refine the
level-0 order with reverse-Cuthill-McKee applied INDEPENDENTLY inside each
width-block (a block-membership-preserving permutation keeps the arrow
block-diagonal criterion intact), and compare occupied-tile stats.

Usage: tools/rcm_density_study.py [family ...]
"""
import sys

import numpy as np
from scipy import sparse
from scipy.sparse.csgraph import reverse_cuthill_mckee

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert, grid_graph
from arrow_matrix_tpu.ops.bsr_pallas import tile_density_stats
from arrow_matrix_tpu.parallel.local import merge_levels_to_matrix
from arrow_matrix_tpu.plan.compile import pad_permutation
from arrow_matrix_tpu.io.graphio import as_csr


def block_rcm(Bt: sparse.csr_matrix, width: int) -> np.ndarray:
    """Permutation R (old position -> new position) from per-block RCM on the
    symmetrized pattern of the block-diagonal part of Bt."""
    n = Bt.shape[0]
    R = np.arange(n, dtype=np.int64)
    S = (Bt + Bt.T).tocsr()
    for b0 in range(0, n, width):
        b1 = min(b0 + width, n)
        blk = S[b0:b1, b0:b1]
        order = reverse_cuthill_mckee(blk.tocsr(), symmetric_mode=True)
        # order: new row r holds old row order[r]; R maps old -> new.
        R[b0 + order] = np.arange(b0, b1, dtype=np.int64)
    return R


def study(name, A, width):
    decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                                 block_diagonal=True, seed=2)
    mats = [as_csr(d[0]) for d in decomp]
    perms = [np.asarray(d[1], dtype=np.int64) for d in decomp]
    n = mats[0].shape[0]
    q = max(1, -(-n // width))
    n_pad = q * width
    padded = [pad_permutation(p, n_pad) for p in perms]
    inv0 = np.argsort(padded[0])
    Bt, cut = merge_levels_to_matrix(mats, padded, inv0, width, q)

    occ, nnz, avg = tile_density_stats(Bt)
    print(f"{name}: n={n} nnz={nnz} levels={len(decomp)} cut={cut}")
    print(f"  before: occupied_tiles={occ} avg_nnz_per_tile={avg:.1f}")

    R = block_rcm(Bt, width)
    P = sparse.csr_matrix((np.ones(cut, np.float32),
                           (R[:cut], np.arange(cut))), shape=(cut, cut))
    Bt2 = (P @ Bt @ P.T).tocsr()
    occ2, nnz2, avg2 = tile_density_stats(Bt2)
    assert nnz2 == nnz
    print(f"  after : occupied_tiles={occ2} avg_nnz_per_tile={avg2:.1f} "
          f"({occ/max(occ2,1):.2f}x fewer tiles)")

    # RCM on the whole merged matrix (ignores block structure; bound on what
    # any within-block scheme could reach -- NOT a valid arrow refinement).
    order = reverse_cuthill_mckee((Bt + Bt.T).tocsr(), symmetric_mode=True)
    Rg = np.empty(cut, np.int64); Rg[order] = np.arange(cut)
    Pg = sparse.csr_matrix((np.ones(cut, np.float32),
                            (Rg, np.arange(cut))), shape=(cut, cut))
    Bt3 = (Pg @ Bt @ Pg.T).tocsr()
    occ3, _, avg3 = tile_density_stats(Bt3)
    print(f"  global-RCM bound: occupied_tiles={occ3} avg={avg3:.1f}")


FAMS = sys.argv[1:] or ["grid", "ba", "ba1m"]
for fam in FAMS:
    if fam == "grid":
        A = grid_graph(450)
        study("grid-202k", A, A.shape[0] // 8 + 1)
    elif fam == "ba":
        A = barabasi_albert(200_000, 4, seed=1)
        study("ba-200k", A, 25_000)
    elif fam == "ba1m":
        A = barabasi_albert(1_000_000, 4, seed=1)
        study("ba-1m", A, 125_000)
