"""Project multi-chip step time and scaling efficiency from a compiled
distributed plan plus measured single-chip constants — the quantitative
scaling story while real multi-chip hardware is unavailable (NOTES backlog
items 1/6; BASELINE.json targets >= 80% efficiency).

Everything here is a MODEL-BASED PROJECTION, not a hardware measurement —
single-chip constants are measured on v5e, multi-chip composition is modeled
(no multi-chip slice exists in this environment). Constants are imported
from ops/bsr_pallas.py so re-calibrations propagate here automatically
(round-3 fit: resident 111 ns/tile + 312 ns/program, stream 320, window 200,
gather plateau 2.2 ns/slot with 6.0 on big sources — see those constants'
docstrings):

* gather-ELL work: occupied slots x the measured plateau rate;
* BSR work: stored tiles x the per-tile stream rate (+ per-program cost);
* windowed work: in-window tiles at the windowed rate, residual/straddler
  tiles at the streaming rate;
* compute per device = sum over levels of its role costs; the step's
  compute span = max over devices (the folding imbalance);
* wire per device = plan/comm.py exact bytes / ICI bandwidth (v5e ~45 GB/s
  effective per direction on a 1-D ring torus axis per chip), fully
  overlappable with compute in the fused program — the projection reports
  compute-bound, wire-bound, and the max of the two.

Usage: tools/mesh_projection.py [graph: ba|grid] [vertices] [k] [q ...]
"""
import functools
import os
import sys

import numpy as np

# Pure host-side projection — never needs the chip (and must not claim the
# tunnel while a real bench runs): force CPU before any jax-touching import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert, grid_graph
from arrow_matrix_tpu.ops.bsr_pallas import (
    BSR_PROGRAM_NS,
    BSR_STREAM_NS_PER_TILE,
    BSR_TILE_STREAM_NS,
    BSR_WINDOW_NS_PER_TILE,
    ELL_NS_PER_SLOT,
    ELL_NS_PER_SLOT_BIG,
    BsrMat,
)
from arrow_matrix_tpu.ops.ell import FOLD_SOURCE_ROWS
from arrow_matrix_tpu.plan import compile_plan
from arrow_matrix_tpu.plan.comm import arrow_comm_volume
from arrow_matrix_tpu.plan.memory import arrow_hbm_footprint

ICI_BYTES_PER_S = 45e9

#: Fitted per-program-instance overhead of the blocked (distributed-
#: program-on-one-chip) executor — tools/fit_stripe_overhead.py, round 5:
#: measured-minus-modeled divided by part instances gives 421 us (ba-200k,
#: 14 instances) and 435 us (ba-1m, 198 instances) — two independent
#: configs within 3%, so the per-instance cost is real and flat. The
#: projection brackets each step with [no overhead, max fitted overhead x
#: role instances]: the truth for a fused SPMD program lies inside (its
#: role kernels skip the blocked executor's window-materialization
#: dispatch chains, but pay launch+assembly per role per level).
STRIPE_OVH_RANGE_NS = (0.0, 435_000.0)

#: Measured single-chip MERGED step (ms) — the strong-scaling reference
#: point t1 (round-5 unroll=2 numbers for grid, round-4 for ba).
T1_MERGED_MS = {
    ("ba", 200_000, 16): 6.64,
    ("ba", 1_000_000, 16): 50.0,
    ("grid", 202_500, 16): 1.01,
    ("grid", 1_000_000, 16): 5.54,
}

#: Measured wall (ms) of the FUSED q=8 SPMD program serialized on one chip
#: (tools/bench_emulate_chip.py, round 5, best batching mode per config):
#: the exact distributed program — common stacked formats, real exchange
#: tables, every gather/assembly — minus only the ICI transfers. Unlike the
#: blocked executor it has no per-part launch artifact, so emulated/8 is a
#: measured per-device compute+assembly span. The anchored projection
#: calibrates the model with F = measured / model_serial_total(q=8) and
#: reports model x F at every q (assumes the model's RELATIVE structure
#: across q; the absolute rate is measured). The emulation still pays
#: single-chip serialization artifacts (scan-mode format-slice copies,
#: cache sharing), so the anchor is a mild upper estimate.
EMULATED_Q8_MS = {
    ("ba", 200_000, 16): 38.3,      # unroll mode
    ("ba", 1_000_000, 16): 238.0,   # scan mode
    ("grid", 202_500, 16): 18.1,    # unroll mode
    ("grid", 1_000_000, 16): 103.5, # scan mode
}

GRAPH = sys.argv[1] if len(sys.argv) > 1 else "ba"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
K = int(sys.argv[3]) if len(sys.argv) > 3 else 16
QS = [int(a) for a in sys.argv[4:]] or [2, 4, 8, 16]

if GRAPH == "grid":
    side = int(N ** 0.5)
    A = grid_graph(side)
else:
    A = barabasi_albert(N, 4, seed=1)
n = A.shape[0]
nnz_A = A.nnz
print(f"{GRAPH} n={n} nnz={nnz_A} k={K}", flush=True)


def role_ns_per_device(m):
    """(q,) compute-ns of one stacked role."""
    from arrow_matrix_tpu.ops.bsr_pallas import WindowedBsr

    if m is None:
        return 0.0
    if isinstance(m, WindowedBsr):
        # In-window tiles at the calibrated windowed rate; residual
        # (straddler) tiles at the streaming rate.
        ns = _bsr_tiles(m.inner) * (BSR_WINDOW_NS_PER_TILE or 200.0)
        if m.residual is not None:
            ns = ns + _bsr_tiles(m.residual) * (
                BSR_STREAM_NS_PER_TILE or 320.0
            )
        return ns
    if isinstance(m, BsrMat):
        progs = _bsr_tiles(m) / max(1, m.tiles_per_program)
        return _bsr_tiles(m) * BSR_TILE_STREAM_NS + progs * BSR_PROGRAM_NS
    inner = getattr(m, "inner", m)  # CompactEll wraps an EllMat
    val = np.asarray(inner.val)
    slots = (val != 0).sum(axis=(-2, -1))
    # Big gather sources fall off the plateau (ops/ell.py fold bound);
    # role sources are width-bounded per device, so n_cols is the height.
    rate = (
        ELL_NS_PER_SLOT
        if inner.n_cols <= FOLD_SOURCE_ROWS
        else ELL_NS_PER_SLOT_BIG
    )
    return slots * rate


def _bsr_tiles(m):
    """Per-device count of stored tiles with any nonzero payload."""
    data = np.asarray(m.tiles_data)
    return (np.abs(data).sum(axis=(-2, -1)) > 0).sum(axis=-1)


@functools.lru_cache(maxsize=None)
def model_q(q):
    """(per_dev ns array, role_instances, plan) of the q-device program."""
    width = -(-n // q)
    decomp = arrow_decomposition(A, width, max_number_of_levels=100,
                                 block_diagonal=True, seed=2)
    plan = compile_plan(decomp, width, q, k_hint=K)
    per_dev = np.zeros(q)
    role_instances = 0
    for lvl in plan.levels:
        for role in (lvl.head, lvl.diag, lvl.col, lvl.band_lo, lvl.band_hi):
            per_dev = per_dev + role_ns_per_device(role)
            if role is not None:
                role_instances += 1
        if lvl.route is not None:
            # Forward/backward routing gathers + assembly: ~3 width-rows of
            # gather work per level per device at the plateau rate.
            per_dev = per_dev + 3 * width * ELL_NS_PER_SLOT
    return per_dev, role_instances, plan


_emu = EMULATED_Q8_MS.get((GRAPH, n, K))
F_ANCHOR = _emu * 1e6 / model_q(8)[0].sum() if _emu is not None else None
if F_ANCHOR is not None:
    print(f"emulation anchor: q=8 measured {_emu} ms serialized, "
          f"model x{F_ANCHOR:.2f}", flush=True)

for q in QS:
    width = -(-n // q)
    per_dev, role_instances, plan = model_q(q)
    vol = arrow_comm_volume(plan, K)
    wire_s = vol["total_bytes"] / ICI_BYTES_PER_S
    fp = arrow_hbm_footprint(plan, K)
    # Bracket with the fitted per-instance overhead (every device runs the
    # same SPMD program: role_instances kernels per step).
    effs, steps = [], []
    for ovh in STRIPE_OVH_RANGE_NS:
        pd = per_dev + ovh * role_instances
        compute_s = pd.max() * 1e-9
        step_s = max(compute_s, wire_s)
        steps.append(step_s)
        effs.append(pd.sum() * 1e-9 / (q * step_s))
    # Load-balance efficiency (total work / q*step) hides REPLICATED
    # overhead (every device pays it, balance stays perfect) — also report
    # strong-scaling efficiency vs the measured single-chip merged step,
    # which is what degrades when per-role launch costs replicate.
    t1 = T1_MERGED_MS.get((GRAPH, n, K))
    scaling = (
        f" scale_eff={t1 / 1e3 / (q * steps[1]):.2f}-"
        f"{t1 / 1e3 / (q * steps[0]):.2f}"
        if t1
        else ""
    )
    anchored = ""
    if F_ANCHOR is not None:
        step_emu = max(per_dev.max() * F_ANCHOR * 1e-9, wire_s)
        anchored = f" step_emu={step_emu*1e3:7.3f} ms"
        if t1:
            anchored += f" scale_eff_emu={t1 / 1e3 / (q * step_emu):.2f}"
    print(
        f"q={q:3d} width={width:8d} levels={len(plan.levels)} "
        f"roles/step={role_instances} wire={wire_s*1e3:7.3f} ms "
        f"step={steps[0]*1e3:7.3f}-{steps[1]*1e3:7.3f} ms "
        f"nnz/s={nnz_A/steps[1]/1e6:8.1f}-{nnz_A/steps[0]/1e6:8.1f} M "
        f"balance_eff={min(effs):.2f}-{max(effs):.2f}{scaling}{anchored} "
        f"hbm/dev={fp['total_bytes']/2**20:7.1f} MiB"
        f"{'' if fp['fits_v5e'] else ' (OVER v5e BUDGET)'}",
        flush=True,
    )
