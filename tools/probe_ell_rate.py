"""Measure the gather-ELL slot rate as a function of SOURCE size (rows)
on banded (grid) operators — the recalibration data for the windowed
auto-gate's ELL alternative pricing (VERDICT r4 weak #1 / item 3).

The round-1 constants modeled a two-level step: 2.2 ns/slot on the plateau
(sources <= FOLD_SOURCE_ROWS) and 6.0 beyond. Measured truth on the
three-algorithm table: grid-202k ELL runs ~4 ms (~4.9 ns/slot) though its
202.5k-row source sits *under* the 262k cliff — the physical source
footprint (512 B/row lane-padded -> 104 MB) is already far off-cache, so
the near-cliff rate is a RAMP, not a step. This probe times raw
``ell_spmm`` fori-differenced across grid sizes (40k..490k rows) and the
forced-window build at 202k for the same-matrix contrast.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from arrow_matrix_tpu.io.generate import grid_graph
from arrow_matrix_tpu.ops.ell import ell_spmm
from arrow_matrix_tpu.ops.formats import ell_from_csr
from arrow_matrix_tpu.utils.profiling import sync

ITERS = 30
K = 16

out = {}


def timed(run, pj, xj, iters=ITERS):
    sync(run(pj, xj, 1)); sync(run(pj, xj, iters))
    t1s, tns = [], []
    for _ in range(3):
        tic = time.perf_counter(); sync(run(pj, xj, 1))
        t1s.append(time.perf_counter() - tic)
        tic = time.perf_counter(); sync(run(pj, xj, iters))
        tns.append(time.perf_counter() - tic)
    return max((np.median(tns) - np.median(t1s)) / (iters - 1), 1e-9)


for side in (200, 300, 380, 450, 550, 700):
    A = grid_graph(side)
    n = A.shape[0]
    m = ell_from_csr(A)
    slots = int(np.prod(np.asarray(m.idx).shape))
    rng = np.random.default_rng(0)
    x0 = rng.random((n, K), dtype=np.float32)

    def step(p, v):
        y = ell_spmm(p, v)
        return y[: v.shape[0]]

    run = jax.jit(
        lambda p, v, it: lax.fori_loop(0, it, lambda i, s: step(p, s), v),
        static_argnums=2,
    )
    pj = jax.device_put(m)
    xj = jnp.asarray(x0)
    y = np.asarray(jax.jit(step)(pj, xj))
    want = A @ x0
    rel = float(np.abs(y - want).max() / max(np.abs(want).max(), 1e-30))
    dt = timed(run, pj, xj)
    key = f"grid-{side}sq-ell"
    out[key] = {
        "rows": n, "slots": slots, "step_ms": dt * 1e3,
        "ns_per_slot": dt * 1e9 / slots, "rel_err": rel,
    }
    print(key, json.dumps(out[key]), flush=True)

# Forced windowed on the same 202k natural-order matrix, for the contrast.
from arrow_matrix_tpu.ops.bsr_pallas import (
    bsr_spmm_window, windowed_bsr_from_csr, window_padded_rows,
)

A = grid_graph(450)
wm = windowed_bsr_from_csr(A)
H = window_padded_rows(wm)
unit = wm.inner.rows_per_program * wm.inner.tile_m
H = -(-H // unit) * unit
rng = np.random.default_rng(0)
x0 = np.zeros((H, 128), dtype=np.float32)
x0[: A.shape[0], :K] = rng.random((A.shape[0], K), dtype=np.float32)
run = jax.jit(
    lambda p, v, it: lax.fori_loop(
        0, it, lambda i, s: bsr_spmm_window(p, s, raw=True, out_rows=H), v),
    static_argnums=2,
)
pj = jax.device_put(wm)
xj = jnp.asarray(x0)
y = np.asarray(jax.jit(
    lambda p, v: bsr_spmm_window(p, v, raw=True, out_rows=H))(pj, xj))
want = A @ x0[: A.shape[0], :K]
rel = float(np.abs(y[: A.shape[0], :K] - want).max()
            / max(np.abs(want).max(), 1e-30))
dt = timed(run, pj, xj)


def bt(m):
    if m is None:
        return 0
    td = m.tiles_data
    return int(td.shape[0] * td.shape[1]) if td.ndim == 4 else int(td.shape[0])


out["grid-450sq-window"] = {
    "rows": int(A.shape[0]), "step_ms": dt * 1e3,
    "inner_tiles": bt(wm.inner), "residual_tiles": bt(wm.residual),
    "rel_err": rel,
}
print("grid-450sq-window", json.dumps(out["grid-450sq-window"]), flush=True)
print(json.dumps({"metric": "ell_rate_probe", "variants": out}))
