"""Measure bf16 A-tile payloads for the windowed BSR kernel (v5e).

The windowed step at grid-1M is A-tile-DMA bound (NOTES: 5.47 ms of the
8.32 ms step streams 2.0 GB of (128,128) f32 tiles at 0.8% density).
Lossless bf16 payloads (unit edge weights; kernels upcast tiles to f32
before the MXU dot, so results are bit-identical) halve that stream.

Races matrix_dtype=np.float32 vs "auto" (-> bf16) through
compile_single_chip on the grid family, with a scipy correctness check.

Usage: tools/tpurun.sh python tools/bench_bf16_tiles.py [--vertices N]
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vertices", type=int, default=1_000_000)
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--iterations", type=int, default=30)
    args = p.parse_args()

    from bench import build_graph, make_sync, make_timer

    from arrow_matrix_tpu.decomposition import arrow_decomposition
    from arrow_matrix_tpu.parallel.local import (
        compile_single_chip,
        state_cols,
    )

    time_step = make_timer(args.iterations, make_sync())
    A, width = build_graph("grid", args.vertices, 4, 25_000)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=2
    )
    nnz = sum(int(lvl.matrix.nnz) for lvl in decomp)

    out = {"vertices": int(A.shape[0]), "nnz": nnz, "k": args.k}
    rng = np.random.default_rng(0)
    ys = {}
    for label, mdt in (("f32", np.float32), ("auto", "auto")):
        plan, step_fn = compile_single_chip(
            decomp, width, k_hint=args.k, matrix_dtype=mdt
        )
        fmt = plan.levels[0].fmt if hasattr(plan, "levels") else "region"
        tdt = (
            str(plan.levels[0].mat.inner.tiles_data.dtype)
            if fmt == "window"
            else "n/a"
        )
        cols = state_cols(plan, args.k) if hasattr(plan, "levels") else args.k
        x0 = np.zeros((plan.padded_rows, cols), dtype=np.float32)
        x0[:, : args.k] = rng.random((plan.padded_rows, args.k),
                                     dtype=np.float32)
        dt = time_step(plan, step_fn, x0)
        # Correctness: one step vs scipy on the permuted operand.
        import jax
        import jax.numpy as jnp

        y = np.asarray(
            jax.jit(step_fn)(jax.device_put(plan), jnp.asarray(x0))
        )[: plan.padded_rows, : args.k]
        ys[label] = y
        P0 = np.asarray(plan.permutations[0])
        n = A.shape[0]
        xh = np.zeros((plan.padded_rows, args.k), np.float32)
        xh[:] = x0[:, : args.k]
        src = np.zeros(n, dtype=np.int64)
        src[P0[P0 < n]] = np.nonzero(P0 < n)[0]
        # golden: y[P0 rows] = A @ x[P0 cols]
        xg = np.zeros((n, args.k), np.float32)
        xg[:] = xh[src][:n]
        yg = A @ xg
        rel = float(
            np.linalg.norm(y[src][:n] - yg) / max(np.linalg.norm(yg), 1e-30)
        )
        out[label] = {
            "fmt": fmt,
            "tile_dtype": tdt,
            "step_ms": dt * 1e3,
            "nnz_per_s": nnz / dt,
            "rel_err": rel,
        }
    out["bitexact"] = bool(np.array_equal(ys["f32"], ys["auto"]))
    out["speedup"] = out["f32"]["step_ms"] / out["auto"]["step_ms"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
