"""Billion-nnz host rehearsal (VERDICT r4 item 8): STREAM-generate an RMAT
scale-25 graph (~33.6M rows, ~1.0B nnz after symmetrize+dedup) to disk in
bounded memory, decompose it with the C++ core at the production width
ratio, save, and out-of-core compile the distributed plan from the
memory-mapped triplets. Records wall time and peak RSS per phase.

Differences vs tools/rehearsal_500m.py (scale 24): generation goes through
``io.generate.streamed_rmat_csr`` — chunked edge generation to raw memmaps
plus a three-pass out-of-core counting-sort CSR build — so the 22 GB
generation-RSS floor of the in-memory path disappears; the decomposition
reads the memmapped CSR directly (ctypes pulls pages on demand).

The reference's Julia rewrite exists exactly for this scale
(reference: README.md:50,67-68; width default 5,000,000 for ~226M-row mawi,
scripts/decomposition_main.py:123 — rows/width ~45, reproduced here:
2^25 = 33.6M rows / width 730k -> q = 46).

Usage: python tools/rehearsal_1b.py [scale] [out_dir] [--no-compile] [--keep]
(``--keep`` leaves the saved decomposition on disk for follow-up
per-level compiles, tools/compile_1b_level.py.)
"""

import json
import os
import resource
import shutil
import sys
import time

import numpy as np

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SCALE = int(args[0]) if args else 25
OUT = args[1] if len(args) > 1 else "/tmp/rehearsal1b"
COMPILE = "--no-compile" not in sys.argv
KEEP = "--keep" in sys.argv
Q = 46  # production rows/width ratio (mawi: 226M rows / width 5M)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    from arrow_matrix_tpu.decomposition import arrow_decomposition, native
    from arrow_matrix_tpu.io.generate import streamed_rmat_csr
    from arrow_matrix_tpu.io import graphio

    assert native.AVAILABLE, "C++ core required for the rehearsal"
    report = {"scale": SCALE, "q": Q, "streamed": True}

    os.makedirs(OUT, exist_ok=True)
    gendir = os.path.join(OUT, "gen")
    tic = time.time()
    A = streamed_rmat_csr(SCALE, gendir, edge_factor=16, seed=7,
                          symmetric=True)
    report["generate_s"] = round(time.time() - tic, 1)
    report["n"] = int(A.shape[0])
    report["nnz"] = int(A.nnz)
    report["rss_after_generate_gb"] = round(rss_gb(), 2)
    width = -(-A.shape[0] // Q)
    report["width"] = width
    print(json.dumps(report), flush=True)

    tic = time.time()
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=3,
        symmetric=True,
    )
    report["decompose_s"] = round(time.time() - tic, 1)
    report["levels"] = len(decomp)
    report["decomp_nnz"] = int(sum(int(l.matrix.nnz) for l in decomp))
    report["rss_after_decompose_gb"] = round(rss_gb(), 2)
    print(json.dumps(report), flush=True)

    prefix = os.path.join(OUT, "rmat")
    tic = time.time()
    graphio.save_decomposition_new(None, decomp, prefix)
    report["save_s"] = round(time.time() - tic, 1)
    del A, decomp  # the out-of-core compile must not lean on live copies
    shutil.rmtree(gendir, ignore_errors=True)
    print(json.dumps(report), flush=True)

    if COMPILE:
        tic = time.time()
        loaded = graphio.load_decomposition_new(
            prefix, width, block_diagonal=True, mem_map=True
        )
        report["load_mmap_s"] = round(time.time() - tic, 1)

        from arrow_matrix_tpu.plan.compile import compile_plan

        tic = time.time()
        plan = compile_plan(loaded, width, n_devices=Q, k_hint=16)
        report["compile_s"] = round(time.time() - tic, 1)
        report["rss_after_compile_gb"] = round(rss_gb(), 2)
        report["plan_nnz"] = int(plan.nnz())
        fmts = {
            type(getattr(lvl, r)).__name__
            for lvl in plan.levels
            for r in ("head", "diag", "col")
            if getattr(lvl, r) is not None
        }
        report["formats"] = sorted(fmts)
    report["disk_gb"] = round(
        sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(OUT)
            for f in files
        ) / 1e9,
        2,
    )
    print(json.dumps(report), flush=True)
    if not KEEP:
        shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
