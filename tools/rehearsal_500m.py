"""Reference-scale host rehearsal (VERDICT r3 item 5): decompose a ~500M-nnz
RMAT graph with the C++ core at a production-ratio width, save the npy-triplet
decomposition, then OUT-OF-CORE compile the full distributed plan from the
memory-mapped triplets. Records wall time and peak RSS per phase.

The reference's Julia rewrite exists exactly for this scale
(reference: README.md:50,67-68; width default 5,000,000 for ~226M-row mawi,
scripts/decomposition_main.py:123 — a rows/width ratio of ~45, reproduced
here: 2^24 = 16.8M rows / width 365k -> q = 46).

Usage: python tools/rehearsal_500m.py [scale] [out_dir]
"""

import json
import os
import resource
import shutil
import sys
import time

import numpy as np

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 24
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rehearsal500m"
Q = 46  # production rows/width ratio (mawi: 226M rows / width 5M)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    from arrow_matrix_tpu.decomposition import arrow_decomposition, native
    from arrow_matrix_tpu.io.generate import rmat_graph
    from arrow_matrix_tpu.io import graphio

    assert native.AVAILABLE, "C++ core required for the rehearsal"
    report = {"scale": SCALE, "q": Q}

    tic = time.time()
    A = rmat_graph(SCALE, edge_factor=16, seed=7, symmetric=True)
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
    report["rss_after_decompose_gb"] = round(rss_gb(), 2)
    print(json.dumps(report), flush=True)

    os.makedirs(OUT, exist_ok=True)
    prefix = os.path.join(OUT, "rmat")
    tic = time.time()
    graphio.save_decomposition_new(None, decomp, prefix)
    report["save_s"] = round(time.time() - tic, 1)
    del A, decomp  # the out-of-core compile must not lean on live copies

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
            os.path.getsize(os.path.join(OUT, f))
            for f in os.listdir(OUT)
        ) / 1e9,
        2,
    )
    print(json.dumps(report), flush=True)
    shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
