"""Out-of-core compile of ONE level of the saved billion-nnz decomposition
(the compile leg of VERDICT r4 item 8: the FULL q=46 plan compile measured
an OOM >123 GB anon RSS at 1.05B nnz — a banked negative; the per-level
compile is the out-of-core unit the executor actually loads).

Usage: python tools/compile_1b_level.py <decomp_dir> <width> [level|all]

``all`` compiles the FULL plan through the round-5 STREAMING path
(plan/compile.iter_levels: one level's raw blocks live at a time) — the
all-at-once path OOM-killed >123 GB; this run is its re-test.
"""

import json
import os
import resource
import sys
import time

import numpy as np


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    from arrow_matrix_tpu.io import graphio
    from arrow_matrix_tpu.plan.compile import compile_plan

    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rehearsal1b"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 729_445
    arg3 = sys.argv[3] if len(sys.argv) > 3 else "0"
    lvl = None if arg3 == "all" else int(arg3)
    q = 46

    tic = time.time()
    decomp = graphio.load_decomposition_new(
        os.path.join(d, "rmat"), width, block_diagonal=True, mem_map=True
    )
    sub = decomp if lvl is None else decomp[lvl : lvl + 1]
    report = {
        "load_mmap_s": round(time.time() - tic, 1),
        "levels_on_disk": len(decomp),
        "level": "all" if lvl is None else lvl,
        "level_nnz": int(sum(graphio.csr_nnz(m) for m, _ in sub)),
    }
    print(json.dumps(report), flush=True)

    tic = time.time()
    plan = compile_plan(sub, width, n_devices=q, k_hint=16)
    report["compile_level_s"] = round(time.time() - tic, 1)
    report["rss_after_compile_gb"] = round(rss_gb(), 2)
    report["plan_nnz"] = int(plan.nnz())
    report["formats"] = sorted({
        type(getattr(l, r)).__name__
        for l in plan.levels
        for r in ("head", "diag", "col")
        if getattr(l, r) is not None
    })
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
