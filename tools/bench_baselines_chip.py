"""Measure the two baselines ON-CHIP next to arrow (VERDICT r3 item 3).

The reference's core experiment benchmarks all three algorithms on the same
matrices (reference: scripts/spmm_15d_main.py:231-276,
arrow/baseline/spmm_petsc.py:398-495); until now only the arrow path had
driver-measured wall clocks — the arrow-vs-1.5D comparison was comm-volume
only (plan/comm.py). This tool runs ``cli.spmm_15d`` and ``cli.spmm_petsc``
(n_devices = 1, fori-differenced timing, validated) on the bench basket
graphs at k = 16 and 128 and prints a three-algorithm table against the
arrow numbers of record (BENCH_r03 driver run).

Run from the repo root: ``python -m tools.bench_baselines_chip``.
"""

import contextlib
import io
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scipy import sparse  # noqa: E402

from bench import build_graph  # noqa: E402

# Arrow numbers of record (driver BENCH_r03, real v5e chip) for context.
ARROW_R03 = {
    ("ba-200k", 16): 241.1e6,
    ("grid-202k", 16): 488.4e6,
    ("ba-200k", 128): 243.3e6,
    ("grid-202k", 128): 499.2e6,
}

CONFIGS = [
    ("ba-200k", "ba", 200_000),
    ("grid-202k", "grid", 202_500),
]
KS = (16, 128)
ITERATIONS = 30

if "--smoke" in sys.argv:  # tiny CPU shakeout of the harness itself
    CONFIGS = [("ba-2k", "ba", 2_000), ("grid-2k", "grid", 2_025)]
    KS = (16,)
    ITERATIONS = 3


def run_cli(main, argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(argv)
    lines = [l for l in buf.getvalue().splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def main():
    from arrow_matrix_tpu.cli import spmm_15d, spmm_petsc

    out = {}
    with tempfile.TemporaryDirectory() as tmp:
        for name, family, vertices in CONFIGS:
            A, _ = build_graph(family, vertices, 4, 25_000)
            npz = os.path.join(tmp, f"{name}.npz")
            sparse.save_npz(npz, A.tocsr())
            # PETSc slice naming scheme at P=1 (one slice = the matrix).
            slice_path = os.path.join(tmp, f"{name}.part.1.slice.0.npz")
            os.link(npz, slice_path)
            for k in KS:
                common = ["--devices", "1", "--iterations", str(ITERATIONS),
                          "--timing", "fori", "--validate", "true",
                          "--log_dir", tmp, "--columns", str(k)]
                r15 = run_cli(spmm_15d.main,
                              ["--dataset", "file", "--file", npz] + common)
                rp = run_cli(spmm_petsc.main,
                             ["--file", os.path.join(tmp, name)] + common)
                key = f"{name}/k{k}"
                out[key] = {
                    "spmm_15d_nnz_per_s": r15["nnz_per_s"],
                    "spmm_15d_step_ms": r15["median_spmm_time"] * 1e3,
                    "spmm_15d_format": r15.get("format"),
                    "petsc_nnz_per_s": rp["nnz_per_s"],
                    "petsc_step_ms": rp["median_spmm_time"] * 1e3,
                    "arrow_r03_nnz_per_s": ARROW_R03.get((name, k)),
                }
                if family == "grid":
                    # Naturally banded input: also measure the baseline's
                    # forced windowed-BSR kernel (the auto gate rates it a
                    # wash against near-cliff ELL; settle it on hardware).
                    rw = run_cli(
                        spmm_15d.main,
                        ["--dataset", "file", "--file", npz,
                         "--format", "window"] + common,
                    )
                    out[key]["spmm_15d_window_nnz_per_s"] = rw["nnz_per_s"]
                print(key, json.dumps(out[key]), flush=True)
    print(json.dumps({"metric": "baselines_on_chip", "configs": out}))


if __name__ == "__main__":
    main()
