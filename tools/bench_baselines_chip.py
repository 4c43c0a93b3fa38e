"""Three-algorithm on-chip comparison (VERDICT r3 item 3): run the rebuilt
1.5D and PETSc-style baselines through their REAL CLIs on the basket graphs
(ba-200k, grid-202k; k = 16 and 128) on one device, fori-differenced timing,
validated. Arrow's numbers for the same graphs come from the driver basket
(BENCH_r{N}.json) — together they form the reference's core experiment
(reference: scripts/spmm_15d_main.py:231-276, spmm_petsc.py:398-495) as a
measured wall-clock table rather than comm-volume modeling.
"""

import json
import os
import tempfile

import numpy as np
from scipy import sparse

from arrow_matrix_tpu.io.generate import barabasi_albert, grid_graph

WORK = tempfile.mkdtemp(prefix="baselines_chip_")
GRAPHS = {
    "ba-200k": barabasi_albert(200_000, 4, seed=1),
    "grid-202k": grid_graph(450),
}

results = {}
for name, A in GRAPHS.items():
    A = A.astype(np.float32).tocsr()
    npz = os.path.join(WORK, f"{name}.npz")
    sparse.save_npz(npz, A)
    # PETSc slice naming for a 1-device run: one slice = the whole matrix.
    sparse.save_npz(os.path.join(WORK, f"{name}.part.1.slice.0.npz"), A)

    for k in (16, 128):
        from arrow_matrix_tpu.cli import spmm_15d, spmm_petsc

        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            spmm_15d.main([
                "--dataset", "file", "--file", npz, "--columns", str(k),
                "--iterations", "20", "--devices", "1", "--timing", "fori",
                "--validate", "true", "--log_dir", WORK,
            ])
        r15 = json.loads(buf.getvalue().strip().splitlines()[-1])
        results[f"{name}/k{k}/15d"] = r15
        print(f"{name}/k{k}/15d", json.dumps(r15), flush=True)

        buf = io.StringIO()
        with redirect_stdout(buf):
            spmm_petsc.main([
                "--file", os.path.join(WORK, name), "--devices", "1",
                "--columns", str(k), "--iterations", "20",
                "--timing", "fori", "--validate", "true", "--log_dir", WORK,
            ])
        rp = json.loads(buf.getvalue().strip().splitlines()[-1])
        results[f"{name}/k{k}/petsc"] = rp
        print(f"{name}/k{k}/petsc", json.dumps(rp), flush=True)

print(json.dumps({"metric": "baselines_on_chip", "results": results}))
