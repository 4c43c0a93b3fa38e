import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2])
# 8 global devices regardless of process count (2 procs x 4, 4 procs x 2).
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={max(1, 8 // nproc)}"
)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
port = sys.argv[3] if len(sys.argv) > 3 else "12399"
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
import os as _os
sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))
import numpy as np
from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert, random_dense
from arrow_matrix_tpu.parallel import ArrowSpmm, block_mesh
from arrow_matrix_tpu.plan import compile_plan
from arrow_matrix_tpu.bench.failure import all_processes_succeeded

n, width, q = 400, 51, 8  # 8 global devices spanning all processes
A = barabasi_albert(n, 4, seed=8)
decomp = arrow_decomposition(A, width, max_number_of_levels=100, block_diagonal=True, seed=1)
plan = compile_plan(decomp, width, q)
runner = ArrowSpmm(plan, block_mesh(q))  # global mesh across processes
X = random_dense(n, 8, seed=2)
x = runner.distribute(X)
ref = X.copy()
ok = True
try:
    for _ in range(3):
        x = runner.step(x)
        ref = A @ ref
    got = runner.collect(x)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    ok = rel < 1e-5
    if pid == 0:
        print(f"[proc0] devices={len(jax.devices())} local={len(jax.local_devices())} rel={rel:.2e}", flush=True)
except Exception as e:
    ok = False
    print(f"[proc{pid}] FAILED: {e}", flush=True)
assert all_processes_succeeded(ok)

# Process-0 log aggregation (reference gathers all ranks' logs to rank 0,
# arrow/common/wb_logging.py:67-69). Process 1 logs NOTHING: finish() must
# still enter the gather collective on every process (an early return with
# an empty buffer deadlocks the peers inside process_allgather).
import tempfile, json
from arrow_matrix_tpu.utils import metrics
logging_procs = [p for p in range(nproc) if p != 1] if nproc > 1 else [0]
if pid in logging_procs:
    metrics.wandb_init(algorithm="mh_test", dataset="ba400", config={"nproc": nproc})
    metrics.set_iteration_data({"iteration": 0})
    metrics.log({"proc_marker": pid})
log_dir = os.environ.get("MH_LOG_DIR", tempfile.gettempdir())
path = metrics.finish(log_dir=log_dir)
if pid == 0:
    assert path is not None
    recs = [json.loads(l) for l in open(path)]
    assert sorted(r["proc_marker"] for r in recs) == logging_procs, recs
    assert sorted(r["process"] for r in recs) == logging_procs, recs
    print("MULTIHOST LOGS OK", flush=True)
else:
    assert path is None

if pid == 0:
    print("MULTIHOST OK", flush=True)
