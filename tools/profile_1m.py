"""Profile the 1M-vertex blocked step on the TPU; print trace summary."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert
from arrow_matrix_tpu.parallel.blocked import blocked_step, compile_blocked_plan
from arrow_matrix_tpu.parallel.local import compile_local_plan, local_step
from arrow_matrix_tpu.utils.profiling import summarize_trace, sync

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
WIDTH = int(sys.argv[2]) if len(sys.argv) > 2 else 25_000
K = 16
MODE = sys.argv[3] if len(sys.argv) > 3 else "blocked"

A = barabasi_albert(N, 4, seed=1)
decomp = arrow_decomposition(A, WIDTH, max_number_of_levels=100,
                             block_diagonal=True, seed=2)
nnz = sum(int(l.matrix.nnz) for l in decomp)
print(f"n={A.shape[0]} nnz={nnz} levels={len(decomp)}", flush=True)

if MODE == "blocked":
    plan = compile_blocked_plan(decomp, WIDTH, k_hint=K)
    step_fn = blocked_step
elif MODE == "region":
    from arrow_matrix_tpu.parallel.region import compile_region_plan, region_step
    region_rows = int(sys.argv[4]) if len(sys.argv) > 4 else None
    plan = compile_region_plan(decomp, WIDTH, k_hint=K, region_rows=region_rows)
    n_parts = sum(len(p) for p in plan.stripes)
    print(f"region plan: {len(plan.stripes)} stripes, {n_parts} parts",
          flush=True)
    step_fn = region_step
else:
    plan = compile_local_plan(decomp, WIDTH, k_hint=K)
    step_fn = local_step

plan = jax.device_put(plan)


def run(plan, x, iters):
    return jax.lax.fori_loop(0, iters, lambda i, x: step_fn(plan, x), x)


run = jax.jit(run, static_argnums=2)
n_rows = getattr(plan, "padded_rows", None) or plan.n_blocks * plan.width
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (n_rows, K), dtype=np.float32))

sync(run(plan, x, 1))
sync(run(plan, x, 11))
print("compiled", flush=True)

t0 = time.perf_counter()
sync(run(plan, x, 1))
t1 = time.perf_counter() - t0
t0 = time.perf_counter()
sync(run(plan, x, 11))
t11 = time.perf_counter() - t0
dt = (t11 - t1) / 10
print(f"step={dt*1e3:.2f} ms  nnz/s={nnz/dt/1e6:.1f} M", flush=True)

step1 = jax.jit(lambda p, x: step_fn(p, x))
try:
    txt = step1.lower(plan, x).compile().as_text()
    open("/tmp/hlo_step.txt", "w").write(txt)
    print(f"wrote /tmp/hlo_step.txt ({len(txt)} bytes)", flush=True)
except Exception as e:  # optimized-HLO retrieval is best-effort via relay
    print(f"no HLO text: {e}", flush=True)
y = step1(plan, x); sync(y)
with jax.profiler.trace("/tmp/trace_1m"):
    y = step1(plan, x)
    y = step1(plan, y)
    sync(y)
for name, ms, cnt in summarize_trace("/tmp/trace_1m", top=35, iters=2):
    print(f"{ms:9.3f} ms  x{cnt:<4d} {name}", flush=True)


import glob, os, re
cands = sorted(glob.glob("/tmp/hlo_1m/*jit__lambda*after_optimizations.txt"),
               key=os.path.getmtime)
cands += ["/tmp/hlo_step.txt"] if os.path.exists("/tmp/hlo_step.txt") else []
if cands:
    txt = open(cands[-1]).read()
    defs = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+) = (.*)", line)
        if m:
            defs[m.group(1)] = m.group(2)[:220]
    import collections, gzip, json
    files = sorted(glob.glob("/tmp/trace_1m/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(files[-1]))
    agg = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            agg[e["name"]] += e["dur"]
    shown = 0
    for name, dur in agg.most_common(200):
        if not (name.startswith("fusion") or name.startswith("copy")):
            continue
        d = defs.get(name, "?")
        print(f"{dur/2e3:8.2f} ms {name}: {d}", flush=True)
        shown += 1
        if shown >= 18:
            break
