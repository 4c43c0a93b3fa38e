"""Production-width HBM rehearsal: measure the memory model's bricks on the
real chip (VERDICT r2 item 6).

The slim-fits-v5e claim (plan/memory.py: 14.7 GiB at width 5M, mawi-like
q=46) rests on the (8,128)-tile padded-bytes model. This tool allocates the
width-dominated arrays at PRODUCTION size on the device and compares
measured HBM deltas (device memory_stats) against tpu_padded_bytes, then
times a q=1 distributed step in f32 vs bf16 state (capacity lever's perf
neutrality).

Usage: tools/memory_rehearsal.py [width] [k]
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from arrow_matrix_tpu.plan.memory import tpu_padded_bytes
from arrow_matrix_tpu.utils.profiling import sync

WIDTH = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
Q = 46  # mawi-like production block count (plan/memory.py slim_fat_model)

dev = jax.devices()[0]


def used():
    st = dev.memory_stats()
    if st is None:
        return None
    return st.get("bytes_in_use", None)


def measure(name, shape, dtype):
    before = used()
    a = jax.device_put(jnp.zeros(shape, dtype))
    sync(a)
    after = used()
    model = tpu_padded_bytes(shape, np.dtype(dtype).itemsize)
    meas = None if before is None or after is None else after - before
    print(
        f"{name:28s} shape={shape} dtype={np.dtype(dtype).name:8s} "
        f"model={model/2**30:7.3f} GiB measured="
        + (f"{meas/2**30:7.3f} GiB ratio={meas/model:5.2f}"
           if meas is not None else "n/a"),
        flush=True,
    )
    return a, model, meas


w_q = -(-WIDTH // Q)
rows = []
live = []  # hold ALL bricks simultaneously: if memory_stats is unavailable
# through the relay, a successful combined allocation is the capacity
# evidence (an under-modeled footprint would OOM here first).
total_model = 0
for name, shape, dt in [
    ("state f32 (w_q+w, k) x2", (2 * (w_q + WIDTH), K), jnp.float32),
    ("state bf16 (w_q+w, k)", (w_q + WIDTH, K), jnp.bfloat16),
    ("replica f32 (w0, k)", (Q * w_q, K), jnp.float32),
    ("ELL idx (slots=2.1/row)", (int(WIDTH * 2.1), 8), jnp.int32),
    ("k=128 state f32", (w_q + WIDTH, 128), jnp.float32),
]:
    a, model, meas = measure(name, shape, dt)
    rows.append({"name": name, "model": model, "measured": meas})
    total_model += model
    live.append(a)
print(f"combined live bricks: model {total_model/2**30:.2f} GiB — "
      "allocated simultaneously without OOM" , flush=True)
del live

# ---- bf16 vs f32 distributed step on a 1-device mesh (perf neutrality)
from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert, random_dense
from arrow_matrix_tpu.parallel import ArrowSpmm, block_mesh
from arrow_matrix_tpu.plan import compile_plan

# One block (q=1) so the comparison runs on the single real chip: the
# collectives are no-ops, leaving exactly the bf16 state + per-block
# upcast/downcast overhead the capacity lever adds.
n = 200_000
bench_w = n
A = barabasi_albert(n, 4, seed=1)
decomp = arrow_decomposition(A, bench_w, max_number_of_levels=1,
                             block_diagonal=True, seed=2)
nnz = sum(int(l.matrix.nnz) for l in decomp)
q = 1
plan = compile_plan(decomp, bench_w, q)
X = random_dense(n, K, seed=3)
out = {"metric": "memory_rehearsal", "width": WIDTH, "q": Q, "bricks": rows}
if len(jax.devices()) >= q:
    for dt, label in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        runner = ArrowSpmm(plan, block_mesh(q), state_dtype=dt)
        x = runner.distribute(X)
        iters = 30
        run = runner.run
        sync(run(x, 1)); sync(run(x, iters))
        tic = time.perf_counter(); sync(run(x, 1)); t1 = time.perf_counter() - tic
        tic = time.perf_counter(); sync(run(x, iters)); tn = time.perf_counter() - tic
        dtms = (tn - t1) / (iters - 1) * 1e3
        print(f"distributed step ({label}): {dtms:.2f} ms "
              f"({nnz/dtms*1e3/1e6:.1f} M nnz/s)", flush=True)
        out[f"step_ms_{label}"] = dtms
else:
    print(f"only {len(jax.devices())} device(s); skipping the q={q} "
          f"distributed-step timing", flush=True)
print(json.dumps(out))
