#!/bin/bash
# Run the queued TPU measurements in order, one process at a time, appending
# to tools/tpu_queue.log. Safe to re-run; each phase is independently
# timeout-guarded via tpurun.sh. Probe the relay first — exits 2 if down.
set -u
cd "$(dirname "$0")/.."
LOG=tools/tpu_queue.log
stamp() { date -u +"%Y-%m-%dT%H:%M:%SZ"; }

echo "[$(stamp)] probing relay" | tee -a "$LOG"
if ! timeout 60 python -c "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
  echo "[$(stamp)] relay DOWN" | tee -a "$LOG"
  exit 2
fi
echo "[$(stamp)] relay UP — running queue" | tee -a "$LOG"

run() {
  echo "[$(stamp)] >>> $*" | tee -a "$LOG"
  TPURUN_TIMEOUT=580 tools/tpurun.sh "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}  # tee's status would mask a failed measurement
  echo "[$(stamp)] <<< rc=$rc $*" | tee -a "$LOG"
}

# 1. Calibrate streaming + windowed BSR kernels (sets no constants itself;
#    read the ns/tile lines and update ops/bsr_pallas.py afterwards).
run tools/bench_bsr_stream.py a
run tools/bench_bsr_stream.py b 450 16
# 2. Region-step breakdown (where do the non-BSR ms go at grid-202k?).
run tools/profile_region.py 450 16384 16
# 3. Windowed/stream at the 1M planar scale.
run tools/bench_bsr_stream.py b 1000 16
# 4. Headline bench refresh (default BA config + grid family + 128M-nnz
#    rmat big case exercising the chunked-gather path).
run bench.py
run bench.py --graph grid --vertices 1000000
run bench.py --graph rmat --vertices 4000000 --mode local --iterations 20
# 5. Differentiable operator: forward vs transposed-plan backward timing.
run tools/bench_operator.py
echo "[$(stamp)] queue done" | tee -a "$LOG"
