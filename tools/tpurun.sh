#!/bin/bash
# Run a python script on the tunneled TPU with retry-on-stall.
# Usage: tools/tpurun.sh <script.py> [args...]
for attempt in 1 2 3; do
  timeout ${TPURUN_TIMEOUT:-500} python -u "$@" 2>&1 | grep --line-buffered -v "WARNING.*xla_bridge"
  rc=${PIPESTATUS[0]}
  if [ $rc -eq 0 ]; then exit 0; fi
  if [ $rc -ne 124 ] && [ $rc -ne 143 ]; then exit $rc; fi
  echo "[tpurun] attempt $attempt stalled (rc=$rc); cooling down 90s" >&2
  sleep 90
done
exit 1
