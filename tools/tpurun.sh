#!/bin/bash
# Run a python script on the tunneled TPU with retry-on-stall.
# Usage: tools/tpurun.sh <script.py> [args...]
# Retries on timeout (124/143) and on transient axon backend-init failures
# ("Unable to initialize backend 'axon'" — the tunnel drops sporadically).
log=$(mktemp)
trap 'rm -f "$log"' EXIT
for attempt in 1 2 3; do
  PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}" timeout ${TPURUN_TIMEOUT:-500} \
    python -u "$@" 2>&1 | tee "$log" | grep --line-buffered -v "WARNING.*xla_bridge"
  rc=${PIPESTATUS[0]}
  if [ $rc -eq 0 ]; then exit 0; fi
  if [ $rc -ne 124 ] && [ $rc -ne 143 ] \
     && ! grep -q "Unable to initialize backend" "$log"; then exit $rc; fi
  echo "[tpurun] attempt $attempt failed (rc=$rc); cooling down 90s" >&2
  sleep 90
done
exit 1
