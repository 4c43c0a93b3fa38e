#!/bin/bash
# Test runner — the analogue of the reference's scripts/run_tests.sh
# (reference: scripts/run_tests.sh:8-11, which oversubscribes MPI ranks on
# one machine). Multi-device coverage comes from XLA's 8-virtual-CPU-device
# mesh, configured in tests/conftest.py.
set -e
cd "$(dirname "$0")"
python -m pytest tests/ -q "$@"
