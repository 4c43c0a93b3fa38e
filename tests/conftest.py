"""Test configuration: run everything on an 8-device virtual CPU mesh.

The reference simulates multi-node runs by oversubscribing MPI ranks on one
machine (reference: scripts/run_tests.sh:8-11); the TPU-native analogue is
XLA's host-platform device virtualization — 8 CPU "chips" stand in for an
8-device TPU slice, exercising the same shard_map/collective code paths.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
