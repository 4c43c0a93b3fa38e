"""Test configuration: run everything on an 8-device virtual CPU mesh.

The reference simulates multi-node runs by oversubscribing MPI ranks on one
machine (reference: scripts/run_tests.sh:8-11); the TPU-native analogue is
XLA's host-platform device virtualization — 8 CPU "chips" stand in for an
8-device TPU slice, exercising the same shard_map/collective code paths.

NOTE: this environment pins ``JAX_PLATFORMS=axon`` (a tunneled single TPU
chip) at interpreter start, so we must *force* the CPU platform here — both
via the env var and jax.config — before any computation runs. Otherwise every
tiny test would claim the TPU tunnel and remote-compile.
"""

import os

# Must be set before the CPU client is instantiated.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
