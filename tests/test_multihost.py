"""Genuine multi-process (DCN-path) validation: two CPU processes form one
global 8-device mesh via jax.distributed and run the distributed arrow SpMM
— the software path that spans hosts on a real pod slice
(reference analogue: mpiexec multi-rank launch, README.md:10)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.timeout(300)
def test_two_process_global_mesh():
    worker = os.path.join(os.path.dirname(__file__), "helpers", "multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    port = "12431"
    p1 = subprocess.Popen(
        [sys.executable, "-u", worker, "1", "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
    )
    p0 = subprocess.Popen(
        [sys.executable, "-u", worker, "0", "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
    )
    out0, _ = p0.communicate(timeout=240)
    out1, _ = p1.communicate(timeout=60)
    assert p0.returncode == 0, out0[-2000:]
    assert p1.returncode == 0, out1[-2000:]
    assert "MULTIHOST LOGS OK" in out0, out0[-2000:]
    assert "MULTIHOST OK" in out0, out0[-2000:]
