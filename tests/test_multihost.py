"""Genuine multi-process (DCN-path) validation: two CPU processes form one
global 8-device mesh via jax.distributed and run the distributed arrow SpMM
— the software path that spans hosts on a real pod slice
(reference analogue: mpiexec multi-rank launch, README.md:10)."""

import os
import subprocess
import sys

import pytest


# Hang protection comes from the communicate(timeout=...) calls below —
# pytest-timeout is not installed, so a @pytest.mark.timeout would be an
# inert unknown mark (PytestUnknownMarkWarning), not a guard.
@pytest.mark.parametrize("nproc,port", [(2, "12431"), (4, "12437")])
def test_multi_process_global_mesh(nproc, port):
    worker = os.path.join(os.path.dirname(__file__), "helpers", "multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    others = [
        subprocess.Popen(
            [sys.executable, "-u", worker, str(pid), str(nproc), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(1, nproc)
    ]
    p0 = subprocess.Popen(
        [sys.executable, "-u", worker, "0", str(nproc), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
    )
    out0, _ = p0.communicate(timeout=240)
    outs = [p.communicate(timeout=60)[0] for p in others]
    assert p0.returncode == 0, out0[-2000:]
    for p, out in zip(others, outs):
        assert p.returncode == 0, out[-2000:]
    assert "MULTIHOST LOGS OK" in out0, out0[-2000:]
    assert "MULTIHOST OK" in out0, out0[-2000:]
