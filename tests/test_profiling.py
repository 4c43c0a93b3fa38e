"""Profiling utilities smoke tests."""

import numpy as np

import jax
import jax.numpy as jnp

from arrow_matrix_tpu.utils import profiling


def test_sync_fences_computation():
    x = jnp.ones((64, 8)) * 3.0
    y = x @ x.T
    profiling.sync(y)  # must not raise, works on any backend
    assert np.isfinite(np.asarray(y)).all()


def test_trace_and_summarize(tmp_path):
    path = str(tmp_path / "trace")
    with profiling.trace(path):
        y = jnp.arange(1024.0).reshape(32, 32) @ jnp.eye(32)
        profiling.sync(y)
    rows = profiling.summarize_trace(path, top=5)
    assert isinstance(rows, list)  # trace may be empty on CPU, API holds
    for name, ms, count in rows:
        assert ms >= 0 and count >= 1
