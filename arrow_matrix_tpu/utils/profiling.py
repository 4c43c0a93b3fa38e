"""Profiling and multi-host helpers.

Tracing parity (SURVEY §5.1): the reference wraps every comm/kernel phase in
``time.perf_counter`` spans. Under XLA one jit step fuses all phases, so
fine-grained attribution comes from device traces instead:

    with profiling.trace("/tmp/trace"):
        x = runner.step(x)
        profiling.sync(x)

and :func:`summarize_trace` aggregates per-op device time from the written
trace — the tooling used to drive this framework's own optimization.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
from contextlib import contextmanager

import numpy as np

import jax


def sync(arr) -> None:
    """Reliable device fence: transfer one element.

    ``jax.block_until_ready`` can return before execution finishes on
    relayed/experimental PJRT backends; a device->host transfer of (a slice
    of) the result is always ordered after the computation."""
    np.asarray(jax.device_get(arr if np.ndim(arr) == 0 else arr.ravel()[:1]))


@contextmanager
def trace(path: str):
    with jax.profiler.trace(path):
        yield


def fori_time(step_fn, plan, x, iterations: int, reps: int = 3,
              unroll: int = 2) -> float:
    """Differenced 1- vs N-iteration ``fori_loop`` timing of one iterated
    step, returning seconds/iteration. Through the axon relay every dispatch
    carries ~15-40 ms fixed cost; differencing two loop lengths isolates the
    device step, and each loop length is timed ``reps`` times with the
    MEDIANS differenced (the fixed cost varies +-10 ms per dispatch, which
    single-shot differencing leaks into fast steps as +-8% noise). ``plan``
    rides as a jit ARGUMENT (closed-over device arrays re-materialize as HLO
    constants and can trip the relay's compile body limit).

    ``unroll=2`` (default) is the ping-pong two-buffer iteration: a one-step
    while body must write its output into the buffer its kernels are still
    reading, so XLA inserts a full-state copy at the back edge (~1.58 ms f32
    at grid-1M, tools/profile_window_step.py). With the body unrolled to
    ``x -> step -> y -> step -> z``, step 2 reads the scratch ``y`` and XLA
    writes ``z`` straight into the carry buffer — measured to remove exactly
    the priced copy on the windowed family (grid-1M 7.10 -> 5.54 ms f32,
    3.66 -> 2.85 bf16; grid-202k bf16 0.70 -> 0.43; tools/probe_pingpong.py),
    and it is semantics-preserving for every executor."""
    import statistics
    import time

    import jax.numpy as jnp  # noqa: F401 — keep jax imported lazily above

    # Differencing needs two distinct loop lengths; at iterations=1 the
    # difference is pure noise and the 1e-9 clamp would print absurd
    # throughput.
    assert iterations >= 2, "fori_time needs iterations >= 2"

    run = jax.jit(
        lambda p, v, n: jax.lax.fori_loop(
            0, n, lambda i, s: step_fn(p, s), v, unroll=unroll),
        static_argnums=2,
    )
    sync(run(plan, x, 1))
    sync(run(plan, x, iterations))

    def timed(n):
        ts = []
        for _ in range(reps):
            tic = time.perf_counter()
            sync(run(plan, x, n))
            ts.append(time.perf_counter() - tic)
        return statistics.median(ts)

    t1 = timed(1)
    tn = timed(iterations)
    return max((tn - t1) / max(1, iterations - 1), 1e-9)


def summarize_trace(path: str, top: int = 20, iters: int = 1):
    """Aggregate per-op device durations from the newest trace under
    ``path``; returns [(name, total_ms / iters, count)]."""
    files = sorted(glob.glob(f"{path}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return []
    data = json.load(gzip.open(files[-1]))
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and not e["name"].startswith("$"):
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    return [
        (name, dur / 1e3 / iters, cnt[name]) for name, dur in agg.most_common(top)
    ]


def initialize_multihost(**kwargs) -> None:
    """Initialize multi-host JAX (DCN) — call once per process before any
    computation. Thin wrapper over ``jax.distributed.initialize`` so drivers
    stay backend-agnostic; the reference's equivalent is MPI launch
    (``mpiexec``) with Cray-MPICH (reference: README.md:10). On a multi-host
    TPU pod slice the block mesh simply spans all processes' devices and the
    same collectives ride ICI within a slice and DCN across slices."""
    jax.distributed.initialize(**kwargs)
