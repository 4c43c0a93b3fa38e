"""Buffered metrics/logging with the reference's taxonomy and sinks.

Capability parity with ``wb_logging`` (reference: arrow/common/wb_logging.py):

* a per-process log buffer of one dict per iteration;
  ``set_iteration_data``/``log`` merge spans into the current iteration
  (reference: wb_logging.py:48-64);
* ``finish()`` flushes everything — to wandb when available and configured
  (lockfile-serialized init, reference: wb_logging.py:21-46), and always to a
  local sink ``./logs/{algorithm}.{dataset}.{uuid}.jsonl`` plus a ``.config``
  json (reference: wb_logging.py:83-114 writes pickle/txt/config);
* ``log_local_runs`` re-uploads previously written local logs
  (reference: wb_logging.py:135-160, scripts/wb_log_main.py).

Metric names keep the reference's span taxonomy (``spmm_kernel_time``,
``spmm_x_bcast_time``, ``spmm_row_reduce``, ``forward/back_agg_all_to_all_v``,
…) so dashboards are comparable across the two implementations.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Dict, List, Optional

try:
    import wandb  # optional

    _HAS_WANDB = True
except Exception:
    wandb = None
    _HAS_WANDB = False

_buffer: List[Dict[str, Any]] = []
_current: Dict[str, Any] = {}
_config: Dict[str, Any] = {}
_run = None
_enabled = True


def wandb_init(
    algorithm: str,
    dataset: str,
    config: Optional[Dict[str, Any]] = None,
    tags: Optional[List[str]] = None,
    project: str = "spmm-tpu",
) -> None:
    """Start a run. Records config {dataset, width, n_features, iterations,
    device, n_devices, algorithm, ...} (reference: wb_logging.py:163-205).
    Uses wandb only if importable AND WANDB_API_KEY is set; otherwise the
    local sink alone."""
    global _run, _config
    _config = dict(config or {})
    _config.update({"algorithm": algorithm, "dataset": dataset})
    if _HAS_WANDB and os.environ.get("WANDB_API_KEY"):
        _run = wandb.init(
            project=project,
            name=f"{algorithm}.{dataset}",
            config=_config,
            tags=tags or [algorithm, dataset],
        )


def set_iteration_data(data: Dict[str, Any]) -> None:
    """Close the previous iteration's record and start a new one
    (reference: wb_logging.py:48-57)."""
    global _current
    if _current:
        _buffer.append(_current)
    _current = dict(data)


def log(data: Dict[str, Any]) -> None:
    """Merge spans into the current iteration record; repeated keys
    accumulate (timers are additive within an iteration)
    (reference: wb_logging.py:58-64)."""
    for key, value in data.items():
        if key in _current and isinstance(value, (int, float)):
            _current[key] += value
        else:
            _current[key] = value


def _gather_process_logs(records: List[Dict[str, Any]]) -> List[List[Dict[str, Any]]]:
    """On a multi-process run, gather every process's log buffer (the
    reference gathers all ranks' logs to rank 0 before writing,
    reference: wb_logging.py:67-69). Returns one record list per process;
    single-process returns [records]."""
    try:
        import jax

        n_proc = jax.process_count()
    except Exception:
        n_proc = 1
    if n_proc == 1:
        return [records]
    import numpy as np
    from jax.experimental import multihost_utils

    payload = np.frombuffer(json.dumps(records).encode(), dtype=np.uint8)
    lengths = multihost_utils.process_allgather(
        np.asarray([payload.size], dtype=np.int64)
    ).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros(max_len, dtype=np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for p in range(n_proc):
        raw = bytes(gathered[p][: int(lengths[p])])
        out.append(json.loads(raw.decode()) if raw else [])
    return out


def finish(log_dir: str = "./logs") -> Optional[str]:
    """Flush the buffer: stream to wandb if active, and always write
    ``{algorithm}.{dataset}.{uuid}.jsonl`` + ``.config`` locally
    (reference: wb_logging.py:67-114). On multi-process runs, all
    processes' buffers are gathered and process 0 writes the merged file
    (records carry a ``process`` field); other processes write nothing and
    return None. Returns the local log path."""
    global _current, _buffer, _run
    if _current:
        _buffer.append(_current)
        _current = {}
    try:
        import jax

        multiproc = jax.process_count() > 1
    except Exception:
        multiproc = False
    # The gather is a COLLECTIVE: every process must enter it even with an
    # empty buffer, or peers with data deadlock inside process_allgather.
    if not multiproc and not _buffer and not _config:
        return None

    per_process = _gather_process_logs(_buffer)
    _buffer = []
    if not any(per_process) and not _config:
        return None
    try:
        import jax

        if jax.process_count() > 1 and jax.process_index() != 0:
            if _run is not None:
                _run.finish()
                _run = None
            return None
    except Exception:
        pass

    os.makedirs(log_dir, exist_ok=True)
    sanitize = lambda s: str(s).replace(os.sep, "_").replace(".", "_")
    algo = sanitize(_config.get("algorithm", "run"))
    dataset = sanitize(_config.get("dataset", "data"))
    base = os.path.join(log_dir, f"{algo}.{dataset}.{uuid.uuid4().hex[:8]}")
    path = base + ".jsonl"
    with open(path, "w") as f:
        for proc, records in enumerate(per_process):
            for i, rec in enumerate(records):
                f.write(
                    json.dumps({"process": proc, "iteration": i, **rec}) + "\n"
                )
    with open(base + ".config", "w") as f:
        json.dump(_config, f, indent=2)

    if _run is not None:
        for records in per_process:
            for rec in records:
                _run.log(rec)
        _run.finish()
        _run = None
    return path


def log_local_runs(log_dir: str = "./logs", project: str = "spmm-tpu") -> int:
    """Upload previously written local jsonl logs to wandb
    (reference: wb_logging.py:135-160). Returns the number of runs uploaded."""
    if not (_HAS_WANDB and os.environ.get("WANDB_API_KEY")):
        return 0
    uploaded = 0
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".jsonl"):
            continue
        base = os.path.join(log_dir, name[: -len(".jsonl")])
        config = {}
        if os.path.exists(base + ".config"):
            config = json.load(open(base + ".config"))
        run = wandb.init(project=project, name=name[: -len(".jsonl")], config=config)
        with open(os.path.join(log_dir, name)) as f:
            for line in f:
                run.log(json.loads(line))
        run.finish()
        uploaded += 1
    return uploaded


class span:
    """Wall-clock span recorded into the current iteration:

        with metrics.span("spmm_kernel_time"):
            y = step(x); jax.block_until_ready(y)

    On TPU the fused step makes per-phase attribution inside one program
    impossible (XLA overlaps phases by design); use the runners' profile
    mode (separately jitted phases) or ``jax.profiler`` traces for
    fine-grained breakdowns (SURVEY §5.1)."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self._tic = time.perf_counter()
        return self

    def __exit__(self, *exc):
        log({self.name: time.perf_counter() - self._tic})
        return False
