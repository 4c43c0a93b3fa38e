"""Smoke tests for the judged entry points: bench.py (one JSON line) and
__graft_entry__ (single-chip compile check + multi-chip dryrun is covered by
the driver; here we only guard importability and the entry contract)."""

import io
import json
import os
import runpy
import sys
from contextlib import redirect_stdout

import numpy as np

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_main_emits_one_json_line(monkeypatch):
    monkeypatch.setattr(
        sys, "argv",
        ["bench.py", "--graph", "ba", "--vertices", "2000", "--width", "300",
         "--iterations", "3", "--mode", "both", "--comm-volume", "4"],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        runpy.run_path(os.path.join(REPO, "bench.py"), run_name="__main__")
    lines = [l for l in buf.getvalue().strip().splitlines() if l.strip()]
    out = json.loads(lines[-1])
    assert out["metric"] == "arrow_spmm_nnz_per_s_per_chip"
    assert out["value"] > 0 and out["unit"] == "nnz/s"
    assert out["executor"] == "region" or out["executor"].startswith("merged")
    assert out["arrow_spmm_distributed_nnz_per_s"] > 0
    cv = out["comm_volume"]
    # qv bumps up to ceil(n/width) when 4 devices can't cover the rows.
    assert cv["n_devices"] == 7
    assert cv["arrow_bytes_per_device"] > 0
    assert cv["spmm_15d_bytes_per_device"] > 0


def test_bench_basket_mode(monkeypatch):
    """Default (no --graph) mode runs the config basket and reports each
    config's throughput + executor plus the headline and comm volumes."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.setattr(
        bench, "BASKET",
        [("ba-200k", "ba", 2000, 16, "float32"),
         ("grid-202k", "grid", 2500, 16, "float32"),
         ("ba-200k-bf16", "ba", 2000, 16, "bfloat16")],
    )
    monkeypatch.setattr(
        sys, "argv",
        ["bench.py", "--iterations", "3", "--width", "300",
         "--comm-volume", "4", "--skip", "operator"],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = [l for l in buf.getvalue().strip().splitlines() if l.strip()]
    assert len(lines) == 1
    out = json.loads(lines[-1])
    assert out["metric"] == "arrow_spmm_nnz_per_s_per_chip"
    assert out["value"] > 0 and out["vs_baseline"] > 0
    assert set(out["configs"]) == {"ba-200k", "grid-202k", "ba-200k-bf16"}
    for cfg in out["configs"].values():
        assert cfg["nnz_per_s"] > 0 and "executor" in cfg
    assert out["configs"]["ba-200k-bf16"]["state_dtype"] == "bfloat16"
    assert out["arrow_spmm_distributed_nnz_per_s"] > 0
    assert set(out["comm_volume"]) == {"ba-200k", "grid-202k"}
    for cv in out["comm_volume"].values():
        assert cv["arrow_bytes_per_device"] > 0


def test_graft_entry_contract():
    sys.path.insert(0, REPO)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(REPO, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    y = jax.jit(fn)(*args)
    assert np.asarray(y).ndim == 2
