"""Profile mode: separately jitted phases must agree with the fused step and
emit the reference's span taxonomy (reference: arrow/arrow_mpi.py:196-299,
arrow/common/wb_logging.py)."""

import json
import os

import numpy as np

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert, random_dense
from arrow_matrix_tpu.parallel import ArrowSpmm, block_mesh
from arrow_matrix_tpu.plan import compile_plan


class _Recorder:
    def __init__(self):
        self.records = []

    def log(self, data):
        self.records.append(data)


def test_step_phased_matches_fused():
    n, width, q = 16 * 8 - 3, 16, 8
    A = barabasi_albert(n, 4, seed=0)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=True, seed=1
    )
    plan = compile_plan(decomp, width, q)
    runner = ArrowSpmm(plan, block_mesh(q))
    X = random_dense(n, 8, seed=2)
    x = runner.distribute(X)
    fused = runner.collect(runner.step(x))

    rec = _Recorder()
    phased = runner.collect(runner.step_phased(x, record=rec))
    np.testing.assert_allclose(phased, fused, rtol=1e-5, atol=1e-5)

    names = {k for r in rec.records for k in r}
    assert "spmm_kernel_time" in names
    assert "spmm_x_bcast_time" in names
    assert "spmm_row_reduce" in names
    if len(plan.levels) > 1:
        assert "forward_agg_all_to_all_v" in names
        assert "back_agg_all_to_all_v" in names


def test_step_phased_banded():
    n, width, q = 16 * 8, 16, 8
    A = barabasi_albert(n, 3, seed=5)
    decomp = arrow_decomposition(
        A, width, max_number_of_levels=100, block_diagonal=False, seed=2
    )
    plan = compile_plan(decomp, width, q, block_diagonal=False)
    runner = ArrowSpmm(plan, block_mesh(q))
    X = random_dense(n, 4, seed=3)
    x = runner.distribute(X)
    fused = runner.collect(runner.step(x))
    rec = _Recorder()
    phased = runner.collect(runner.step_phased(x, record=rec))
    np.testing.assert_allclose(phased, fused, rtol=1e-5, atol=1e-5)


def test_bench_profile_emits_spans(tmp_path):
    from arrow_matrix_tpu.bench import bench_spmm

    stats = bench_spmm(
        width=32,
        features=8,
        iterations=2,
        ba_vertices=128,
        ba_neighbors=3,
        n_devices=4,
        log_dir=str(tmp_path),
        profile=True,
    )
    recs = [json.loads(l) for l in open(stats["log_path"])]
    per_iter = [r for r in recs if "spmm_kernel_time" in r]
    assert len(per_iter) >= 2
    assert all("spmm_x_bcast_time" in r and "spmm_row_reduce" in r for r in per_iter)
    assert "comm_volume" in stats
