"""Emit the BASELINE.md roofline table: for every basket config, HBM
bytes/step from the compiled plan (plan/roofline.py) divided by the
MEASURED step time, against the v5e HBM peak (VERDICT r4 item 2).

Reads measured step times from a bench JSON (driver ``BENCH_r*.json`` or a
``bench.py`` output line) and rebuilds each config's plan exactly as
bench.py does — including the tuner for the planar rows — so the byte
accounting matches the program that was timed.

Usage: python tools/roofline_table.py <bench.json> [markdown]
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from bench import BASKET, build_graph  # noqa: E402


def main():
    src = sys.argv[1]
    with open(src) as fh:
        text = fh.read()
    line = [l for l in text.splitlines() if l.startswith("{")][-1]
    bench = json.loads(line)
    configs = bench.get("configs", bench)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from arrow_matrix_tpu.decomposition import arrow_decomposition
    from arrow_matrix_tpu.parallel.local import compile_single_chip
    from arrow_matrix_tpu.plan.roofline import roofline_report
    from arrow_matrix_tpu.plan.tune import tune_single_chip

    rows = []
    for name, graph, vertices, k, state_dtype in BASKET:
        meas = configs.get(name, {})
        if "step_ms" not in meas:
            continue
        A, width = build_graph(graph, vertices, 4, 25_000)
        sdt = jnp.bfloat16 if state_dtype == "bfloat16" else None
        if graph == "grid":
            tr = tune_single_chip(A, k, state_dtype=sdt, base_width=width)
            plan = tr.plan
        else:
            decomp = arrow_decomposition(
                A, width, max_number_of_levels=100, block_diagonal=True,
                seed=2,
            )
            plan, _ = compile_single_chip(decomp, width, k_hint=k,
                                          state_dtype=sdt)
        if not hasattr(plan, "levels"):
            continue  # region plans have no roofline model
        rep = roofline_report(plan, k, state_dtype,
                              measured_ms=meas["step_ms"])
        b = rep["bytes_per_step"]
        lvl = b["levels"][0]
        rows.append({
            "config": name,
            "fmt": lvl["fmt"],
            "bytes_mb": b["total"] / 1e6,
            "measured_ms": meas["step_ms"],
            "achieved_gbps": rep["achieved_gbps"],
            "fraction": rep["fraction_of_peak"],
            "components_mb": {
                kk: round(vv / 1e6, 1)
                for kk, vv in lvl.items()
                if isinstance(vv, int) and kk != "total"
            },
        })
        print(json.dumps(rows[-1]), flush=True)

    if len(sys.argv) > 2 and sys.argv[2] == "markdown":
        print("\n| Config | fmt | bytes/step | measured | achieved GB/s | % of 819 GB/s peak |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['config']} | {r['fmt']} | {r['bytes_mb']:.0f} MB "
                f"| {r['measured_ms']:.2f} ms | {r['achieved_gbps']:.0f} "
                f"| {100 * r['fraction']:.0f}% |"
            )
    print(json.dumps({"metric": "roofline_table", "rows": rows}))


if __name__ == "__main__":
    main()
