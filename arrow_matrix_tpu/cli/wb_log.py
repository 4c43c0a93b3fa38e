"""``wb_log`` CLI — upload locally buffered benchmark logs
(reference: scripts/wb_log_main.py)."""

from __future__ import annotations

import argparse

from arrow_matrix_tpu.utils import metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log_dir", type=str, default="./logs")
    p.add_argument("--project", type=str, default="spmm-tpu")
    args = p.parse_args(argv)
    n = metrics.log_local_runs(args.log_dir, args.project)
    print(f"uploaded {n} runs" if n else "nothing uploaded (no wandb or no logs)")


if __name__ == "__main__":
    main()
