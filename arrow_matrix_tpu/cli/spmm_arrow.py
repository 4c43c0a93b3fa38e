"""``spmm_arrow`` CLI — distributed iterated arrow SpMM benchmark.

Flag parity with the reference (reference: scripts/spmm_arrow_main.py:10-29:
--path, --width, --features, --blocked, --iterations, --ba_neighbors, --npy;
--device/--slim/--ranksperside are MPI/GPU artifacts replaced by --devices —
on TPU the slim layout with one device per block row subsumes the fat layout,
see arrow_matrix_tpu/parallel/arrow_spmm.py).
"""

from __future__ import annotations

import argparse
import json

from arrow_matrix_tpu.bench import bench_spmm
from arrow_matrix_tpu.utils.args import str2bool


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", type=str, default=None,
                   help="decomposition path prefix; generates a Barabási graph if omitted")
    p.add_argument("--width", type=int, default=10_000)
    p.add_argument("--features", type=int, default=16)
    p.add_argument("--blocked", type=str2bool, default=True,
                   help="block-diagonal decomposition (vs banded)")
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--devices", type=int, default=None,
                   help="block-axis mesh size (default: all local devices)")
    p.add_argument("--ba_vertices", type=int, default=100_000)
    p.add_argument("--ba_neighbors", type=int, default=4)
    p.add_argument("--npy", type=str2bool, default=True)
    p.add_argument("--mmap", type=str2bool, default=False)
    p.add_argument("--profile", type=str2bool, default=False,
                   help="separately jitted phases with per-phase span logging")
    p.add_argument("--mode", choices=["auto", "local", "blocked"],
                   default="auto",
                   help="single-chip executor: merged-levels 'local' vs the "
                        "distributed program's per-block 'blocked' structure")
    p.add_argument("--state_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="multi-device iteration-state dtype; bfloat16 halves "
                        "per-device state HBM and routing wire bytes")
    p.add_argument("--row_split", type=int, default=1,
                   help="fat layout: split every block's panels over this "
                        "many extra devices (devices*row_split total) — the "
                        "TPU mapping of the reference's --ranksperside/"
                        "--slim knobs (scripts/spmm_arrow_main.py:10-29); "
                        "1 = slim")
    p.add_argument("--routing", choices=["auto", "all_to_all", "rounds"],
                   default="auto",
                   help="inter-level exchange: padded all_to_all, partial-"
                        "permutation ppermute rounds (bytes only on real "
                        "device pairs), or auto (rounds when they cut the "
                        "padded send volume >= 10%%) — the TPU answer to "
                        "the reference's ragged Ialltoallv "
                        "(arrow/arrow_dec_mpi.py:462-505)")
    p.add_argument("--fresh_features", type=str2bool, default=True,
                   help="re-randomize features before every timed iteration "
                        "(the reference's benchmark contract, "
                        "arrow/arrow_bench.py:113-117); --timing fori "
                        "iterates the state instead and ignores this")
    p.add_argument("--validate", type=str2bool, default=False,
                   help="full gather-and-compare of one device product vs "
                        "the host compute_spmm golden before timing")
    p.add_argument("--log_dir", type=str, default="./logs")
    p.add_argument("--timing", choices=["per_step", "fori"],
                   default="per_step",
                   help="per_step mirrors the reference's per-iteration "
                        "spans; fori differences a 1- vs N-iteration "
                        "fori_loop (single-chip), separating the device "
                        "step from fixed per-dispatch cost")
    args = p.parse_args(argv)

    stats = bench_spmm(
        path=args.path,
        width=args.width,
        features=args.features,
        iterations=args.iterations,
        block_diagonal=args.blocked,
        n_devices=args.devices,
        ba_vertices=args.ba_vertices,
        ba_neighbors=args.ba_neighbors,
        use_npy=args.npy,
        use_mmap=args.mmap,
        log_dir=args.log_dir,
        profile=args.profile,
        mode=args.mode,
        state_dtype=args.state_dtype,
        validate=args.validate,
        timing=args.timing,
        row_split=args.row_split,
        fresh_features=args.fresh_features,
        routing=args.routing,
    )
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
