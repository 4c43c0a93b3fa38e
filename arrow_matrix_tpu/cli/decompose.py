"""``arrow_decompose`` CLI — offline decomposition of a graph matrix.

Flag parity with the reference (reference: scripts/decomposition_main.py:
--width, --dataset_dir/--dataset_name, --format, --directed, --visualize,
--save_input_graph; matlab input is gated on mat73/h5py availability).

    python -m arrow_matrix_tpu.cli.decompose --dataset_dir D --dataset_name g \
        --format mtx --width 10000
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np
from scipy import io as scio, sparse

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io import graphio
from arrow_matrix_tpu.utils.args import str2bool


def load_matrix(path: str, fmt: str, directed: bool) -> sparse.csr_matrix:
    """Load a .mtx / .npz / npy-triplet / matlab matrix as square CSR
    (reference: decomposition_main.py:18-80)."""
    if fmt == "mtx":
        A = sparse.csr_matrix(scio.mmread(path + ".mtx"))
    elif fmt == "npz":
        A = sparse.load_npz(path + ".npz").tocsr()
    elif fmt == "npy":
        indptr = np.load(path + "_indptr.npy")
        indices = np.load(path + "_indices.npy")
        data_path = path + "_data.npy"
        data = (
            np.load(data_path)
            if os.path.exists(data_path)
            else np.ones(indices.size, dtype=np.float32)
        )
        n = indptr.size - 1
        A = sparse.csr_matrix((data, indices, indptr), shape=(n, n))
    elif fmt == "matlab":
        try:
            import mat73

            mat = mat73.loadmat(path + ".mat")
        except ImportError:
            try:
                mat = scio.loadmat(path + ".mat")
            except NotImplementedError as e:
                raise RuntimeError(
                    "matlab v7.3 input needs mat73/h5py (not installed); "
                    "convert to .mtx or .npz"
                ) from e
        key = next(k for k in mat if not k.startswith("__"))
        entry = mat[key]
        A = sparse.csr_matrix(entry["A"] if "A" in getattr(entry, "dtype", {}) else entry)
    else:
        raise ValueError(f"unknown format {fmt}")
    if not directed:
        A = A.maximum(A.T)
    A = sparse.csr_matrix(A, dtype=np.float32)
    A.sum_duplicates()
    A.sort_indices()
    return A


def visualize(decomposition, out_path: str) -> None:
    """Spy-plot of every level (reference: decomposition_main.py:83-106)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; skipping visualization", file=sys.stderr)
        return
    n = len(decomposition)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    axes = np.atleast_1d(axes)
    for ax, ag in zip(axes, decomposition):
        ax.spy(ag.matrix, markersize=0.1)
        ax.set_title(f"width {ag.arrow_width}")
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    print(f"wrote {out_path}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--width", type=int, default=5_000_000)
    p.add_argument("--dataset_dir", type=str, default=".")
    p.add_argument("--dataset_name", type=str, required=True)
    p.add_argument("--format", choices=["matlab", "mtx", "npz", "npy"], default="mtx")
    p.add_argument("--directed", type=str2bool, default=False)
    p.add_argument("--block_diagonal", type=str2bool, default=True)
    p.add_argument("--max_levels", type=int, default=10)
    p.add_argument("--visualize", type=str2bool, default=False)
    p.add_argument("--save_input_graph", type=str2bool, default=False)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--native", type=str2bool, default=True,
                   help="use the C++ decomposition core when available")
    p.add_argument("--convert_only", type=str2bool, default=False,
                   help="save the input as raw CSR npy triplets "
                        "({name}_data/_indices/_indptr.npy) without "
                        "decomposing (reference: julia/arrow/"
                        "convert_to_csr.jl:27-68)")
    args = p.parse_args(argv)

    base = os.path.join(args.dataset_dir, args.dataset_name)
    cache = base + "_graph.pickle"
    if os.path.exists(cache):
        print(f"loading cached graph {cache}")
        A = pickle.load(open(cache, "rb"))
    else:
        A = load_matrix(base, args.format, args.directed)
        if args.save_input_graph:
            pickle.dump(A, open(cache, "wb"))

    if args.convert_only:
        A = A.tocsr()
        A.sum_duplicates()
        np.save(base + "_data.npy", A.data.astype(np.float32))
        np.save(base + "_indices.npy", A.indices.astype(np.int64))
        np.save(base + "_indptr.npy", A.indptr.astype(np.int64))
        print(f"saved raw CSR triplets under {base}_*.npy "
              f"({A.shape[0]} rows, {A.nnz} nnz)")
        return

    width = min(args.width, A.shape[0])
    if A.nnz == 0:
        # A silently-empty load (e.g. a malformed .mtx) would "decompose"
        # and validate trivially downstream; fail loudly instead.
        raise ValueError(
            f"loaded matrix '{args.dataset_name}' has zero nonzeros — "
            "check the input file and --format"
        )
    print(f"decomposing {args.dataset_name}: {A.shape[0]} rows, {A.nnz} nnz, width {width}")
    decomposition = arrow_decomposition(
        A,
        width,
        max_number_of_levels=args.max_levels,
        block_diagonal=args.block_diagonal,
        seed=args.seed,
        native=args.native,
        # Undirected inputs were symmetrized on load; the degree pipeline
        # can then skip its column histograms.
        symmetric=not args.directed,
    )
    print(f"levels: {len(decomposition)}; widths: {[d.arrow_width for d in decomposition]}")
    graphio.save_decomposition_new(
        A,
        decomposition,
        base,
        block_diagonal=args.block_diagonal,
        save_input=args.save_input_graph,
    )
    print(f"saved decomposition under {base}_B_{width}_*")
    if args.visualize:
        visualize(decomposition, base + "_decomposition.png")


if __name__ == "__main__":
    main()
