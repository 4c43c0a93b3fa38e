"""End-to-end GCN training through the differentiable arrow operator.

The propagation ``Â H`` runs as the compiled arrow SpMM with a custom VJP
whose backward pass is the *transpose* arrow plan (gather-only — autodiff's
default transpose-of-gather would be a TPU-hostile scatter). The dense layer
weights and the nonlinearity are ordinary JAX, so ``jax.grad`` flows through
the whole model and optax trains it — a capability the MPI reference has no
analogue for (its SpMM is inference-only).

Model: 2-layer GCN  ``logits = Â relu(Â X W0) W1``  on a synthetic
community graph with planted labels; full-batch softmax cross-entropy.

    python examples/gcn_train.py --vertices 20000 --features 32 --steps 30
"""

from __future__ import annotations

import argparse

import numpy as np
from scipy import sparse

import jax
import jax.numpy as jnp

from arrow_matrix_tpu.decomposition import arrow_decomposition
from arrow_matrix_tpu.io.generate import barabasi_albert
from arrow_matrix_tpu.parallel.operator import ArrowOperator


def normalized_adjacency(A: sparse.csr_matrix) -> sparse.csr_matrix:
    n = A.shape[0]
    A_hat = (A + sparse.eye(n, format="csr", dtype=np.float32)).tocsr()
    deg = np.asarray(A_hat.sum(axis=1)).ravel()
    d = np.divide(1.0, np.sqrt(deg), out=np.zeros_like(deg), where=deg > 0)
    D = sparse.diags(d.astype(np.float32))
    return (D @ A_hat @ D).tocsr().astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vertices", type=int, default=20_000)
    p.add_argument("--features", type=int, default=32)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--lr", type=float, default=0.5)
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--state_dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="propagation-state dtype: bfloat16 halves the "
                        "activation bytes through both Â multiplies (the "
                        "windowed family measured 2x from this; gradients "
                        "ride the same dtype through the custom VJP)")
    args = p.parse_args(argv)

    rng = np.random.default_rng(0)
    n, k, c = args.vertices, args.features, args.classes
    A = barabasi_albert(n, 4, seed=1)
    M = normalized_adjacency(A)
    width = args.width or max(1, n // 8)

    # Planted labels: class = noisy linear readout of smoothed features, so
    # the propagation actually carries signal the model must use.
    X = rng.standard_normal((n, k), dtype=np.float32)
    smooth = M @ (M @ X)
    w_true = rng.standard_normal((k, c), dtype=np.float32)
    y = np.argmax(smooth @ w_true + 0.1 * rng.standard_normal((n, c)), axis=1)

    decomp = arrow_decomposition(
        M, width, max_number_of_levels=20, block_diagonal=True, seed=0
    )
    op = ArrowOperator(decomp, width, n_devices=args.devices, k_hint=k)
    state_dtype = jnp.dtype(args.state_dtype)
    xs = op.distribute(X).astype(state_dtype)
    # Labels live in the operator's state layout: distribute the one-hot
    # matrix and a validity mask (padding rows come back zero).
    onehot = np.zeros((n, c), dtype=np.float32)
    onehot[np.arange(n), y] = 1.0
    ys = op.distribute(onehot)
    mask = op.distribute(np.ones((n, 1), dtype=np.float32))

    params = {
        "w0": jnp.asarray(rng.standard_normal((k, args.hidden), dtype=np.float32)
                          * (1.0 / np.sqrt(k))),
        "w1": jnp.asarray(rng.standard_normal((args.hidden, c), dtype=np.float32)
                          * (1.0 / np.sqrt(args.hidden))),
    }

    def loss_fn(params):
        h = jax.nn.relu(op.apply((xs @ params["w0"]).astype(state_dtype)))
        logits = op.apply(h).astype(jnp.float32) @ params["w1"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.sum(ys * logp, axis=-1, keepdims=True) * mask
        return -jnp.sum(ll) / jnp.sum(mask)

    try:
        import optax

        opt = optax.adam(args.lr * 0.02)
        opt_state = opt.init(params)

        @jax.jit
        def train_step(params, opt_state):
            l, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, l
    except ImportError:  # plain SGD fallback
        @jax.jit
        def train_step(params, opt_state):
            l, g = jax.value_and_grad(loss_fn)(params)
            params = jax.tree.map(lambda p, gg: p - args.lr * gg, params, g)
            return params, opt_state, l

        opt_state = None

    losses = []
    for step in range(args.steps):
        params, opt_state, l = train_step(params, opt_state)
        losses.append(float(l))
        if step % 5 == 0 or step == args.steps - 1:
            print(f"step {step:3d}  loss {float(l):.4f}", flush=True)

    h = jax.nn.relu(op.apply((xs @ params["w0"]).astype(state_dtype)))
    logits = op.collect(op.apply(h).astype(jnp.float32) @ params["w1"])
    acc = float((np.argmax(logits, axis=1) == y).mean())
    print(f"final loss {losses[-1]:.4f} (from {losses[0]:.4f}), "
          f"train accuracy {acc:.3f}")
    assert losses[-1] < losses[0], "training did not reduce the loss"
    return losses, acc


if __name__ == "__main__":
    main()
