"""Train a zoo model on the synthetic task and cache the weights.

Gives the param sweep a *trained* model so its Acc-Delta column measures
real test accuracy of FHE- vs plaintext-aggregated weights, mirroring the
reference's FashionMNIST criterion (benchmark_crypto.py:21-49,246-250)
instead of argmax disagreement on random inputs from an untrained net.

Usage: python -m benchmarks.train_synth [--model mlp] [--steps 600]
Cached at results/trained_<model>.npz; training is deterministic.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from fhe_fed_tpu import models, flatten_params, unflatten_params
from fhe_fed_tpu.data import make_synth_images
from .common import results_dir

TRAIN_N, TEST_N = 8192, 4096
BATCH = 256


def evaluate(apply, params, x, y, batch: int = 1024) -> float:
    correct = 0
    for i in range(0, x.shape[0], batch):
        logits = apply(params, jnp.asarray(x[i:i + batch]))
        correct += int((np.asarray(jnp.argmax(logits, -1))
                        == y[i:i + batch]).sum())
    return correct / x.shape[0]


def trained_model(model_name: str, steps: int = 600, lr: float = 1e-3,
                  cache: bool = True):
    """Returns (spec, trained_params, test_acc). Cached on disk."""
    spec = models.build(model_name)
    path = os.path.join(results_dir(), f"trained_{model_name}.npz")
    x_te, y_te = make_synth_images(TEST_N, seed=99)
    if cache and os.path.exists(path):
        with np.load(path) as z:
            flat = z["flat"]
        _, tree = flatten_params(spec.params)
        params = unflatten_params(flat.astype(np.float32), tree)
        return spec, params, evaluate(spec.apply, params, x_te, y_te)

    x_tr, y_tr = make_synth_images(TRAIN_N, seed=7)
    opt = optax.adam(lr)
    params = spec.params
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = spec.apply(p, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n_batches = TRAIN_N // BATCH
    for s in range(steps):
        i = (s % n_batches) * BATCH
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x_tr[i:i + BATCH]),
            jnp.asarray(y_tr[i:i + BATCH]))
    acc = evaluate(spec.apply, params, x_te, y_te)
    if cache:
        flat, _ = flatten_params(params)
        os.makedirs(results_dir(), exist_ok=True)
        np.savez_compressed(path, flat=np.asarray(flat))
    return spec, params, acc


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mlp")
    ap.add_argument("--steps", type=int, default=600)
    args = ap.parse_args(argv)
    spec, params, acc = trained_model(args.model, steps=args.steps)
    print(f"{args.model}: test_acc={acc:.4f} "
          f"(params={flatten_params(params)[0].size})")


if __name__ == "__main__":
    main()
