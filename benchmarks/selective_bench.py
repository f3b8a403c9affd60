"""Selective-encryption sweep (reference benchmark_selection.py /
benchmark_selection_rate.py): encrypt only the first `rate` fraction of
each tensor, aggregate the rest in plaintext; measure ciphertext bytes
and time per rate. Writes results/selective.jsonl (consumed by
benchmarks.figures).

Usage: python -m benchmarks.selective_bench [--model cnn_fedavg]
       [--rates 0.1 0.5 1.0] [--clients 3]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax

from fhe_fed_tpu import CKKS, fhe_fedavg, flatten_params, SelectivePolicy
from fhe_fed_tpu import models
from .common import append_jsonl, results_dir, enable_compile_cache

enable_compile_cache()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="cnn_fedavg")
    ap.add_argument("--rates", nargs="*", type=float,
                    default=[0.1, 0.5, 1.0])
    ap.add_argument("--clients", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--bits", type=int, default=52)
    args = ap.parse_args(argv)

    keydir = os.path.join(results_dir(), "bench_keys")
    os.makedirs(keydir, exist_ok=True)
    helper = CKKS("ckks", args.batch, args.bits, cryptodir=keydir)
    helper.load_or_gen()          # warm: loads the persisted key set

    spec = models.build(args.model)
    rng = np.random.default_rng(0)
    clients = [jax.tree_util.tree_map(
        lambda x: x + 0.01 * (i + 1), spec.params)
        for i in range(args.clients)]
    weights = [1.0 / args.clients] * args.clients
    flat, _ = flatten_params(spec.params)
    n = flat.size

    out = []
    for rate in args.rates:
        policy = SelectivePolicy(rate=rate)
        # measure ciphertext bytes of one client's upload at this rate
        enc_n = policy.enc_count(n)
        # untimed warmup: exclude XLA compile (reference is AOT C++)
        helper.encrypt(np.asarray(flat[:enc_n]))
        fhe_fedavg(helper, clients, weights, policy=policy)
        t0 = time.time()
        blob = helper.encrypt(np.asarray(flat[:enc_n]))
        enc_s = time.time() - t0
        t0 = time.time()
        agg = fhe_fedavg(helper, clients, weights, policy=policy)
        total_s = time.time() - t0
        got, _ = flatten_params(agg)
        want = np.mean(np.stack([flatten_params(c)[0] for c in clients]),
                       axis=0)
        err = float(np.max(np.abs(got - want)))
        r = {"model": args.model, "rate": rate, "params": n,
             "enc_params": enc_n, "ct_bytes": len(blob),
             "plain_bytes": (n - enc_n) * 4,
             "encrypt_s": enc_s, "round_s": total_s, "max_err": err,
             "backend": jax.default_backend()}
        out.append(r)
        append_jsonl("selective.jsonl", r)
        print(f"rate={rate}: enc {enc_n}/{n} params, ct {len(blob):,} B "
              f"(+{(n - enc_n) * 4:,} plain B), round {total_s:.2f}s, "
              f"err {err:.1e}")
    full = next(r for r in out if r["rate"] == 1.0) if 1.0 in args.rates \
        else None
    if full:
        for r in out:
            if r["rate"] < 1.0:
                print(f"  rate {r['rate']}: x"
                      f"{full['ct_bytes'] / r['ct_bytes']:.1f} smaller "
                      f"upload than full encryption")
    return out


if __name__ == "__main__":
    main()
