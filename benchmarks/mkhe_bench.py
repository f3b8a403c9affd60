"""Single-key vs threshold CKKS timing — `mk-test` CLI parity
(reference code/mkhe/mkhe.cpp:52-94: `mk-test <model_size> <client_size>`
times RunSingleKeyCKKS then RunCKKS with N-party threshold keys).

Usage: python -m benchmarks.mkhe_bench <model_size> <client_size>
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from fhe_fed_tpu.ckks import params as P
from fhe_fed_tpu.ckks import keys as K
from fhe_fed_tpu.ckks import keyswitch as KS
from fhe_fed_tpu.ckks import ops as O
from fhe_fed_tpu.ckks import threshold as T
from .common import append_jsonl, enable_compile_cache

enable_compile_cache()


def _chunk(vals: np.ndarray, cap: int, n: int) -> jnp.ndarray:
    chunks = -(-vals.size // cap)
    buf = np.zeros((chunks, n), dtype=np.float32)
    pay = buf[:, :cap].reshape(-1)
    pay[:vals.size] = vals
    buf[:, :cap] = pay.reshape(chunks, cap)
    return jnp.asarray(buf)


def run_single_key(model_size: int, ctx, batch: int) -> dict:
    """RunSingleKeyCKKS (mkhe.cpp:96-185): keygen, encrypt, x0.5, +, dec."""
    t0 = time.time()
    sk, pk = K.keygen(ctx, seed=0)
    t_keygen = time.time() - t0
    rng = np.random.default_rng(0)
    v = rng.standard_normal(model_size).astype(np.float32)
    vals = _chunk(v, batch, ctx.ring_dim)

    t0 = time.time()
    ct = O.encrypt(ctx, pk, vals, jax.random.key(1))
    jax.block_until_ready(ct.data)
    t_enc = time.time() - t0

    t0 = time.time()
    h = O.mul_scalar(ctx, ct, 0.5)
    h = O.add(ctx, h, h)
    jax.block_until_ready(h.data)
    t_eval = time.time() - t0

    t0 = time.time()
    out = np.asarray(O.decrypt(ctx, sk, h))
    t_dec = time.time() - t0
    err = np.abs(out[:, :batch].reshape(-1)[:model_size] - v).max()
    return {"mode": "single", "keygen": t_keygen, "encrypt": t_enc,
            "eval": t_eval, "decrypt": t_dec, "max_err": float(err),
            "log2_precision": round(O.log2_precision(
                out[:, :batch].reshape(-1)[:model_size], v), 2)}


def run_threshold(model_size: int, client_size: int, ctx,
                  batch: int) -> dict:
    """RunCKKS (mkhe.cpp:188-465): chained keygen, joint encrypt, eval,
    per-party partial decrypt + fusion."""
    t0 = time.time()
    sks, pk = T.multiparty_keygen(ctx, client_size, seed=1)
    t_keygen = time.time() - t0

    # joint eval-mult key: the two-round MultiKeySwitchGen /
    # MultiMultEvalKey / MultiAddEvalMultKeys ceremony (mkhe.cpp:281-317)
    t0 = time.time()
    rlk = T.multiparty_relin_key(ctx, sks, common_seed=2, seed=1)
    jax.block_until_ready(rlk.b)
    t_evalkey = time.time() - t0

    rng = np.random.default_rng(1)
    v = rng.standard_normal(model_size).astype(np.float32)
    vals = _chunk(v, batch, ctx.ring_dim)

    t0 = time.time()
    ct = O.encrypt(ctx, pk, vals, jax.random.key(2))
    jax.block_until_ready(ct.data)
    t_enc = time.time() - t0

    t0 = time.time()
    h = O.mul_scalar(ctx, ct, 0.5)
    h = O.add(ctx, h, h)
    jax.block_until_ready(h.data)
    t_eval = time.time() - t0

    # ct x ct + relinearize under the JOINT key (exceeds the reference's
    # scalar-only circuit; proves the joint relin key at these params)
    t0 = time.time()
    sq = O.rescale(ctx, KS.mul_ct(ctx, ct, ct, rlk))
    jax.block_until_ready(sq.data)
    t_mul_relin = time.time() - t0

    t0 = time.time()
    parts = [T.partial_decrypt_lead(ctx, sks[0], h, jax.random.key(10))]
    parts += [T.partial_decrypt_main(ctx, sk, h, jax.random.key(11 + i))
              for i, sk in enumerate(sks[1:])]
    out = np.asarray(T.fuse_decrypt(ctx, parts, h.scale))
    t_dec = time.time() - t0
    err = np.abs(out[:, :batch].reshape(-1)[:model_size] - v).max()
    return {"mode": "threshold", "parties": client_size,
            "keygen": t_keygen, "joint_evalkey": t_evalkey,
            "encrypt": t_enc, "eval": t_eval,
            "mul_relin_joint": t_mul_relin,
            "decrypt": t_dec, "max_err": float(err),
            "log2_precision": round(O.log2_precision(
                out[:, :batch].reshape(-1)[:model_size], v), 2)}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    model_size = int(argv[0]) if argv else 100_000
    client_size = int(argv[1]) if len(argv) > 1 else 3
    batch = 4096
    # depth 2 / ~51-bit scale mirror of genCryptoContextCKKS at
    # mkhe.cpp:204-215
    params = P.make_params(batch=batch, scale_bits=51, mult_depth=2)
    ctx = P.make_context(params)

    # Warmup pass compiles everything (untimed — the reference's mkhe is AOT
    # C++, mkhe.cpp:64-90 chrono around already-compiled calls), then the
    # measured pass runs with warm executables.
    run_single_key(model_size, ctx, batch)
    run_threshold(model_size, client_size, ctx, batch)
    single = run_single_key(model_size, ctx, batch)
    multi = run_threshold(model_size, client_size, ctx, batch)
    for r in (single, multi):
        r.update(model_size=model_size, ring_dim=params.ring_dim,
                 backend=jax.default_backend())
        append_jsonl("mkhe_bench.jsonl", r)
        print(r)
    return single, multi


if __name__ == "__main__":
    main()
