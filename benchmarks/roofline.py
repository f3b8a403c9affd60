"""Roofline analysis of the FedAvg hot path (VERDICT round-1 item 2).

Determines whether the fused weighted-sum aggregation kernel (the op
replacing the reference's serial EvalMult+EvalAdd loop, ckks.cpp:264-320)
is HBM-bandwidth-bound or int-compute-bound on the chip, by measuring:

  1. an f32 streaming triad at the same byte volume  -> achieved HBM BW
     ceiling (the speed-of-light reference for any elementwise pass);
  2. raw u32 elementwise multiply throughput         -> int-mul cost;
  3. modular add only (the no-multiply floor);
  4. the production weighted-sum (per-client Shoup mult + add chain);
  5. an equal-weights variant (modsum then ONE scalar mult);
  6. a deferred-reduction variant (64-bit accumulate, one Barrett).

Prints one line per measurement and appends results/roofline.jsonl.
Run on the real TPU: python -m benchmarks.roofline
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fhe_fed_tpu.rns import modops                       # noqa: E402
from fhe_fed_tpu.ckks import params as P                 # noqa: E402
from fhe_fed_tpu.ckks import encoding as E               # noqa: E402
from fhe_fed_tpu.ckks import ops as O                    # noqa: E402
from .common import append_jsonl                          # noqa: E402

_U32 = jnp.uint32


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=256,
                    help="small size; the large size is 4x this")
    ap.add_argument("--clients", type=int, default=3)
    args = ap.parse_args(argv)

    params = P.make_params(batch=4096, scale_bits=52, mult_depth=1)
    ctx = P.make_context(params)
    chain = params.chain_len
    n = params.ring_dim
    K = args.clients
    # Dispatch through the remote-TPU tunnel costs a large constant RTT
    # (~tens of ms), so single-call wall-clock is useless for kernel time.
    # Instead: time the SAME op at two sizes and take the slope — the RTT
    # and any other size-independent overhead cancel exactly.
    c_small, c_big = args.chunks, args.chunks * 4
    rng = np.random.default_rng(0)

    def make_x(chunks):
        shape = (K, chunks, 2, chain, n)
        return jnp.asarray(rng.integers(0, params.moduli[0], size=shape,
                                        dtype=np.uint64).astype(np.uint32))

    x_s, x_b = make_x(c_small), make_x(c_big)
    bpc = 2 * chain * n * 4                           # bytes per chunk-slot
    print(f"backend={jax.default_backend()} K={K} chunks={c_small}/{c_big} "
          f"bytes/chunk={bpc} (x{K} read + x1 write)")
    results = []

    def emit(name, fn, rw_factor, note=""):
        """rw_factor: bytes moved per chunk / bpc (e.g. K+1 for K reads +
        1 write)."""
        t_s = timeit(fn, x_s)
        t_b = timeit(fn, x_b)
        # Validity guard: a constant-folded / cached measurement produces
        # t_big <= t_small (round 2 shipped one such garbage row). Refuse to
        # log non-physical numbers.
        if not (t_b > t_s > 0):
            print(f"{name:28s} INVALID measurement "
                  f"(t_small={t_s*1e3:.3f} ms, t_big={t_b*1e3:.3f} ms) — "
                  "timed fn was constant-folded or cached; row NOT emitted")
            return
        slope = (t_b - t_s) / (c_big - c_small)       # s per chunk
        bytes_per_chunk = rw_factor * bpc
        gbs = bytes_per_chunk / slope / 1e9
        ms204 = slope * 204 * 1e3                     # headline CNN shape
        r = {"op": name, "ms_per_204chunks": round(ms204, 3),
             "ns_per_chunk": round(slope * 1e9, 1),
             "gbs_effective": round(gbs, 1),
             "t_small_ms": round(t_s * 1e3, 3),
             "t_big_ms": round(t_b * 1e3, 3),
             "backend": jax.default_backend(), "note": note}
        results.append(r)
        append_jsonl("roofline.jsonl", r)
        print(f"{name:28s} {ms204:7.3f} ms@204  {gbs:6.0f} GB/s  {note}")

    # 1. f32 streaming sum over clients: K reads + 1 write — the
    # elementwise speed of light for the agg's access pattern.
    emit("f32_sum_over_clients",
         jax.jit(lambda a: jnp.sum(
             jax.lax.bitcast_convert_type(a, jnp.float32), axis=0)),
         K + 1, "speed of light")

    # 2. raw u32 elementwise multiply (low 32), full volume.
    w32 = jnp.asarray(rng.integers(1, 1 << 31, size=(), dtype=np.uint64)
                      .astype(np.uint32))
    emit("u32_mul_scalar", jax.jit(lambda a: a * w32),
         2 * K, "int-mul throughput probe")

    # 3. modular add over the client axis only (no multiplies).
    qb = ctx.q[:chain, None]

    def addmod_chain(a):
        acc = a[0]
        for i in range(1, K):
            acc = modops.add_mod(acc, a[i], qb)
        return acc
    emit("add_mod_chain", jax.jit(addmod_chain), K + 1, "no-multiply floor")

    # 4. the production weighted sum (general weights).
    ds = float(params.moduli[chain - 1])
    ws = [1.0 / K] * K
    res_l, shoup_l = zip(*(E.encode_scalar(params.moduli[:chain], w, ds)
                           for w in ws))
    wr = jnp.asarray(np.stack(res_l))
    wsh = jnp.asarray(np.stack(shoup_l))
    emit("weighted_sum_general",
         jax.jit(lambda s: O._weighted_sum_impl(ctx, s, wr, wsh)),
         K + 1, f"{K} shoup mults + {K-1} mod-adds per elem")

    # 5. equal-weights: modular sum first, ONE scalar mult after.
    r1, s1 = E.encode_scalar(params.moduli[:chain], 1.0 / K, ds)
    r1 = jnp.asarray(r1)
    s1 = jnp.asarray(s1)

    def eq_ws(a):
        acc = addmod_chain(a)
        return modops.mul_mod_shoup(acc, r1[:, None], s1[:, None], qb)
    emit("weighted_sum_equal", jax.jit(eq_ws), K + 1,
         "sum then one shoup mult")

    # 6. deferred reduction: accumulate x*w as 64-bit (hi, lo) pairs over
    # clients, reduce once with Barrett at the end (timing probe; the
    # final reduction is approximate for K*q**2 > 2**62).
    mu = ctx.mu[:chain, None]

    def deferred(a):
        hi_acc = jnp.zeros(a.shape[1:], dtype=_U32)
        lo_acc = jnp.zeros(a.shape[1:], dtype=_U32)
        for i in range(K):
            hi, lo = modops.mul_wide(a[i], wr[i][:, None])
            s = lo_acc + lo
            carry = (s < lo_acc).astype(_U32)
            lo_acc = s
            hi_acc = hi_acc + hi + carry
        a30 = (hi_acc << 2) | (lo_acc >> 30)
        k = modops.mul_hi(a30, mu)
        r = lo_acc - k * qb
        r = jnp.where(r >= qb, r - qb, r)
        r = jnp.where(r >= qb, r - qb, r)
        return jnp.where(r >= qb, r - qb, r)
    emit("weighted_sum_deferred", jax.jit(deferred), K + 1,
         "64-bit accumulate, one Barrett")

    # 7. modsum_clients 16-bit split (the large-K path), at this K.
    def split_sum(a):
        terms = modops.mul_mod_shoup(
            a, wr[:, None, None, :, None], wsh[:, None, None, :, None], qb)
        return O.modsum_clients(terms, qb, ctx.pow32[:chain, None],
                                ctx.pow32_shoup[:chain, None])
    emit("weighted_sum_split16", jax.jit(split_sum), K + 1,
         "16-bit split reduction path")
    return results


if __name__ == "__main__":
    main()
