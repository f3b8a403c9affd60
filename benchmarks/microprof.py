"""Micro-profiler: decompose the headline bench into dispatch latency vs
device compute, and per-op costs (NTT, sampling, encode, modsum).

Through the remote-TPU tunnel one dispatch+sync round-trip is ~25 ms, so a
single-call timer cannot resolve device times below the RTT (every op
"measures" ~25 ms). Each op is therefore timed as a PIPELINED block: ITERS
dispatches enqueued back-to-back, ONE device sync, minus a same-shape
empty-block baseline — the same amortization bench.py uses for the
headline phases. On a local TPU VM the single-shot and pipelined numbers
converge.

Run on the real TPU: `python -m benchmarks.microprof`.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 32           # dispatches per timed block (one sync per block)


def timeit(fn, *args, reps=3, iters=ITERS):
    """min over reps of [enqueue `iters` calls, sync once] / iters.

    The per-iter value still contains 1/iters of one tunnel RTT (~0.8 ms at
    iters=32); the caller subtracts the printed dispatch_roundtrip/ITERS
    floor when comparing kernels. Calls are enqueued on independent inputs,
    so XLA may overlap them — matching how bench.py's phases execute."""
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def main():
    from fhe_fed_tpu.ckks import params as P, keys as K, ops as O
    from fhe_fed_tpu.ckks import encoding as E
    from fhe_fed_tpu.ntt import ntt as ntt_mod

    params = P.make_params(batch=4096, scale_bits=52, mult_depth=1)
    ctx = P.make_context(params)
    sk, pk = K.keygen(ctx, seed=0)
    n = params.ring_dim
    chain = params.chain_len
    chunks = 407
    print(f"ring_dim={n} chain={chain} chunks={chunks} "
          f"backend={jax.default_backend()}")

    # 1. Pure dispatch round-trip on a tiny op: single-shot = one tunnel
    # RTT; pipelined = the per-iter floor every number below still carries.
    tiny = jnp.zeros((8, 128), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1)
    rtt = timeit(f_tiny, tiny, iters=1)
    floor = timeit(f_tiny, tiny)
    print(f"dispatch_roundtrip_tiny: {rtt*1e3:.2f} ms "
          f"(pipelined floor {floor*1e3:.3f} ms/iter at {ITERS}x)")

    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.random((chunks, n)).astype(np.float32))

    # 2. NTT alone on an encrypt-sized batch (chunks, chain, N).
    x = jnp.asarray(rng.integers(0, params.moduli[0],
                                 size=(chunks, chain, n),
                                 dtype=np.uint64).astype(np.uint32))
    tb = ctx.tables.slice_limbs(0, chain)
    f_ntt = jax.jit(lambda x: ntt_mod.ntt(x, tb))
    t = timeit(f_ntt, x)
    gb = x.size * 4 * 2 * 13 / 1e9
    print(f"ntt (chunks,{chain},{n}): {t*1e3:.2f} ms "
          f"({gb/t:.0f} GB/s stage-traffic equiv)")

    f_intt = jax.jit(lambda x: ntt_mod.intt(x, tb))
    print(f"intt same: {timeit(f_intt, x)*1e3:.2f} ms")

    # 3. Encode alone.
    f_enc = jax.jit(lambda v: E.encode_coeff(ctx, v, params.scale))
    print(f"encode_coeff: {timeit(f_enc, vals)*1e3:.2f} ms")

    # 4. Sampling alone (u + e0,e1 as in encrypt).
    from fhe_fed_tpu.ckks.keys import ternary_coeffs, cbd_coeffs, lift_signed
    q = ctx.q[:chain]

    def samp(key):
        k_u, k_e0, k_e1 = jax.random.split(key, 3)
        u = lift_signed(ternary_coeffs(k_u, (chunks, n)), q)
        e0 = cbd_coeffs(k_e0, (chunks, n))
        e1 = cbd_coeffs(k_e1, (chunks, n))
        return u, e0, e1
    f_samp = jax.jit(samp)
    print(f"sampling: {timeit(f_samp, jax.random.key(0))*1e3:.2f} ms")

    # 5. Full encrypt, one client.
    f_full = jax.jit(lambda v, k: O._encrypt_impl(ctx, pk, v, k, params.scale))
    print(f"encrypt one client: {timeit(f_full, vals, jax.random.key(1))*1e3:.2f} ms")

    # 6. Weighted sum of 3.
    ct = O.encrypt(ctx, pk, vals, jax.random.key(2))
    stacked = jnp.stack([ct.data] * 3)
    ds = float(params.moduli[chain - 1])
    res_l, shoup_l = zip(*(E.encode_scalar(params.moduli[:chain], w, ds)
                           for w in [0.5, 0.2, 0.3]))
    wr = jnp.asarray(np.stack(res_l))
    ws = jnp.asarray(np.stack(shoup_l))
    f_ws = jax.jit(lambda s, a, b: O._weighted_sum_impl(ctx, s, a, b))
    t = timeit(f_ws, stacked, wr, ws)
    print(f"weighted_sum 3 clients: {t*1e3:.2f} ms "
          f"({stacked.size*4/t/1e9:.0f} GB/s read)")

    # 7. Decrypt.
    f_dec = jax.jit(lambda d: O._decrypt_impl(ctx, sk, d, ct.scale * ds))
    agg = f_ws(stacked, wr, ws)
    print(f"decrypt: {timeit(f_dec, agg)*1e3:.2f} ms")

    # 8. Symmetric-encrypt breakdown at the headline shape (204 chunks):
    # where the enc phase's device time actually goes after the MXU NTT.
    hchunks = 204
    hv = jnp.asarray(rng.random((hchunks, n)).astype(np.float32))
    f_enc_h = jax.jit(lambda v: E.encode_coeff(ctx, v, params.scale))
    print(f"[sym] encode ({hchunks},{chain},{n}): "
          f"{timeit(f_enc_h, hv)*1e3:.2f} ms")
    f_unif = jax.jit(lambda k: K.uniform_mod_q(k, (hchunks, chain, n), ctx))
    print(f"[sym] uniform a (threefry): "
          f"{timeit(f_unif, jax.random.key(3))*1e3:.2f} ms")
    print(f"[sym] uniform a (rbg): "
          f"{timeit(f_unif, jax.random.key(3, impl='rbg'))*1e3:.2f} ms")
    f_cbd = jax.jit(lambda k: lift_signed(cbd_coeffs(k, (hchunks, n)), q))
    print(f"[sym] cbd error: {timeit(f_cbd, jax.random.key(4))*1e3:.2f} ms")
    xh = jnp.asarray(rng.integers(0, params.moduli[0],
                                  size=(hchunks, chain, n),
                                  dtype=np.uint64).astype(np.uint32))
    f_ntt_h = jax.jit(lambda x: ntt_mod.ntt(x, tb))
    print(f"[sym] ntt: {timeit(f_ntt_h, xh)*1e3:.2f} ms")
    from fhe_fed_tpu.rns import modops as MO
    qb = q[:, None]
    f_as = jax.jit(lambda a, w: MO.add_mod(
        MO.mul_mod_shoup(a, sk.s[:chain], sk.s_shoup[:chain], qb), w, qb))
    print(f"[sym] a*s + w: {timeit(f_as, xh, xh)*1e3:.2f} ms")
    f_sym = jax.jit(lambda v, k: O._encrypt_sym_impl(ctx, sk, v, k,
                                                     params.scale))
    print(f"[sym] full encrypt_symmetric: "
          f"{timeit(f_sym, hv, jax.random.key(5))*1e3:.2f} ms")


if __name__ == "__main__":
    main()
