"""TPU validation + timing of the fused Pallas NTT vs the jnp path.

Run: python -m benchmarks.pallas_check
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from fhe_fed_tpu.rns import primes as primes_mod
    from fhe_fed_tpu.ntt import tables as tables_mod
    from fhe_fed_tpu.ntt import ntt as ntt_mod
    from fhe_fed_tpu.ntt import pallas_ntt

    print("backend:", jax.default_backend())
    n, L, B = 8192, 4, 407
    moduli = primes_mod.ntt_primes(n, L)
    tb = tables_mod.make_tables(n, moduli)

    rng = np.random.default_rng(0)
    q = np.asarray(tb.q, dtype=np.uint64)
    x = jnp.asarray((rng.integers(0, 1 << 32, size=(B, L, n), dtype=np.uint64)
                     % q[None, :, None]).astype(np.uint32))

    import os
    os.environ["FHE_FED_TPU_NO_PALLAS"] = "1"
    f_jnp = jax.jit(lambda x: ntt_mod.ntt(x, tb))
    fi_jnp = jax.jit(lambda x: ntt_mod.intt(x, tb))
    want = np.asarray(jax.block_until_ready(f_jnp(x)))
    t_jnp = timeit(f_jnp, x)
    ti_jnp = timeit(fi_jnp, x)
    del os.environ["FHE_FED_TPU_NO_PALLAS"]

    f_pal = jax.jit(lambda x: pallas_ntt.ntt_fused(x, tb.stages))
    fi_pal = jax.jit(lambda x: pallas_ntt.intt_fused(x, tb.stages))
    got = np.asarray(jax.block_until_ready(f_pal(x)))
    match = np.array_equal(got, want)
    print("fwd bit-exact vs jnp:", match)
    back = np.asarray(jax.block_until_ready(fi_pal(f_pal(x))))
    print("roundtrip exact:", np.array_equal(back, np.asarray(x)))
    t_pal = timeit(f_pal, x)
    ti_pal = timeit(fi_pal, x)

    rt = timeit(jax.jit(lambda v: v + 1), jnp.zeros((8, 128), jnp.float32))
    print(f"dispatch floor: {rt*1e3:.2f} ms")
    print(f"ntt  jnp: {t_jnp*1e3:.2f} ms  pallas: {t_pal*1e3:.2f} ms  "
          f"device-only est: {(t_jnp-rt)*1e3:.2f} -> {(t_pal-rt)*1e3:.2f} ms")
    print(f"intt jnp: {ti_jnp*1e3:.2f} ms  pallas: {ti_pal*1e3:.2f} ms  "
          f"device-only est: {(ti_jnp-rt)*1e3:.2f} -> {(ti_pal-rt)*1e3:.2f} ms")
    if not match:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
