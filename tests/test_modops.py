"""Oracle tests: uint32 modular arithmetic vs exact Python integers."""

import numpy as np
import jax.numpy as jnp

from fhe_fed_tpu.rns import modops, primes


def _rand_u32_below(rng, q, n):
    return rng.integers(0, q, size=n, dtype=np.uint64).astype(np.uint32)


def test_primes_ntt_friendly():
    ps = primes.ntt_primes(8192, 5)
    assert len(set(ps)) == 5
    for p in ps:
        assert 2 ** 30 < p < 2 ** 31
        assert (p - 1) % 16384 == 0
        assert primes.is_prime(p)


def test_mul_wide_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2 ** 32, size=4096, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 2 ** 32, size=4096, dtype=np.uint64).astype(np.uint32)
    hi, lo = modops.mul_wide(jnp.asarray(a), jnp.asarray(b))
    t = a.astype(np.uint64) * b.astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(hi), (t >> 32).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(lo), (t & 0xFFFFFFFF).astype(np.uint32))


def test_add_sub_neg_mod():
    rng = np.random.default_rng(1)
    q = primes.ntt_primes(4096, 1)[0]
    a = _rand_u32_below(rng, q, 4096)
    b = _rand_u32_below(rng, q, 4096)
    qj = jnp.uint32(q)
    np.testing.assert_array_equal(
        np.asarray(modops.add_mod(jnp.asarray(a), jnp.asarray(b), qj)),
        ((a.astype(np.uint64) + b) % q).astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(modops.sub_mod(jnp.asarray(a), jnp.asarray(b), qj)),
        ((a.astype(np.int64) - b) % q).astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(modops.neg_mod(jnp.asarray(a), qj)),
        ((-a.astype(np.int64)) % q).astype(np.uint32))


def test_mul_mod_shoup_vs_oracle():
    rng = np.random.default_rng(2)
    for q in primes.ntt_primes(4096, 3):
        x = _rand_u32_below(rng, q, 8192)
        w = int(rng.integers(0, q))
        w_sh = modops.shoup_precompute(w, q)
        got = modops.mul_mod_shoup(
            jnp.asarray(x), jnp.uint32(w), jnp.asarray(w_sh), jnp.uint32(q))
        want = (x.astype(np.uint64) * w % q).astype(np.uint32)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_mul_mod_shoup_edge_values():
    for q in primes.ntt_primes(4096, 2):
        xs = np.array([0, 1, q - 1, q // 2, q // 2 + 1], dtype=np.uint32)
        for w in [0, 1, q - 1, q // 2]:
            w_sh = modops.shoup_precompute(w, q)
            got = modops.mul_mod_shoup(
                jnp.asarray(xs), jnp.uint32(w), jnp.asarray(w_sh), jnp.uint32(q))
            want = (xs.astype(np.uint64) * w % q).astype(np.uint32)
            np.testing.assert_array_equal(np.asarray(got), want)


def test_mul_mod_barrett_vs_oracle():
    rng = np.random.default_rng(3)
    for q in primes.ntt_primes(4096, 3):
        mu = modops.barrett_precompute(q)
        x = _rand_u32_below(rng, q, 8192)
        y = _rand_u32_below(rng, q, 8192)
        got = modops.mul_mod(jnp.asarray(x), jnp.asarray(y),
                             jnp.uint32(q), jnp.uint32(mu))
        want = (x.astype(np.uint64) * y % q).astype(np.uint32)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_mul_mod_barrett_edge_values():
    for q in primes.ntt_primes(4096, 2):
        mu = modops.barrett_precompute(q)
        xs = np.array([0, 1, q - 1, q - 2, q // 2], dtype=np.uint32)
        ys = np.array([q - 1, q - 1, q - 1, q - 2, q // 2], dtype=np.uint32)
        got = modops.mul_mod(jnp.asarray(xs), jnp.asarray(ys),
                             jnp.uint32(q), jnp.uint32(mu))
        want = (xs.astype(np.uint64) * ys % q).astype(np.uint32)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_mul_div_exact_quotient():
    rng = np.random.default_rng(4)
    for q in primes.ntt_primes(4096, 3):
        mu = modops.barrett_precompute(q)
        x = _rand_u32_below(rng, q, 8192)
        y = _rand_u32_below(rng, q, 8192)
        got = modops.mul_div(jnp.asarray(x), jnp.asarray(y),
                             jnp.uint32(q), jnp.uint32(mu))
        want = (x.astype(np.uint64) * y // q).astype(np.uint32)
        np.testing.assert_array_equal(np.asarray(got), want)
        # edges
        xs = np.array([0, 1, q - 1, q - 2, q // 2], dtype=np.uint32)
        ys = np.array([q - 1, 0, q - 1, q - 2, q // 2], dtype=np.uint32)
        got = modops.mul_div(jnp.asarray(xs), jnp.asarray(ys),
                             jnp.uint32(q), jnp.uint32(mu))
        want = (xs.astype(np.uint64) * ys // q).astype(np.uint32)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_shoup_device_matches_host():
    """Device-side Shoup companion == host shoup_precompute, all limbs."""
    rng = np.random.default_rng(5)
    for q in primes.ntt_primes(4096, 3):
        mu = modops.barrett_precompute(q)
        k32 = (1 << 32) // q
        p32 = (1 << 32) % q
        w = _rand_u32_below(rng, q, 8192)
        w = np.concatenate([w, np.array([0, 1, q - 1, q // 2], np.uint32)])
        got = modops.shoup_device(jnp.asarray(w), jnp.uint32(q),
                                  jnp.uint32(mu), jnp.uint32(k32),
                                  jnp.uint32(p32))
        want = modops.shoup_precompute(w, q)
        np.testing.assert_array_equal(np.asarray(got), want)
