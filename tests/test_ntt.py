"""NTT correctness: roundtrip, linearity, and negacyclic convolution vs an
exact big-int numpy oracle (mirrors the reference's reliance on PALISADE's
NTT — SURVEY.md C11 — but tested explicitly)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_fed_tpu.rns import primes
from fhe_fed_tpu.ntt import tables, ntt as ntt_mod

fwd = ntt_mod.ntt_jit
inv = ntt_mod.intt_jit


def _negacyclic_mul_oracle(a, b, q):
    """Exact poly mult mod (x^n + 1, q) with Python ints."""
    n = len(a)
    out = [0] * n
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            v = ai * int(b[j])
            if k < n:
                out[k] = (out[k] + v) % q
            else:
                out[k - n] = (out[k - n] - v) % q
    return np.array(out, dtype=np.uint32)


@pytest.mark.parametrize("n", [64, 256, 1024, 8192])
def test_ntt_roundtrip(n):
    qs = primes.ntt_primes(n, 3)
    tb = tables.make_tables(n, qs)
    rng = np.random.default_rng(n)
    x = np.stack([rng.integers(0, q, size=n, dtype=np.uint64).astype(np.uint32)
                  for q in qs])
    got = np.asarray(inv(fwd(jnp.asarray(x), tb), tb))
    np.testing.assert_array_equal(got, x)


@pytest.mark.parametrize("n", [64, 256])
def test_ntt_negacyclic_convolution(n):
    qs = primes.ntt_primes(n, 2)
    tb = tables.make_tables(n, qs)
    rng = np.random.default_rng(7)
    a = np.stack([rng.integers(0, q, size=n, dtype=np.uint64).astype(np.uint32)
                  for q in qs])
    b = np.stack([rng.integers(0, q, size=n, dtype=np.uint64).astype(np.uint32)
                  for q in qs])
    fa = fwd(jnp.asarray(a), tb)
    fb = fwd(jnp.asarray(b), tb)
    # Pointwise product via Barrett.
    from fhe_fed_tpu.rns import modops
    mu = jnp.asarray(np.array([modops.barrett_precompute(q) for q in qs],
                              dtype=np.uint32)).reshape(-1, 1)
    prod = modops.mul_mod(fa, fb, tb.q.reshape(-1, 1), mu)
    got = np.asarray(inv(prod, tb))
    for l, q in enumerate(qs):
        want = _negacyclic_mul_oracle(a[l], b[l], q)
        np.testing.assert_array_equal(got[l], want)


def test_ntt_batched_shapes():
    n = 256
    qs = primes.ntt_primes(n, 2)
    tb = tables.make_tables(n, qs)
    rng = np.random.default_rng(9)
    x = np.stack([
        np.stack([rng.integers(0, q, size=n, dtype=np.uint64).astype(np.uint32)
                  for q in qs])
        for _ in range(6)]).reshape(3, 2, 2, n)
    got = np.asarray(inv(fwd(jnp.asarray(x), tb), tb))
    np.testing.assert_array_equal(got, x)


def test_ntt_known_linear_property():
    # NTT(a + b) == NTT(a) + NTT(b) pointwise mod q.
    n = 1024
    qs = primes.ntt_primes(n, 2)
    tb = tables.make_tables(n, qs)
    rng = np.random.default_rng(11)
    a = np.stack([rng.integers(0, q, size=n, dtype=np.uint64).astype(np.uint32)
                  for q in qs])
    b = np.stack([rng.integers(0, q, size=n, dtype=np.uint64).astype(np.uint32)
                  for q in qs])
    from fhe_fed_tpu.rns import modops
    qb = tb.q.reshape(-1, 1)
    lhs = fwd(modops.add_mod(jnp.asarray(a), jnp.asarray(b), qb), tb)
    rhs = modops.add_mod(fwd(jnp.asarray(a), tb),
                         fwd(jnp.asarray(b), tb), qb)
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))
