"""Cross-implementation check against the independent big-int CKKS oracle
(tests/ckks_oracle.py) — the role TenSEAL/SEAL plays for the reference
(benchmark_tenseal.py:123-218): same parameters, same protocol, entirely
different arithmetic. Includes ciphertext interop in BOTH directions and a
pinned known-answer digest that fails if wire-format / PRNG / scale
conventions drift.
"""

import hashlib
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fhe_fed_tpu.ckks import params as P
from fhe_fed_tpu.ckks import keys as K
from fhe_fed_tpu.ckks import ops as O
from fhe_fed_tpu.ckks import serial as S
from fhe_fed_tpu.ntt import ntt as ntt_mod

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from ckks_oracle import CkksOracle, rns_to_int, int_to_rns  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    """The production point: batch 4096 / scale 2^52 (binding.cpp:19-23)."""
    p = P.make_params(batch=4096, scale_bits=52, mult_depth=1)
    ctx = P.make_context(p)
    sk, pk = K.keygen(ctx, seed=0)
    chain = p.chain_len
    oracle = CkksOracle(p.ring_dim, p.moduli[:chain], float(p.scale))
    return p, ctx, sk, pk, chain, oracle


def _to_coeff_ints(ctx, arr, chain):
    """Eval-domain residues (live, N) -> N big ints (iNTT + CRT). The iNTT
    is the framework's, itself bit-exact-tested against an independent
    big-int oracle in test_ntt; everything after is textbook CRT."""
    tb = ctx.tables.slice_limbs(0, chain)
    coeffs = np.asarray(ntt_mod.intt(arr[None, :chain], tb))[0]
    return rns_to_int(coeffs, ctx.params.moduli[:chain])


def test_oracle_negacyclic_mul_selfcheck():
    """The oracle's Kronecker multiply against plain numpy convolution."""
    o = CkksOracle(16, [97, 193], 1.0)
    rng = np.random.default_rng(0)
    a = rng.integers(0, o.q, size=16).tolist()
    b = rng.integers(0, o.q, size=16).tolist()
    got = o.negacyclic_mul(a, b)
    full = np.zeros(31, dtype=object)
    for i in range(16):
        for j in range(16):
            full[i + j] += a[i] * b[j]
    want = [(int(full[k]) - int(full[k + 16] if k < 15 else 0)) % o.q
            for k in range(16)]
    assert got == want


def test_secret_key_is_ternary_under_crt(setup):
    """CRT-lifting our eval-domain secret key yields ternary coefficients —
    locks the NTT/CRT conventions end to end."""
    p, ctx, sk, pk, chain, oracle = setup
    s_ints = _to_coeff_ints(ctx, np.asarray(sk.s), chain)
    q = oracle.q
    lifted = {x if x <= q // 2 else x - q for x in s_ints}
    assert lifted <= {-1, 0, 1}


def test_our_ciphertext_decrypts_under_oracle(setup):
    """Framework encrypt -> big-int CRT export -> oracle's schoolbook
    RLWE decrypt recovers the message (TenSEAL-interop analogue)."""
    p, ctx, sk, pk, chain, oracle = setup
    n = p.ring_dim
    rng = np.random.default_rng(1)
    v = rng.standard_normal((1, n)).astype(np.float32) * 0.5
    ct = O.encrypt_symmetric(ctx, sk, jnp.asarray(v), jax.random.key(7))

    s_ints = _to_coeff_ints(ctx, np.asarray(sk.s), chain)
    c0 = _to_coeff_ints(ctx, np.asarray(ct.data[0, 0]), chain)
    c1 = _to_coeff_ints(ctx, np.asarray(ct.data[0, 1]), chain)
    got = np.array(oracle.decrypt(s_ints, (c0, c1), scale=ct.scale))
    np.testing.assert_allclose(got, v[0].astype(np.float64), atol=1e-6)

    # and the public-key path too
    ct2 = O.encrypt(ctx, pk, jnp.asarray(v), jax.random.key(8))
    d0 = _to_coeff_ints(ctx, np.asarray(ct2.data[0, 0]), chain)
    d1 = _to_coeff_ints(ctx, np.asarray(ct2.data[0, 1]), chain)
    got2 = np.array(oracle.decrypt(s_ints, (d0, d1), scale=ct2.scale))
    np.testing.assert_allclose(got2, v[0].astype(np.float64), atol=1e-6)


def test_oracle_ciphertext_decrypts_under_ours(setup):
    """Oracle's big-int encrypt (under our imported secret) -> RNS import
    -> framework decrypt recovers the message."""
    p, ctx, sk, pk, chain, oracle = setup
    n = p.ring_dim
    rng = np.random.default_rng(2)
    v = rng.standard_normal(n).astype(np.float32) * 0.5

    s_ints = _to_coeff_ints(ctx, np.asarray(sk.s), chain)
    c0, c1 = oracle.encrypt_sym(s_ints, v.tolist(), seed=123)

    tb = ctx.tables.slice_limbs(0, chain)
    data = np.stack([int_to_rns(c0, p.moduli[:chain], np),
                     int_to_rns(c1, p.moduli[:chain], np)])  # (2, live, N)
    data_hat = np.asarray(ntt_mod.ntt_jit(jnp.asarray(data), tb))
    ct = O.Ciphertext(data=jnp.asarray(data_hat[None]),
                      scale=float(p.scale), level=0)
    got = np.asarray(O.decrypt(ctx, sk, ct))[0]
    np.testing.assert_allclose(got, v.astype(np.float64), atol=1e-6)


def test_slot_packed_ct_decodes_under_independent_embedding(setup):
    """Slot semantics validated by a SECOND embedding implementation:
    the framework slot-encodes + encrypts (ckks/slots.py uses an
    FFT-based inverse embedding), the oracle's schoolbook big-int RLWE
    recovers the phase polynomial, and each sampled slot value is
    re-derived by DIRECT evaluation of that polynomial at zeta**(5**j)
    (zeta = exp(i*pi/N)) — no shared code with slots.py's decode on the
    verification side."""
    from fhe_fed_tpu.ckks import slots as SL
    p, ctx, sk, pk, chain, oracle = setup
    n = p.ring_dim
    half = n // 2
    rng = np.random.default_rng(5)
    z = rng.standard_normal(half) * 0.1
    pt = SL.encode_slots(ctx, z[None, :])
    ct = O.encrypt_encoded(ctx, pk, pt, jax.random.key(9), float(p.scale))

    s_ints = _to_coeff_ints(ctx, np.asarray(sk.s), chain)
    c0 = _to_coeff_ints(ctx, np.asarray(ct.data[0, 0]), chain)
    c1 = _to_coeff_ints(ctx, np.asarray(ct.data[0, 1]), chain)
    phase = oracle._poly_add(c0, oracle.negacyclic_mul(c1, s_ints))
    coeffs = np.array([oracle._centered(x) for x in phase],
                      dtype=np.float64) / float(p.scale)
    two_n = 2 * n
    k = np.arange(n)
    for j in (0, 1, 7, 100, 1000, half - 1):
        ej = pow(5, j, two_n)
        val = np.sum(coeffs * np.exp(1j * np.pi * ej * k / n))
        assert abs(val - z[j]) < 1e-4, (j, val, z[j])


def test_weighted_average_cross_implementation(setup):
    """The full 3-learner weighted average run through BOTH
    implementations; the oracle also decrypts OUR homomorphic result."""
    p, ctx, sk, pk, chain, oracle = setup
    n = p.ring_dim
    rng = np.random.default_rng(3)
    vs = [rng.standard_normal((1, n)).astype(np.float32) for _ in range(3)]
    ws = [0.5, 0.2, 0.3]
    want = sum(w * v for w, v in zip(ws, vs))[0].astype(np.float64)

    # ours
    cts = [O.encrypt_symmetric(ctx, sk, jnp.asarray(v), jax.random.key(40 + i))
           for i, v in enumerate(vs)]
    agg = O.weighted_sum(ctx, cts, ws)
    ours = np.asarray(O.decrypt(ctx, sk, agg))[0]
    np.testing.assert_allclose(ours, want, atol=1e-6)

    # oracle, end to end with its own keys/randomness
    s_o = oracle.sample_ternary(seed=9)
    octs = [oracle.encrypt_sym(s_o, v[0].tolist(), seed=50 + i)
            for i, v in enumerate(vs)]
    ds = float(p.moduli[chain - 1])          # our scalar-encode scale
    oagg = oracle.weighted_average(octs, ws, ds)
    theirs = np.array(oracle.decrypt(s_o, oagg, scale=float(p.scale) * ds))
    np.testing.assert_allclose(theirs, want, atol=1e-6)
    np.testing.assert_allclose(ours, theirs, atol=2e-6)

    # oracle decrypts OUR aggregated ciphertext
    s_ints = _to_coeff_ints(ctx, np.asarray(sk.s), chain)
    a0 = _to_coeff_ints(ctx, np.asarray(agg.data[0, 0]), chain)
    a1 = _to_coeff_ints(ctx, np.asarray(agg.data[0, 1]), chain)
    cross = np.array(oracle.decrypt(s_ints, (a0, a1), scale=agg.scale))
    np.testing.assert_allclose(cross, want, atol=1e-6)


# Known-answer pin: SHA256 of the serialized ciphertext of a fixed message
# under a fixed key/seed, and of the serialized secret key. Any drift in
# PRNG derivation, NTT tables, encode conventions, or the wire format
# changes these digests. Regenerate ONLY for a deliberate, documented
# format change (bump serial.py's version when doing so).
_KAT_EXPECTED = {
    "ct": "e2cfa667b8fc7a5c93eddae47ee6fccf44e1db2db0e24344d88d00412d4f92b6",
    "sk": "fe0c00e9f396eb843bed8bba93021176f830c4a5efcbb1c4e67b8eaef3c9ffd9",
}


def test_known_answer_digest(setup):
    p, ctx, sk, pk, chain, oracle = setup
    n = p.ring_dim
    v = jnp.asarray(np.linspace(-1.0, 1.0, n, dtype=np.float32)[None])
    ct = O.encrypt_symmetric(ctx, sk, v, jax.random.key(2024))
    ct_digest = hashlib.sha256(S.serialize_ct(ctx, ct)).hexdigest()
    sk_digest = hashlib.sha256(S.serialize_secret_key(ctx, sk)).hexdigest()
    if _KAT_EXPECTED["ct"] == "TBD":
        pytest.skip(f"record digests: ct={ct_digest} sk={sk_digest}")
    assert ct_digest == _KAT_EXPECTED["ct"], (
        "ciphertext wire bytes drifted — PRNG/NTT/encode/serial conventions "
        f"changed (got {ct_digest})")
    assert sk_digest == _KAT_EXPECTED["sk"], (
        f"secret-key wire bytes drifted (got {sk_digest})")
