"""Seed-compressed fresh ciphertexts (ops.SeededCiphertext).

A fresh secret-key ciphertext's c1 = -a is pure PRG output, so the wire
carries (c0, 64-bit threefry seed) at HALF the bytes and the server
re-expands a. The reference has no such capability (PALISADE serializes
both polynomials, ckks.cpp:98-101); its comm-expansion baseline is ~16.6x
(figs/processing.py:74-85) — this path reaches ~8x for client uploads.

Contracts tested:
  * expansion is exact: decrypt(expand(seeded)) equals the plaintext
    within CKKS noise, and the expanded ct aggregates bit-identically to
    a full ct built from the same (c0, a),
  * serialization round-trips and the blob is ~half of serialize_ct's,
  * the drop-in API (seeded_fresh=True) interoperates with full blobs in
    the same computeWeightedAverage call.
"""

import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from fhe_fed_tpu.ckks import params as P, keys as K, ops as O
from fhe_fed_tpu.ckks import serial as S


def _small_ctx():
    params = P.make_params(batch=128, scale_bits=40, mult_depth=1,
                           ring_dim=256)
    return params, P.make_context(params)


def test_seeded_expand_decrypts():
    params, ctx = _small_ctx()
    sk, _pk = K.keygen(ctx, seed=0)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((3, 256)).astype(np.float32))
    sct = O.encrypt_symmetric_seeded(ctx, sk, v, jax.random.key(42))
    ct = O.expand_seeded(ctx, sct)
    out = np.asarray(O.decrypt(ctx, sk, ct))
    np.testing.assert_allclose(out, np.asarray(v), atol=1e-4)


def test_expansion_matches_manual_construction():
    """c1 must be exactly -uniform_xor2(threefry-pair(seed)) — i.e. the
    server reconstructs bit-for-bit what the client elided. The seed is a
    128-bit key PAIR (two XORed threefry streams), not a single 64-bit
    threefry key — see SeededCiphertext on collision space."""
    params, ctx = _small_ctx()
    sk, _pk = K.keygen(ctx, seed=1)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))
    sct = O.encrypt_symmetric_seeded(ctx, sk, v, jax.random.key(7))
    assert np.asarray(sct.seed).shape == (4,)
    ct = O.expand_seeded(ctx, sct)
    L = params.chain_len
    ka = jax.random.wrap_key_data(sct.seed[:2], impl="threefry2x32")
    kb = jax.random.wrap_key_data(sct.seed[2:], impl="threefry2x32")
    a_hat = K.uniform_mod_q_xor2(ka, kb, (2, L, 256), ctx)
    from fhe_fed_tpu.rns import modops
    want_c1 = np.asarray(modops.neg_mod(a_hat, ctx.q[:L][:, None]))
    np.testing.assert_array_equal(np.asarray(ct.data[:, 1]), want_c1)
    np.testing.assert_array_equal(np.asarray(ct.data[:, 0]),
                                  np.asarray(sct.c0))


def test_serial_roundtrip_and_size():
    params, ctx = _small_ctx()
    sk, _pk = K.keygen(ctx, seed=2)
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    sct = O.encrypt_symmetric_seeded(ctx, sk, v, jax.random.key(3))
    blob = S.serialize_seeded_ct(ctx, sct)
    back = S.deserialize_seeded_ct(ctx, blob)
    np.testing.assert_array_equal(np.asarray(back.c0), np.asarray(sct.c0))
    np.testing.assert_array_equal(np.asarray(back.seed),
                                  np.asarray(sct.seed))
    assert back.scale == sct.scale and back.level == sct.level
    full_blob = S.serialize_ct(ctx, O.expand_seeded(ctx, sct))
    assert len(blob) <= len(full_blob) // 2 + S.CT_HEADER_BYTES + 16
    # deserialize_any_ct expands transparently
    ct = S.deserialize_any_ct(ctx, blob)
    np.testing.assert_array_equal(
        np.asarray(ct.data), np.asarray(O.expand_seeded(ctx, sct).data))


def test_api_seeded_interop_with_full_blobs():
    """Mixed cohort: two seeded uploads + one classic full upload aggregate
    through the drop-in API to the plaintext weighted average."""
    from fhe_fed_tpu import CKKS
    d1, d2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    h_seeded = CKKS("ckks", 128, 40, cryptodir=d1, seeded_fresh=True)
    h_seeded._params = P.make_params(batch=128, scale_bits=40, mult_depth=1,
                                     ring_dim=256)
    h_seeded.genCryptoContextAndKeyGen()
    assert h_seeded.symmetric  # implied
    # classic helper sharing the same key material
    h_full = CKKS("ckks", 128, 40, cryptodir=d1, symmetric=True)
    h_full._params = h_seeded._params
    h_full.loadCryptoParams()

    rng = np.random.default_rng(9)
    vs = [rng.standard_normal(300).astype(np.float32) for _ in range(3)]
    w = [0.5, 0.2, 0.3]
    blobs = [h_seeded.encrypt(vs[0]), h_seeded.encrypt(vs[1]),
             h_full.encrypt(vs[2])]
    assert blobs[0][:4] == b"FFTS" and blobs[2][:4] == b"FFTC"
    assert len(blobs[0]) < 0.6 * len(blobs[2])
    agg = h_seeded.computeWeightedAverage(blobs, w)
    out = h_seeded.decrypt(agg, 300)
    want = sum(wi * v for wi, v in zip(w, vs))
    assert np.max(np.abs(out - want)) < 1e-3
