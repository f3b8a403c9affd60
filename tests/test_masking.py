"""Masking (Paillier) secure-aggregation scheme: native bignum kernels,
packing geometry, fixed-point ring codec, and the full offline+online
protocol (reference src/paillier.cpp:16-127, src/PaillierUtils.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_fed_tpu.native import paillier as P
from fhe_fed_tpu.fed import masking as M

BITS = 512   # small keys: fast tests; kernels are width-generic


@pytest.fixture(scope="module")
def keys():
    pk, sk = P.keygen(bits=BITS)
    return pk, sk


def test_paillier_roundtrip_and_homomorphism(keys):
    pk, sk = keys
    ctx = P.PaillierContext(pk, sk)
    rng = np.random.default_rng(0)
    msgs = [int(x) for x in rng.integers(0, 1 << 60, size=8)]
    msgs += [0, pk.n - 1]
    cts = ctx.encrypt(msgs)
    assert ctx.decrypt(cts) == msgs
    # ciphertexts are randomized
    cts2 = ctx.encrypt(msgs)
    assert (cts != cts2).any()
    # homomorphic add
    other = [int(x) for x in rng.integers(0, 1 << 60, size=10)]
    s = ctx.add(cts, ctx.encrypt(other))
    assert ctx.decrypt(s) == [(a + b) % pk.n for a, b in zip(msgs, other)]


def test_paillier_oracle_vs_python_ints(keys):
    """Native Montgomery kernels vs direct Python-int Paillier."""
    pk, sk = keys
    ctx = P.PaillierContext(pk, sk)
    n, n2 = pk.n, pk.n_sq
    msgs = [3, 1 << 200, n - 2]
    cts = ctx.encrypt(msgs)
    for m, row in zip(msgs, cts):
        c = P._from_limbs(row)
        # decrypt with python ints: L(c^lam) * mu mod n
        x = pow(c, sk.lam, n2)
        assert (x - 1) % n == 0
        assert (x - 1) // n * sk.mu % n == m


def test_packing_roundtrip():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1 << 17, size=1000).astype(np.uint32)
    blocks = M.pack_values(vals, learners=4, num_bits=17, modulus_bits=2048)
    # 85 values per 2048-bit plaintext (3-byte slots, learners<=8)
    assert len(blocks) == int(np.ceil(1000 / 85))
    back = M.unpack_values(blocks, 1000, 4, 17, 2048)
    np.testing.assert_array_equal(back, vals)


def test_packing_sum_no_overflow():
    """Packed sums of `learners` values stay slot-isolated."""
    learners, nb, mb = 4, 17, 2048
    rng = np.random.default_rng(2)
    allv = [rng.integers(0, 1 << nb, size=200).astype(np.uint32)
            for _ in range(learners)]
    blocks = [M.pack_values(v, learners, nb, mb) for v in allv]
    summed = [sum(col) for col in zip(*blocks)]
    got = M.unpack_values(summed, 200, learners, nb, mb)
    want = np.sum(np.stack(allv).astype(np.uint64), axis=0)
    np.testing.assert_array_equal(got, want)


def test_fixed_point_codec():
    x = jnp.asarray(np.array([0.0, 1.5, -1.5, 0.123, -7.9, 3.999],
                             dtype=np.float32))
    enc = M.fixed_point_encode(x, 17, 13)
    dec = np.asarray(M.fixed_point_decode(enc, 17, 13))
    np.testing.assert_allclose(dec, np.asarray(x), atol=2 ** -13 + 1e-7)
    # clipping at +-(2^(b-1)-1)/2^13 = +-7.9998
    big = jnp.asarray(np.array([100.0, -100.0], dtype=np.float32))
    dec_big = np.asarray(M.fixed_point_decode(
        M.fixed_point_encode(big, 17, 13), 17, 13))
    np.testing.assert_allclose(dec_big, [(2 ** 16 - 1) / 2 ** 13,
                                         -(2 ** 16 - 1) / 2 ** 13])


def test_full_protocol_end_to_end(tmp_path):
    """4 learners, full offline + online round: result == plain average."""
    learners = 4
    n_params = 300
    schemes = [M.Masking("paillier", learners, modulus_bits=BITS,
                         num_bits=17, precision_bits=13,
                         cryptodir=str(tmp_path / "crypto"),
                         randomnessdir=str(tmp_path / f"rand{i}"))
               for i in range(learners)]
    schemes[0].genCryptoContextAndKeyGen()
    for s in schemes:
        s.loadCryptoParams()

    # offline: every learner publishes encrypted randomness
    blobs = [s.genPaillierRandOffline(n_params, iteration=0)
             for s in schemes]
    enc_sum = schemes[0].addPaillierRandOffline(blobs)   # aggregator
    for s in schemes:                                    # each key-holder
        s.decryptRandomnessSum(enc_sum, n_params, iteration=0)

    # online
    rng = np.random.default_rng(3)
    data = [rng.standard_normal(n_params).astype(np.float32)
            for _ in range(learners)]
    masked = [s.encrypt(d, iteration=0) for s, d in zip(schemes, data)]
    agg = schemes[0].computeWeightedAverage(masked,
                                            [1.0 / learners] * learners)
    out = schemes[1].decrypt(agg, n_params, iteration=0)
    want = np.mean(np.stack(data), axis=0)
    np.testing.assert_allclose(out, want, atol=learners * 2 ** -13)

    # masked blobs look uniform: no correlation with plaintext sign
    m0 = np.frombuffer(masked[0], dtype="<u4")
    assert np.abs(np.corrcoef(m0, data[0])[0, 1]) < 0.2


def test_weight_count_mismatch(tmp_path):
    s = M.Masking("paillier", 2, modulus_bits=BITS,
                  cryptodir=str(tmp_path), randomnessdir=str(tmp_path))
    with pytest.raises(ValueError):
        s.computeWeightedAverage([b"\x00" * 4], [0.5, 0.5])


def test_dropout_recovery_subset(tmp_path):
    """Client dropout: learners {0,2,3} of 4 participate online. The
    aggregator re-sums the RETAINED encrypted offline blobs for the
    survivors (recoverRandomnessSubset) — the reference protocol cannot
    do this (unmaskParams assumes all present, PaillierUtils.cpp:692)."""
    learners = 4
    n_params = 200
    schemes = [M.Masking("paillier", learners, modulus_bits=BITS,
                         num_bits=17, precision_bits=13,
                         cryptodir=str(tmp_path / "crypto"),
                         randomnessdir=str(tmp_path / f"rand{i}"))
               for i in range(learners)]
    schemes[0].genCryptoContextAndKeyGen()
    for s in schemes:
        s.loadCryptoParams()

    blobs = [s.genPaillierRandOffline(n_params, iteration=0)
             for s in schemes]
    survivors = [0, 2, 3]

    rng = np.random.default_rng(7)
    data = [rng.standard_normal(n_params).astype(np.float32)
            for _ in range(learners)]
    masked = [schemes[i].encrypt(data[i], iteration=0) for i in survivors]
    agg = schemes[0].computeWeightedAverage(masked)

    # recovery: aggregator + key-holder, no surviving-learner interaction
    schemes[1].recoverRandomnessSubset(blobs, n_params, iteration=0,
                                       subset=survivors)
    # the decryptor needs the subset sum locally too
    schemes[0].recoverRandomnessSubset(blobs, n_params, iteration=0,
                                       subset=survivors)
    out = schemes[0].decrypt(agg, n_params, iteration=0, subset=survivors)
    want = np.mean(np.stack([data[i] for i in survivors]), axis=0)
    np.testing.assert_allclose(out, want, atol=learners * 2 ** -13)


def test_native_thread_control():
    """paillier_set_threads pins the OpenMP worker count the offline
    kernels use (scaling benches sweep it; reference analogue: ambient
    OMP control of PaillierUtils.cpp:705-760)."""
    full = P.num_threads()
    assert full >= 1
    P.set_threads(1)
    assert P.num_threads() == 1
    P.set_threads(full)
    assert P.num_threads() == full
