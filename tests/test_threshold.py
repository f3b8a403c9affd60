"""Threshold CKKS: chained multiparty keygen, joint encryption, partial
decrypt + fusion, and a joint rotation key — mirrors the mk-test flow
(reference code/mkhe/mkhe.cpp:188-465)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fhe_fed_tpu.ckks import params as P
from fhe_fed_tpu.ckks import keys as K
from fhe_fed_tpu.ckks import ops as O
from fhe_fed_tpu.ckks import keyswitch as KS
from fhe_fed_tpu.ckks import threshold as T
from fhe_fed_tpu.rns import modops

N = 256
PARTIES = 3


@pytest.fixture(scope="module")
def setup():
    p = P.make_params(batch=128, scale_bits=40, mult_depth=1, ring_dim=N)
    ctx = P.make_context(p)
    sks, pk = T.multiparty_keygen(ctx, PARTIES, seed=3)
    return ctx, sks, pk


def _joint_secret(ctx, sks):
    qb = ctx.q[:, None]
    s = sks[0].s
    for sk in sks[1:]:
        s = modops.add_mod(s, sk.s, qb)
    return K.SecretKey(s=s, s_shoup=K._shoup_host(s, np.asarray(ctx.q)))


def test_joint_pk_matches_joint_secret(setup):
    """pk chain == classical pk of the summed secret (mod noise)."""
    ctx, sks, pk = setup
    joint = _joint_secret(ctx, sks)
    rng = np.random.default_rng(0)
    v = rng.standard_normal((1, N)).astype(np.float32)
    ct = O.encrypt(ctx, pk, jnp.asarray(v), jax.random.key(1))
    got = np.asarray(O.decrypt(ctx, joint, ct))
    np.testing.assert_allclose(got, v, atol=1e-3)


def test_partial_decrypt_fusion(setup):
    ctx, sks, pk = setup
    rng = np.random.default_rng(1)
    v = rng.standard_normal((2, N)).astype(np.float32)
    ct = O.encrypt(ctx, pk, jnp.asarray(v), jax.random.key(2))

    parts = [T.partial_decrypt_lead(ctx, sks[0], ct, jax.random.key(10))]
    for i, sk in enumerate(sks[1:]):
        parts.append(T.partial_decrypt_main(ctx, sk, ct,
                                            jax.random.key(11 + i)))
    got = np.asarray(T.fuse_decrypt(ctx, parts, ct.scale))
    np.testing.assert_allclose(got, v, atol=2e-3)


def test_threshold_fedavg_circuit(setup):
    """The mkhe homomorphic circuit: EvalMult(ct, w) + EvalAdd under the
    joint key, then threshold decryption (mkhe.cpp:363-368, 392-402)."""
    ctx, sks, pk = setup
    rng = np.random.default_rng(2)
    vs = [rng.standard_normal((1, N)).astype(np.float32) for _ in range(3)]
    ws = [0.5, 0.2, 0.3]
    cts = [O.encrypt(ctx, pk, jnp.asarray(v), jax.random.key(20 + i))
           for i, v in enumerate(vs)]
    agg = O.weighted_sum(ctx, cts, ws)

    parts = [T.partial_decrypt_lead(ctx, sks[0], agg, jax.random.key(30))]
    for i, sk in enumerate(sks[1:]):
        parts.append(T.partial_decrypt_main(ctx, sk, agg,
                                            jax.random.key(31 + i)))
    got = np.asarray(T.fuse_decrypt(ctx, parts, agg.scale))
    want = sum(w * v for w, v in zip(ws, vs))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_joint_rotation_key(setup):
    """Additive galois-key shares combine into a key valid for the joint
    secret (MultiEvalSumKeyGen / MultiAddEvalKeys parity)."""
    ctx, sks, pk = setup
    g = KS.galois_element(1, N)
    shares = [T.partial_galois_key(ctx, sk, g, common_seed=77,
                                   rng_key=jax.random.key(40 + i))
              for i, sk in enumerate(sks)]
    gk = T.combine_switch_key_shares(ctx, shares)

    rng = np.random.default_rng(5)
    v = rng.standard_normal((1, N)).astype(np.float32)
    ct = O.encrypt(ctx, pk, jnp.asarray(v), jax.random.key(50))
    rot = KS.rotate(ctx, ct, 1, gk)

    joint = _joint_secret(ctx, sks)
    got = np.asarray(O.decrypt(ctx, joint, rot))

    def auto_coeff(vv, g):
        n = len(vv)
        out = np.zeros_like(vv, dtype=np.float64)
        for k in range(n):
            e = k * g % (2 * n)
            if e < n:
                out[e] += vv[k]
            else:
                out[e - n] -= vv[k]
        return out

    want = auto_coeff(v[0].astype(np.float64), g)
    np.testing.assert_allclose(got[0], want, atol=5e-3)


def _threshold_decrypt(ctx, sks, ct):
    parts = [T.partial_decrypt_lead(ctx, sks[0], ct, jax.random.key(90))]
    for i, sk in enumerate(sks[1:]):
        parts.append(T.partial_decrypt_main(ctx, sk, ct,
                                            jax.random.key(91 + i)))
    return np.asarray(T.fuse_decrypt(ctx, parts, ct.scale))


def test_joint_relin_two_round_ceremony():
    """ct x ct + relinearization under the JOINT key: the two-round
    MultiKeySwitchGen/MultiMultEvalKey/MultiAddEvalMultKeys ceremony
    (mkhe.cpp:281-317), verified against a negacyclic convolution oracle
    and decrypted by threshold partial-decrypt fusion."""
    p = P.make_params(batch=128, scale_bits=40, mult_depth=2, ring_dim=N)
    ctx = P.make_context(p)
    sks, pk = T.multiparty_keygen(ctx, PARTIES, seed=11)
    rlk = T.multiparty_relin_key(ctx, sks, common_seed=5, seed=11)

    rng = np.random.default_rng(8)
    a = (rng.random((2, N)).astype(np.float32) - 0.5) / 8
    b = (rng.random((2, N)).astype(np.float32) - 0.5) / 8
    ct_a = O.encrypt(ctx, pk, jnp.asarray(a), jax.random.key(70))
    ct_b = O.encrypt(ctx, pk, jnp.asarray(b), jax.random.key(71))

    prod = O.rescale(ctx, KS.mul_ct(ctx, ct_a, ct_b, rlk))

    def conv(x, y):
        n = len(x)
        full = np.convolve(x.astype(np.float64), y.astype(np.float64))
        out = full[:n].copy()
        out[: n - 1] -= full[n:]
        return out

    want = np.stack([conv(a[i], b[i]) for i in range(2)])
    got = _threshold_decrypt(ctx, sks, prod)
    np.testing.assert_allclose(got, want, atol=2e-2)
    # classical decrypt under the summed secret agrees too
    joint = _joint_secret(ctx, sks)
    got2 = np.asarray(O.decrypt(ctx, joint, prod))
    np.testing.assert_allclose(got2, want, atol=2e-2)


@pytest.mark.slow
def test_threshold_production_ring():
    """Threshold flow at the production point (batch 4096 / scale 2^52 /
    ring 8192 — binding.cpp:19-23 defaults), not just toy rings: chained
    keygen, joint encryption, the mkhe weighted-sum circuit, and
    partial-decrypt fusion."""
    p = P.make_params(batch=4096, scale_bits=52, mult_depth=1)
    ctx = P.make_context(p)
    sks, pk = T.multiparty_keygen(ctx, PARTIES, seed=21)
    n = ctx.ring_dim
    rng = np.random.default_rng(9)
    vs = [rng.standard_normal((1, n)).astype(np.float32) for _ in range(3)]
    ws = [0.5, 0.2, 0.3]
    cts = [O.encrypt(ctx, pk, jnp.asarray(v), jax.random.key(80 + i))
           for i, v in enumerate(vs)]
    agg = O.weighted_sum(ctx, cts, ws)
    got = _threshold_decrypt(ctx, sks, agg)
    want = sum(w * v for w, v in zip(ws, vs))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_smudging_hides_partial(setup):
    """A single partial decryption does not reveal the plaintext."""
    ctx, sks, pk = setup
    v = np.zeros((1, N), dtype=np.float32)
    ct = O.encrypt(ctx, pk, jnp.asarray(v), jax.random.key(60))
    part = T.partial_decrypt_lead(ctx, sks[0], ct, jax.random.key(61))
    # decoding the single share must NOT give ~zeros (it misses the other
    # parties' secrets and carries wide smudging noise)
    got = np.asarray(T.fuse_decrypt(ctx, [part], ct.scale))
    assert np.abs(got).max() > 1.0


# ---------------------------------------------------------------------------
# Batched/jitted ceremony fast path: must be residue-identical to the
# per-party protocol functions under the same seeds/keys.
# ---------------------------------------------------------------------------

def test_batched_keygen_matches_chain(setup):
    ctx, sks, pk = setup
    sec, pk2 = T.multiparty_keygen_batched(ctx, PARTIES, seed=3)
    for i in range(PARTIES):
        np.testing.assert_array_equal(np.asarray(sec.s[i]),
                                      np.asarray(sks[i].s))
        np.testing.assert_array_equal(np.asarray(sec.s_shoup[i]),
                                      np.asarray(sks[i].s_shoup))
    np.testing.assert_array_equal(np.asarray(pk2.p0), np.asarray(pk.p0))
    np.testing.assert_array_equal(np.asarray(pk2.p1), np.asarray(pk.p1))
    np.testing.assert_array_equal(np.asarray(pk2.p0_shoup),
                                  np.asarray(pk.p0_shoup))


def test_batched_threshold_decrypt_matches_partials(setup):
    ctx, sks, pk = setup
    sec, _ = T.multiparty_keygen_batched(ctx, PARTIES, seed=3)
    rng = np.random.default_rng(4)
    v = rng.standard_normal((2, N)).astype(np.float32)
    ct = O.encrypt(ctx, pk, jnp.asarray(v), jax.random.key(5))
    keys = [jax.random.key(10 + i) for i in range(PARTIES)]
    parts = [T.partial_decrypt_lead(ctx, sks[0], ct, keys[0])]
    parts += [T.partial_decrypt_main(ctx, sk, ct, keys[1 + i])
              for i, sk in enumerate(sks[1:])]
    want = np.asarray(T.fuse_decrypt(ctx, parts, ct.scale))
    stacked_keys = T.stack_keys(keys)
    got = np.asarray(T.threshold_decrypt(ctx, sec, ct, stacked_keys))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(got, v, atol=2e-3)
    # per-party shares identical too
    stacked = np.asarray(
        T.partial_decrypt_stacked(ctx, sec, ct, stacked_keys))
    for i in range(PARTIES):
        np.testing.assert_array_equal(stacked[i], np.asarray(parts[i]))


def test_batched_relin_matches_two_round_ceremony():
    p = P.make_params(batch=128, scale_bits=40, mult_depth=2, ring_dim=N)
    ctx = P.make_context(p)
    sks, pk = T.multiparty_keygen(ctx, PARTIES, seed=11)
    sec, _ = T.multiparty_keygen_batched(ctx, PARTIES, seed=11)
    rlk_seq = T.multiparty_relin_key(ctx, sks, common_seed=5, seed=11)
    rlk_bat = T.multiparty_relin_key_batched(ctx, sec, common_seed=5,
                                             seed=11)
    np.testing.assert_array_equal(np.asarray(rlk_bat.b),
                                  np.asarray(rlk_seq.b))
    np.testing.assert_array_equal(np.asarray(rlk_bat.a),
                                  np.asarray(rlk_seq.a))
    np.testing.assert_array_equal(np.asarray(rlk_bat.b_shoup),
                                  np.asarray(rlk_seq.b_shoup))


def test_batched_galois_matches_shares(setup):
    ctx, sks, pk = setup
    sec, _ = T.multiparty_keygen_batched(ctx, PARTIES, seed=3)
    g = KS.galois_element(1, N)
    shares = [T.partial_galois_key(ctx, sk, g, common_seed=77,
                                   rng_key=jax.random.key(40 + i))
              for i, sk in enumerate(sks)]
    gk_seq = T.combine_switch_key_shares(ctx, shares)
    gk_bat = T.multiparty_galois_key_batched(
        ctx, sec, g, 77,
        T.stack_keys([jax.random.key(40 + i) for i in range(PARTIES)]))
    np.testing.assert_array_equal(np.asarray(gk_bat.b),
                                  np.asarray(gk_seq.b))
    np.testing.assert_array_equal(np.asarray(gk_bat.a),
                                  np.asarray(gk_seq.a))
