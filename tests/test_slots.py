"""Canonical-embedding slot packing (ckks/slots.py) as a first-class,
tested encode mode — the reference's actual plaintext semantics
(MakeCKKSPackedPlaintext, ckks.cpp:80; mkhe.cpp:341-366): EvalMult(ct,ct)
acts elementwise on N/2 complex slots, Galois rotations shift slots
cyclically, conjugation maps each slot to its complex conjugate.

Covers (VERDICT r4 weak #2 / next-round #2):
  * encode/decode round-trip at the small test ring AND at the
    production point (ring 8192 / scale 2**52);
  * encrypted round-trip through the engine;
  * rotation parity with slot_rotation_map;
  * conjugation via the 2N-1 Galois element;
  * ct x ct acting elementwise on slots vs a numpy reference;
  * the user-facing CKKS(packing="slots") bytes surface end to end.
"""

import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fhe_fed_tpu.ckks import params as P
from fhe_fed_tpu.ckks import keys as K
from fhe_fed_tpu.ckks import ops as O
from fhe_fed_tpu.ckks import keyswitch as KS
from fhe_fed_tpu.ckks import slots as SL

N = 256


@pytest.fixture(scope="module")
def setup():
    p = P.make_params(batch=128, scale_bits=40, mult_depth=2, ring_dim=N)
    ctx = P.make_context(p)
    sk, pk = K.keygen(ctx, seed=5)
    return ctx, sk, pk


def _slots(ctx, rng, complex_=False):
    half = SL.num_slots(ctx)
    z = rng.standard_normal(half) * 0.25
    if complex_:
        z = z + 1j * rng.standard_normal(half) * 0.25
    return z


def test_encode_decode_round_trip(setup):
    ctx, _, _ = setup
    rng = np.random.default_rng(0)
    z = _slots(ctx, rng, complex_=True)
    pt = SL.encode_slots(ctx, z[None, :])
    assert pt.shape == (1, ctx.params.chain_len, N)
    back = SL.decode_slots(ctx, np.asarray(pt), ctx.params.scale)[0]
    assert np.max(np.abs(back - z)) < 1e-6


def test_encode_decode_production_point():
    """The production ring (8192, scale 2**52, the binding's defaults):
    f64 embedding precision stays well under CKKS noise scale."""
    p = P.make_params(batch=4096, scale_bits=52, mult_depth=1)
    ctx = P.make_context(p)
    assert ctx.ring_dim == 8192 and SL.num_slots(ctx) == 4096
    rng = np.random.default_rng(1)
    z = rng.standard_normal(4096) * 0.1
    pt = SL.encode_slots(ctx, z[None, :])
    back = SL.decode_slots(ctx, np.asarray(pt), ctx.params.scale)[0]
    assert np.max(np.abs(back.real - z)) < 1e-9
    assert np.max(np.abs(back.imag)) < 1e-9


def test_encrypted_round_trip(setup):
    ctx, sk, pk = setup
    rng = np.random.default_rng(2)
    z = _slots(ctx, rng, complex_=True)
    pt = SL.encode_slots(ctx, z[None, :])
    ct = O.encrypt_encoded(ctx, pk, pt, jax.random.key(3),
                           ctx.params.scale)
    res = O.decrypt_residues(ctx, sk, ct)
    back = SL.decode_slots(ctx, np.asarray(res), ct.scale)[0]
    assert np.max(np.abs(back - z)) < 1e-3


def test_rotation_matches_slot_map(setup):
    """rotate(ct, r) realizes slot_rotation_map: slot j -> old slot
    (j + r) mod N/2 (EvalAtIndex semantics, mkhe.cpp:122-124)."""
    ctx, sk, pk = setup
    rng = np.random.default_rng(3)
    z = _slots(ctx, rng)
    pt = SL.encode_slots(ctx, z[None, :])
    ct = O.encrypt_encoded(ctx, pk, pt, jax.random.key(4),
                           ctx.params.scale)
    for r in (1, 3, 17):
        g = KS.galois_element(r, N)
        gk = KS.make_galois_key(ctx, sk, g, jax.random.key(40 + r))
        rot = KS.rotate(ctx, ct, r, gk)
        res = O.decrypt_residues(ctx, sk, rot)
        got = SL.decode_slots(ctx, np.asarray(res), rot.scale)[0]
        want = z[SL.slot_rotation_map(N, r)]
        assert np.max(np.abs(got.real - want)) < 1e-3, f"r={r}"


def test_conjugation(setup):
    """The 2N-1 Galois element conjugates every slot."""
    ctx, sk, pk = setup
    rng = np.random.default_rng(4)
    z = _slots(ctx, rng, complex_=True)
    pt = SL.encode_slots(ctx, z[None, :])
    ct = O.encrypt_encoded(ctx, pk, pt, jax.random.key(5),
                           ctx.params.scale)
    g = KS.conj_element(N)
    gk = KS.make_galois_key(ctx, sk, g, jax.random.key(50))
    conj = O.Ciphertext(
        data=KS._rotate_impl(ctx, ct.data, gk, g),
        scale=ct.scale, level=ct.level)
    res = O.decrypt_residues(ctx, sk, conj)
    got = SL.decode_slots(ctx, np.asarray(res), conj.scale)[0]
    assert np.max(np.abs(got - np.conj(z))) < 1e-3


def test_ct_mult_is_elementwise_on_slots(setup):
    """EvalMult(ct, ct) + relinearize acts as elementwise slot product —
    the property coefficient packing does NOT have and the reason the
    reference uses the canonical embedding (ckks.cpp:80)."""
    ctx, sk, pk = setup
    rlk = KS.make_relin_key(ctx, sk, jax.random.key(17))
    rng = np.random.default_rng(6)
    za = _slots(ctx, rng)
    zb = _slots(ctx, rng)
    ct_a = O.encrypt_encoded(ctx, pk, SL.encode_slots(ctx, za[None, :]),
                             jax.random.key(7), ctx.params.scale)
    ct_b = O.encrypt_encoded(ctx, pk, SL.encode_slots(ctx, zb[None, :]),
                             jax.random.key(8), ctx.params.scale)
    prod = KS.mul_ct(ctx, ct_a, ct_b, rlk)
    prod = O.rescale(ctx, prod)
    res = O.decrypt_residues(ctx, sk, prod)
    got = SL.decode_slots(ctx, np.asarray(res), prod.scale)[0]
    assert np.max(np.abs(got.real - za * zb)) < 1e-2


def test_user_facing_slots_mode():
    """CKKS(packing="slots"): the reference-parity bytes surface runs the
    MakeCKKSPackedPlaintext semantics end to end — encrypt N/2-slot
    chunks, aggregate under encryption, decode through the embedding."""
    import fhe_fed_tpu as F
    h = F.CKKS("ckks", 4096, 52, cryptodir=tempfile.mkdtemp(),
               packing="slots")
    h.genCryptoContextAndKeyGen()
    h.loadCryptoParams()
    assert h.capacity == 4096           # N/2 slots at ring 8192
    rng = np.random.default_rng(9)
    dims = 5000                         # forces 2 chunks + tail rule
    v = [rng.standard_normal(dims).astype(np.float32) * 0.1
         for _ in range(3)]
    w = [0.5, 0.2, 0.3]
    agg = h.computeWeightedAverage([h.encrypt(x) for x in v], w)
    out = h.decrypt(agg, dims)
    want = sum(wi * x for wi, x in zip(w, v))
    assert out.shape == (dims,)
    assert np.max(np.abs(out - want)) < 1e-4
    # the cohort fast path is a coefficient-mode optimization
    with pytest.raises(ValueError):
        h.fedavg_round(v, w, dims)
    # wire safety: a slot-packed blob carries its own magic, so a
    # coefficient-mode helper refuses it instead of mis-decoding
    h_coeff = F.CKKS("ckks", 4096, 52, cryptodir=h.cryptodir)
    h_coeff.loadCryptoParams()
    slot_blob = h.encrypt(v[0])
    with pytest.raises(ValueError, match="packing mismatch"):
        h_coeff.decrypt(slot_blob, dims)
    with pytest.raises(ValueError, match="packing mismatch"):
        h.decrypt(h_coeff.encrypt(v[0]), dims)
