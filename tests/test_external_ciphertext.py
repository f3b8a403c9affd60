"""Externally-generated CIPHERTEXTS: forensic parse + decryption finding.

VERDICT r4 missing item #1 asked for an externally-generated ciphertext
decrypted by this engine, pointing at the reference's committed
`tenseal_model.pickle` (SEAL-serialized CKKS ciphertexts of its
Linear(100,1) model, plaintext counterpart `model.pickle`) and the
context committed WITH its secret key (`context.pickle`,
tenseal_test.py:16-18). "If the ciphertext proves to be from a different
context instance (sk mismatch), commit the forensic finding and the
structural assertions instead — but look first."

We looked. The finding, proven by the tests below:

  * The SEAL ciphertexts parse completely and are exactly at the
    reference's anchor point (degree 8192, 3 live moduli of the
    [60,40,40,60] chain, scale 2**52, NTT form, 2 polys)
    — test_tenseal_model_ciphertext_structure.
  * The decryption PIPELINE (parse -> c0 + c1*s in the eval domain ->
    iNTT under the minimal-psi bit-reversed convention -> CRT) is sound:
    fed the committed pk instead of a ciphertext, the identical code
    path yields the discrete-gaussian RLWE residual
    — test_decryption_pipeline_control.
  * Fed the committed ciphertexts, the same path yields UNIFORM residues
    mod Q under both decryption sign conventions: the committed context
    does NOT hold the key that encrypted tenseal_model.pickle
    — test_committed_context_cannot_decrypt_model_ct. This is expected
    from the writers: tenseal_test.py:8-18 and benchmark_tenseal.py's
    context() (:123-128) each construct a FRESH ts.context() per run, so
    the committed context and the committed ciphertexts came from
    different keygen instances.
  * The mismatch is ecosystem-wide in the reference: its three committed
    PALISADE key files carry three pairwise-distinct key tags, and the
    orphan relinearization key (key-eval-mult.txt) belongs to a FOURTH
    instance at a different ring dimension (16384) for which no secret
    key is committed — test_palisade_key_tags_prove_no_matching_pair,
    test_evalmult_key_structure.

Conclusion: no committed (external ciphertext, external secret key) pair
exists anywhere in the reference repo; the chain external-ct -> external
sk -> external expected value is unclosable with committed artifacts.
What IS closable — and closed here and in test_external_ckks_vectors.py —
is every relation the committed material supports: sk ternary lift, pk
RLWE residual, ciphertext wire structure, and the expected plaintext
(model.pickle parses to the Linear(100,1) weights without torch).
"""

import os

import numpy as np
import pytest

import external_ckks as X

pytestmark = pytest.mark.skipif(
    not os.path.exists(X.TENSEAL_MODEL_PICKLE),
    reason="external ciphertext vectors not present")


@pytest.fixture(scope="module")
def seal_ctx():
    pytest.importorskip("zstandard")
    return X.tenseal_context()


@pytest.fixture(scope="module")
def model_cts():
    pytest.importorskip("zstandard")
    return X.tenseal_model_ciphertexts()


# ---------------------------------------------------------------------------
# Structure KATs
# ---------------------------------------------------------------------------

def test_tenseal_model_ciphertext_structure(seal_ctx, model_cts):
    """Both SEAL ciphertexts parse to the reference's exact TenSEAL anchor
    configuration (benchmark_tenseal.py:124-125) and carry residues
    bounded by the committed context's moduli."""
    moduli, _, _ = seal_ctx
    assert set(model_cts) == {"weight", "bias"}
    pids = set()
    for name, ct in model_cts.items():
        assert ct["degree"] == X.N
        assert ct["coeff_mod_size"] == 3          # first (data) level
        assert ct["is_ntt"] == 1                  # SEAL keeps CKKS in NTT
        assert ct["scale"] == 2.0**52             # global_scale
        assert len(ct["polys"]) == 2              # fresh (c0, c1)
        for pol in ct["polys"]:
            for l in range(3):
                assert max(pol[l]) < moduli[l]
        pids.add(ct["parms_id"])
    # both were encrypted at the same parameter level of the same params
    assert len(pids) == 1
    assert model_cts["weight"]["size"] == 100
    assert model_cts["bias"]["size"] == 1


def test_expected_plaintext_is_linear_model():
    """model.pickle parses (without torch) to the Linear(100,1) weights —
    the reference zoo's first model (benchmark.py:50-53, 101 params)."""
    w = X.reference_model_weights()
    assert w["weight"].shape == (100,)
    assert w["bias"].shape == (1,)
    assert np.all(np.isfinite(w["weight"]))
    # torch Linear init: U(-1/sqrt(100), 1/sqrt(100))
    assert np.abs(w["weight"]).max() <= 0.1
    assert np.abs(w["bias"]).max() <= 0.1


# ---------------------------------------------------------------------------
# The decryption finding
# ---------------------------------------------------------------------------

def _dec_limb(ct_or_pk0, c1, s, q, sign):
    ev = [(a + sign * b * ss) % q for a, b, ss in zip(ct_or_pk0, c1, s)]
    psi = X.minimal_psi(q)
    return [X.center(x, q) for x in X.intt_neg_brv(ev, psi, q)]


def test_decryption_pipeline_control(seal_ctx):
    """Control: the exact decrypt code path applied to the committed pk
    (b + a*s) yields the small gaussian RLWE residual — parser, moduli,
    NTT convention and secret key are all sound."""
    moduli, (pk_b, pk_a), sk = seal_ctx
    res = []
    for l in (1, 2):                       # the two 40-bit limbs
        e = _dec_limb(pk_b[l], pk_a[l], sk[l], moduli[l], +1)
        assert max(abs(x) for x in e) < 60
        res.append(e)
    assert res[0] == res[1]                # CRT-consistent integer


def test_committed_context_cannot_decrypt_model_ct(seal_ctx, model_cts):
    """THE FINDING: c0 + c1*s (and c0 - c1*s) under the committed sk
    lifts to uniform residues mod Q — not a noisy plaintext. The
    committed context is a different keygen instance than the one that
    encrypted tenseal_model.pickle (both writers construct fresh
    contexts: tenseal_test.py:8, benchmark_tenseal.py:123-128)."""
    moduli, _, sk = seal_ctx
    c0, c1 = model_cts["weight"]["polys"]
    q1, q2 = moduli[1], moduli[2]
    Q = q1 * q2
    for sign in (+1, -1):
        t1 = _dec_limb(c0[1], c1[1], sk[1], q1, sign)
        t2 = _dec_limb(c0[2], c1[2], sk[2], q2, sign)
        # CRT-combine a sample of coefficients; a valid decryption would
        # give |coeff| ~ 2**52 * |w| + noise << Q/8 ~ 2**77
        m1 = (Q // q1) * pow(Q // q1 % q1, q1 - 2, q1)
        m2 = (Q // q2) * pow(Q // q2 % q2, q2 - 2, q2)
        mx = 0
        for j in range(0, X.N, 32):
            x = (t1[j] % q1 * m1 + t2[j] % q2 * m2) % Q
            if x > Q // 2:
                x -= Q
            mx = max(mx, abs(x))
        assert mx > Q // 8, (
            "ciphertext unexpectedly decrypted — key match after all?")


# ---------------------------------------------------------------------------
# PALISADE: three committed instances, no (ct, sk) pair either
# ---------------------------------------------------------------------------

def test_palisade_key_tags_prove_no_matching_pair():
    """The reference's PALISADE material spans THREE keygen instances
    (clear-text CEREAL key tags): code/resources sk+pk (one tag), the
    pybind resources sk+pk (another), and the orphan relin key a third —
    so the relin key (the only PALISADE ciphertext-like object committed)
    has no committed secret key to decrypt it with."""
    code_tag = X.palisade_key_tag(
        os.path.join(X.PALISADE_DIR, "key-private.txt"))
    assert code_tag == X.palisade_key_tag(
        os.path.join(X.PALISADE_DIR, "key-public.txt"))
    pyb_tag = X.palisade_key_tag(
        os.path.join(X.PYBIND_DIR, "key-private.txt"))
    assert pyb_tag == X.palisade_key_tag(
        os.path.join(X.PYBIND_DIR, "key-public.txt"))
    relin_tag = X.palisade_key_tag(
        os.path.join(X.PYBIND_DIR, "key-eval-mult.txt"))
    assert len({code_tag, pyb_tag, relin_tag}) == 3


def test_pybind_instance_secret_key_ternary():
    """The second committed PALISADE instance (pybind resources) ALSO
    lifts to a ternary sk under this repo's convention and the roots
    serialized in ITS cryptocontext — breadth for the convention
    anchor."""
    roots = X.palisade_roots(X.PYBIND_DIR)
    sk = X.palisade_secret_key(X.PYBIND_DIR)
    coeff_sets = []
    for (q, vals), psi in zip(sk, roots):
        c = [X.center(x, q) for x in X.intt_neg_brv(vals, psi, q)]
        assert all(-1 <= x <= 1 for x in c)
        coeff_sets.append(c)
    assert coeff_sets[0] == coeff_sets[1]


def test_pybind_instance_public_key_rlwe():
    roots = X.palisade_roots(X.PYBIND_DIR)
    sk = X.palisade_secret_key(X.PYBIND_DIR)
    pk_b, pk_a = X.palisade_public_key(X.PYBIND_DIR)
    noise_sets = []
    for (q, s), b, a, psi in zip(sk, pk_b, pk_a, roots):
        ev = [(bb + aa * ss) % q for bb, aa, ss in zip(b, a, s)]
        e = [X.center(x, q) for x in X.intt_neg_brv(ev, psi, q)]
        assert max(abs(x) for x in e) < 60
        noise_sets.append(e)
    assert noise_sets[0] == noise_sets[1]


def test_evalmult_key_structure():
    """Forensic structure of the orphan relin key: 20 tower polynomials
    = 4 DCRTPoly rows (b/a of a 2-digit HYBRID key-switch key) over a
    5-tower chain [60, 52, 53 | 60, 60] bits at ring dim 16384 — each
    header's serialized root verifying pow(root, N, q) == q-1, each
    block a full set of in-range residues. A different (larger) context
    than every other committed artifact, keyed by a fourth instance."""
    regions = X.evalmult_key_regions()
    assert len(regions) == 20
    chain = [q for q, _, _ in regions[:5]]
    assert [q.bit_length() for q in chain] == [60, 52, 53, 60, 60]
    for g in range(4):
        assert [q for q, _, _ in regions[5 * g:5 * g + 5]] == chain
    for q, root, vals in regions:
        assert q % (2 * X.EVALMULT_N) == 1
        assert pow(root, X.EVALMULT_N, q) == q - 1
        assert len(vals) == X.EVALMULT_N
        assert int(vals.max()) < q
        # uniform residues, not structured data
        assert int(vals.max()) > q // 2
        assert int(vals.min()) < q // 512
