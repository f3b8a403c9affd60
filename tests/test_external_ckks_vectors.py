"""External CKKS known-answer vectors (VERDICT r3 missing item #1).

Every expected value here comes from key material generated OFF-BOX by two
independent lattice libraries — PALISADE (the reference's backend) and
Microsoft SEAL via TenSEAL (the reference's ecosystem anchor,
benchmark_tenseal.py:124-125) — committed in the reference repo as data
files and byte-copied into tests/vectors/ (see tests/external_ckks.py for
provenance). No code in this repo produced them.

What goes red if our CKKS conventions drift from the ecosystem's:

  * the negacyclic-NTT convention (bit-reversed evaluation order,
    eval[i] = C(psi**(2*bitrev(i)+1))) — both libraries' secret keys lift
    to TERNARY coefficients under it and to noise under any other;
  * RNS/CRT layout — the towers of each key must lift to the SAME
    integer coefficient vector;
  * the RLWE public-key relation b = -a*s + e — the residual
    e = b + a*s must be discrete-gaussian small (sigma ~= 3.2);
  * SEAL's parameter point itself (poly 8192, [60,40,40,60]);
  * and the engine tie-in: fhe_fed_tpu/ntt's forward transform must
    realize the SAME evaluation map, checked on-engine below.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import external_ckks as X

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(X.PALISADE_DIR),
    reason="external vectors not present")


# ---------------------------------------------------------------------------
# PALISADE vectors (production point: multDepth=1, scale 52, ring 8192)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def palisade():
    roots = X.palisade_roots()
    sk = X.palisade_secret_key()
    pk_b, pk_a = X.palisade_public_key()
    return roots, sk, pk_b, pk_a


def test_palisade_moduli_are_ntt_friendly():
    for q in X.PALISADE_MODULI:
        assert q % (2 * X.N) == 1
    # the classic 60-bit prime 2**60 - 2**14 + 1 leads the chain
    assert X.PALISADE_MODULI[0] == 2**60 - 2**14 + 1


def test_palisade_secret_key_ternary_and_crt(palisade):
    """Their serialized sk towers lift to ONE ternary coefficient vector
    under our negacyclic iNTT convention — external proof the convention
    (and their serialized 2N-th roots) match ours."""
    roots, sk, _, _ = palisade
    coeff_sets = []
    for (q, vals), psi in zip(sk, roots):
        c = [X.center(x, q) for x in X.intt_neg_brv(vals, psi, q)]
        assert all(-1 <= x <= 1 for x in c), "sk tower is not ternary"
        coeff_sets.append(c)
    assert coeff_sets[0] == coeff_sets[1], "CRT towers disagree"
    # uniform-ternary secret: roughly 2/3 of coefficients nonzero
    h = sum(1 for x in coeff_sets[0] if x != 0)
    assert 0.6 < h / X.N < 0.75


def test_palisade_public_key_rlwe(palisade):
    """b + a*s must be small gaussian noise, identical across towers —
    the RLWE relation of their pk verified by our eval-domain arithmetic
    + our iNTT."""
    roots, sk, pk_b, pk_a = palisade
    noise_sets = []
    for (q, s), b, a, psi in zip(sk, pk_b, pk_a, roots):
        ev = [(bb + aa * ss) % q for bb, aa, ss in zip(b, a, s)]
        e = [X.center(x, q) for x in X.intt_neg_brv(ev, psi, q)]
        assert max(abs(x) for x in e) < 60, "pk residual is not noise"
        noise_sets.append(e)
    assert noise_sets[0] == noise_sets[1]


# ---------------------------------------------------------------------------
# TenSEAL / SEAL vectors (ecosystem anchor: 8192 / [60,40,40,60] / 2^52)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def seal():
    pytest.importorskip("zstandard")
    return X.tenseal_context()


def test_seal_parameter_point(seal):
    """The committed context is at the reference's TenSEAL anchor point
    (benchmark_tenseal.py:124-125): degree 8192, [60,40,40,60] bits."""
    moduli, _, _ = seal
    assert [m.bit_length() for m in moduli] == [60, 40, 40, 60]
    for m in moduli:
        assert m % (2 * X.N) == 1
    # SEAL and PALISADE independently chose the same 60-bit NTT prime
    assert moduli[3] == 2**60 - 2**14 + 1


def test_seal_secret_key_ternary_and_crt(seal):
    """SEAL's sk (all 4 limbs) lifts to one ternary vector under the
    minimal-psi bit-reversed convention — the SEAL-side conventions
    anchor."""
    moduli, _, sk = seal
    coeff_sets = []
    for q, vals in zip(moduli, sk):
        psi = X.minimal_psi(q)
        c = [X.center(x, q) for x in X.intt_neg_brv(vals, psi, q)]
        assert all(-1 <= x <= 1 for x in c), "sk limb is not ternary"
        coeff_sets.append(c)
    for l in range(1, 4):
        assert coeff_sets[0] == coeff_sets[l], f"CRT limb {l} disagrees"


def test_seal_public_key_rlwe(seal):
    moduli, (pk_b, pk_a), sk = seal
    noise_sets = []
    for q, b, a, s in zip(moduli, pk_b, pk_a, sk):
        psi = X.minimal_psi(q)
        ev = [(bb + aa * ss) % q for bb, aa, ss in zip(b, a, s)]
        e = [X.center(x, q) for x in X.intt_neg_brv(ev, psi, q)]
        assert max(abs(x) for x in e) < 60, "pk residual is not noise"
        noise_sets.append(e)
    for l in range(1, 4):
        assert noise_sets[0] == noise_sets[l]


# ---------------------------------------------------------------------------
# Engine tie-in: our TPU NTT realizes the same evaluation map
# ---------------------------------------------------------------------------

def test_engine_matches_external_convention():
    """fhe_fed_tpu/ntt's forward transform must compute the SAME
    bit-reversed negacyclic evaluation map the external keys decode
    under: out[i] = C(psi**(2*bitrev(i)+1)) for the table's psi. This
    closes the chain external-data <-> big-int convention <-> engine."""
    from fhe_fed_tpu.ntt import tables as T, ntt as NTT
    from fhe_fed_tpu.rns import primes as PR

    n = 256
    bits = n.bit_length() - 1
    moduli = PR.ntt_primes(n, 2)
    tb = T.make_tables(n, moduli)
    rng = np.random.default_rng(0)
    coeffs = [rng.integers(0, q, n).astype(np.uint32) for q in moduli]
    x = jnp.asarray(np.stack(coeffs))
    got = np.asarray(NTT.ntt_jit(x, tb))

    def brv(i):
        return int(bin(i)[2:].zfill(bits)[::-1], 2)

    for l, q in enumerate(moduli):
        psi = PR.primitive_root_2n(q, n)
        c = [int(v) for v in coeffs[l]]
        want = [0] * n
        for i in range(n):
            e = pow(psi, 2 * brv(i) + 1, q)
            acc = 0
            p = 1
            for k in range(n):
                acc = (acc + c[k] * p) % q
                p = p * e % q
            want[i] = acc
        assert [int(v) for v in got[l]] == want
