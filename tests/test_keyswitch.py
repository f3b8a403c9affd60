"""Key switching: relinearized ct x ct multiply against a negacyclic
convolution oracle, Galois rotation against a coefficient-permutation
oracle, depth-2 rescale chains (reference parity surface: EvalMult /
Relinearize / EvalAtIndex, mkhe.cpp:122-124, 363-371)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fhe_fed_tpu.ckks import params as P
from fhe_fed_tpu.ckks import keys as K
from fhe_fed_tpu.ckks import ops as O
from fhe_fed_tpu.ckks import keyswitch as KS

N = 256


@pytest.fixture(scope="module")
def setup():
    p = P.make_params(batch=128, scale_bits=40, mult_depth=2, ring_dim=N)
    ctx = P.make_context(p)
    sk, pk = K.keygen(ctx, seed=5)
    rlk = KS.make_relin_key(ctx, sk, jax.random.key(17))
    return ctx, sk, pk, rlk


def negacyclic_conv(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact-enough f64 oracle for X^N + 1 polynomial multiplication."""
    n = len(a)
    full = np.convolve(a.astype(np.float64), b.astype(np.float64))
    out = full[:n].copy()
    out[: n - 1] -= full[n:]
    return out


def auto_coeff(v: np.ndarray, g: int) -> np.ndarray:
    """Coefficient-domain oracle for X -> X**g on the message polynomial."""
    n = len(v)
    out = np.zeros_like(v, dtype=np.float64)
    for k in range(n):
        e = k * g % (2 * n)
        if e < n:
            out[e] += v[k]
        else:
            out[e - n] -= v[k]
    return out


def test_mul_relin_matches_convolution(setup):
    ctx, sk, pk, rlk = setup
    rng = np.random.default_rng(0)
    a = (rng.random((2, N)).astype(np.float32) - 0.5) / 8
    b = (rng.random((2, N)).astype(np.float32) - 0.5) / 8
    ct_a = O.encrypt(ctx, pk, jnp.asarray(a), jax.random.key(1))
    ct_b = O.encrypt(ctx, pk, jnp.asarray(b), jax.random.key(2))

    prod = KS.mul_ct(ctx, ct_a, ct_b, rlk)
    assert prod.scale == ct_a.scale * ct_b.scale
    got = np.asarray(O.decrypt(ctx, sk, prod))
    want = np.stack([negacyclic_conv(a[i], b[i]) for i in range(2)])
    np.testing.assert_allclose(got, want, atol=5e-4)

    # Rescale brings the scale back near Delta and drops one limb.
    rs = O.rescale(ctx, prod)
    assert rs.live_limbs == prod.live_limbs - 1
    got_rs = np.asarray(O.decrypt(ctx, sk, rs))
    np.testing.assert_allclose(got_rs, want, atol=5e-4)


def test_depth2_mult_chain(setup):
    """(a*b)*c with rescale between levels — exercises level-agnostic evk."""
    ctx, sk, pk, rlk = setup
    rng = np.random.default_rng(7)
    vecs = [(rng.random((1, N)).astype(np.float32) - 0.5) / 16
            for _ in range(3)]
    cts = [O.encrypt(ctx, pk, jnp.asarray(v), jax.random.key(10 + i))
           for i, v in enumerate(vecs)]

    ab = O.rescale(ctx, KS.mul_ct(ctx, cts[0], cts[1], rlk))
    # Level-match c by a scalar mult at the same prime + rescale.
    c_lvl = O.rescale(ctx, O.mul_scalar(ctx, cts[2], 1.0))
    abc = O.rescale(ctx, KS.mul_ct(ctx, ab, c_lvl, rlk))

    got = np.asarray(O.decrypt(ctx, sk, abc))[0]
    want = negacyclic_conv(negacyclic_conv(vecs[0][0], vecs[1][0]),
                           vecs[2][0])
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_rotation_automorphism(setup):
    ctx, sk, pk, rlk = setup
    rng = np.random.default_rng(3)
    v = rng.random((1, N)).astype(np.float32) - 0.5
    ct = O.encrypt(ctx, pk, jnp.asarray(v), jax.random.key(4))

    for r in (1, 3):
        g = KS.galois_element(r, N)
        gk = KS.make_galois_key(ctx, sk, g, jax.random.key(20 + r))
        rot = KS.rotate(ctx, ct, r, gk)
        got = np.asarray(O.decrypt(ctx, sk, rot))[0]
        want = auto_coeff(v[0].astype(np.float64), g)
        np.testing.assert_allclose(got, want, atol=5e-4)


def test_conjugation_key(setup):
    """g = 2N-1 (complex conjugate element) through the same machinery."""
    ctx, sk, pk, rlk = setup
    rng = np.random.default_rng(9)
    v = rng.random((1, N)).astype(np.float32) - 0.5
    ct = O.encrypt(ctx, pk, jnp.asarray(v), jax.random.key(6))
    g = KS.conj_element(N)
    gk = KS.make_galois_key(ctx, sk, g, jax.random.key(31))
    data = KS._rotate_impl(ctx, ct.data, gk, g)
    out = O.Ciphertext(data=data, scale=ct.scale, level=ct.level)
    got = np.asarray(O.decrypt(ctx, sk, out))[0]
    want = auto_coeff(v[0].astype(np.float64), g)
    np.testing.assert_allclose(got, want, atol=5e-4)
