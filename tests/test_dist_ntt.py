"""Coefficient/limb-sharded NTT (ntt/dist.py) vs the on-chip transform.

Runs on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8). Production ring N=8192 with the
headline context's modulus chain — the exchange between butterfly stage
groups must be bit-exact, not approximately right (SURVEY.md §5.7-5.8).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from fhe_fed_tpu.rns import primes
from fhe_fed_tpu.ntt import tables as T, ntt as NTT, dist as D


N = 8192
MODULI = None  # filled by fixture


@pytest.fixture(scope="module")
def setup():
    moduli = primes.ntt_primes(N, 5)
    tb = T.make_tables(N, moduli)
    dt = D.make_dist_tables(N, moduli)
    return moduli, tb, dt


def _coeff_mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(8), ("coeff",))


def _limb_coeff_mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("limb", "coeff"))


def _rand_poly(moduli, shape_prefix=(2,)):
    rng = np.random.default_rng(42)
    return rng.integers(0, min(moduli),
                        size=(*shape_prefix, len(moduli), N)).astype(np.uint32)


def test_forward_matches_onchip(setup):
    moduli, tb, dt = setup
    ds = D.DistSpec(mesh=_coeff_mesh())
    x = _rand_poly(moduli)
    onchip = np.asarray(NTT.ntt(jnp.asarray(x), tb))
    got = np.asarray(jax.jit(lambda v: D.dist_ntt(v, dt, ds))(
        jnp.asarray(D.to_dist_coeff(x, dt.n1))))
    perm = D.eval_perm(N, dt.n1)
    want = onchip[..., perm].reshape(got.shape)
    assert np.array_equal(got, want)


def test_roundtrip_exact(setup):
    moduli, tb, dt = setup
    ds = D.DistSpec(mesh=_coeff_mesh())
    x = jnp.asarray(D.to_dist_coeff(_rand_poly(moduli), dt.n1))
    rt = jax.jit(lambda v: D.dist_intt(D.dist_ntt(v, dt, ds), dt, ds))(x)
    assert np.array_equal(np.asarray(rt), np.asarray(x))


@pytest.mark.slow  # also asserted bit-exact by dryrun_multichip phase (b)
def test_poly_mul_matches_onchip(setup):
    moduli, tb, dt = setup
    ds = D.DistSpec(mesh=_coeff_mesh())
    from fhe_fed_tpu.rns.modops import barrett_precompute, mul_mod
    a = _rand_poly(moduli, (1,))
    b = np.roll(a, 17, axis=-1) ^ 1
    b %= np.array(moduli, dtype=np.uint32)[None, :, None]
    mu = jnp.asarray(np.array([barrett_precompute(q) for q in moduli],
                              dtype=np.uint32))[:, None]
    # On-chip negacyclic product.
    ah = NTT.ntt(jnp.asarray(a), tb)
    bh = NTT.ntt(jnp.asarray(b), tb)
    q2 = jnp.asarray(np.array(moduli, np.uint32))[:, None]
    onchip = np.asarray(NTT.intt(mul_mod(ah, bh, q2, mu), tb))
    # Sharded product.
    f = jax.jit(lambda u, v: D.dist_poly_mul(u, v, dt, ds))
    got = np.asarray(f(jnp.asarray(D.to_dist_coeff(a, dt.n1)),
                       jnp.asarray(D.to_dist_coeff(b, dt.n1))))
    assert np.array_equal(D.from_dist_coeff(got), onchip)


def test_limb_and_coeff_axes(setup):
    """('limb','coeff') 2x4 mesh: limbs sharded, coefficients sharded, NTT
    still bit-exact, and the stage exchange lowers to an all-to-all."""
    moduli, tb, dt = setup
    ds = D.DistSpec(mesh=_limb_coeff_mesh(), limb_axis="limb")
    x = _rand_poly(moduli, (2,))
    xd = jnp.asarray(D.to_dist_coeff(x, dt.n1))
    f = jax.jit(lambda v: D.dist_ntt(v, dt, ds))
    got = np.asarray(f(xd))
    perm = D.eval_perm(N, dt.n1)
    want = np.asarray(NTT.ntt(jnp.asarray(x), tb))[..., perm].reshape(
        got.shape)
    assert np.array_equal(got, want)
    hlo = f.lower(xd).compile().as_text()
    assert "all-to-all" in hlo
    rt = jax.jit(lambda v: D.dist_intt(D.dist_ntt(v, dt, ds), dt, ds))(xd)
    assert np.array_equal(np.asarray(rt), np.asarray(xd))


def test_dist_decrypt_matches_onchip(setup):
    """Encrypt on one chip, move the ciphertext to the sharded layout, and
    decrypt entirely under the ('limb','coeff') sharding: phase = c0 + c1*s
    (eval-domain, elementwise) -> dist_intt -> decode."""
    from fhe_fed_tpu.ckks import params as P, keys as K, ops as O
    from fhe_fed_tpu.ckks import encoding as E
    from fhe_fed_tpu.rns import modops

    params = P.make_params(batch=4096, scale_bits=52, mult_depth=1)
    assert params.ring_dim == N
    ctx = P.make_context(params)
    sk, pk = K.keygen(ctx, seed=3)
    dt = D.make_dist_tables(N, params.moduli[:params.chain_len])
    ds = D.DistSpec(mesh=_limb_coeff_mesh(), limb_axis="limb")

    rng = np.random.default_rng(5)
    vals = rng.standard_normal((2, N)).astype(np.float32)
    ct = O.encrypt_symmetric(ctx, sk, jnp.asarray(vals), jax.random.key(9))
    want = np.asarray(O.decrypt(ctx, sk, ct))

    live = ct.live_limbs
    ct_dist = jnp.asarray(D.eval_to_dist(np.asarray(ct.data), dt.n1))
    s_dist = jnp.asarray(D.eval_to_dist(np.asarray(sk.s[:live]), dt.n1))
    s_sh_dist = jnp.asarray(D.eval_to_dist(np.asarray(sk.s_shoup[:live]),
                                           dt.n1))
    q3 = dt.q.reshape(-1, 1, 1)

    @jax.jit
    def dist_decrypt(ctd, s, s_sh):
        phase = modops.add_mod(
            ctd[:, 0], modops.mul_mod_shoup(ctd[:, 1], s, s_sh, q3), q3)
        coeffs = D.dist_intt(phase, dt, ds)
        return E.decode_coeff(ctx, D.from_dist_coeff(coeffs), ct.scale)

    got = np.asarray(dist_decrypt(ct_dist, s_dist, s_sh_dist))
    assert np.array_equal(got, want)
