"""Fused Pallas decode: bit-identical to the XLA decode path.

decode_core is the single source of the decode arithmetic; the Pallas
kernel (ckks/pallas_decode.py) must produce exactly the same f32 outputs
(same exact-integer CRT, same two-float division), including the padded
batch path and the noise-overflow -> inf behavior contract.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # opt-in kernel (FHE_FED_TPU_FUSED_DECODE); default decode covered by test_ckks
import jax
import jax.numpy as jnp

from fhe_fed_tpu.ckks import params as P, keys as K, ops as O
from fhe_fed_tpu.ckks import encoding as E
from fhe_fed_tpu.ckks import pallas_decode as PD


@pytest.mark.parametrize("chunks", [1, 3, 16])
def test_fused_decode_matches_core(chunks):
    params = P.make_params(batch=128, scale_bits=40, mult_depth=1,
                           ring_dim=256)
    ctx = P.make_context(params)
    sk, pk = K.keygen(ctx, seed=0)
    rng = np.random.default_rng(chunks)
    v = jnp.asarray(rng.standard_normal((chunks, 256)).astype(np.float32))
    ct = O.encrypt_symmetric(ctx, sk, v, jax.random.key(1))
    res = O.decrypt_residues(ctx, sk, ct)
    live = res.shape[-2]
    dc = ctx.dec_consts[live - 1]
    want = np.asarray(E.decode_core(dc, ctx.q[:live], res, ct.scale))
    got = np.asarray(PD.decode_fused(ctx, dc, res, ct.scale))
    np.testing.assert_array_equal(got, want)
    # and it actually decodes correctly
    np.testing.assert_allclose(got, np.asarray(v), atol=1e-4)


def test_fused_decode_after_weighted_sum():
    """Through the aggregate path (scale = Delta * q_top) — the headline
    decrypt shape."""
    params = P.make_params(batch=128, scale_bits=40, mult_depth=1,
                           ring_dim=256)
    ctx = P.make_context(params)
    sk, pk = K.keygen(ctx, seed=1)
    rng = np.random.default_rng(9)
    vals = jnp.asarray(rng.standard_normal((3, 4, 256)).astype(np.float32))
    ct = O.encrypt_symmetric_stacked(ctx, sk, vals, jax.random.key(2))
    agg = O.weighted_sum(ctx, ct, [0.5, 0.2, 0.3])
    res = O.decrypt_residues(ctx, sk, agg)
    live = res.shape[-2]
    dc = ctx.dec_consts[live - 1]
    want = np.asarray(E.decode_core(dc, ctx.q[:live], res, agg.scale))
    got = np.asarray(PD.decode_fused(ctx, dc, res, agg.scale))
    np.testing.assert_array_equal(got, want)
    expect = np.tensordot([0.5, 0.2, 0.3], np.asarray(vals), axes=1)
    np.testing.assert_allclose(got, expect, atol=1e-4)
