"""Fused Pallas weighted-sum kernel vs the XLA 16-bit split reduction."""

import numpy as np
import jax.numpy as jnp

from fhe_fed_tpu.ckks import params as P
from fhe_fed_tpu.ckks import ops as O
from fhe_fed_tpu.ckks import encoding as E
from fhe_fed_tpu.ckks import pallas_agg


def test_weighted_sum_fused_matches_xla():
    p = P.make_params(batch=128, scale_bits=40, mult_depth=1, ring_dim=256)
    ctx = P.make_context(p)
    live = p.chain_len
    K, chunks, n = 3, 5, p.ring_dim
    rng = np.random.default_rng(0)
    q = np.asarray(ctx.q[:live], dtype=np.uint64)
    stacked = jnp.asarray(
        (rng.integers(0, 1 << 32, size=(K, chunks, 2, live, n),
                      dtype=np.uint64) % q[None, None, None, :, None]
         ).astype(np.uint32))
    ds = float(p.moduli[live - 1])
    res_l, shoup_l = zip(*(E.encode_scalar(p.moduli[:live], w, ds)
                           for w in [0.5, 0.2, 0.3]))
    wr = jnp.asarray(np.stack(res_l))
    ws = jnp.asarray(np.stack(shoup_l))
    want = O._weighted_sum_impl(ctx, stacked, wr, ws)
    got = pallas_agg.weighted_sum_fused(stacked, wr, ws,
                                        ctx.q[:live, None], interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_weighted_sum_fused_odd_batch():
    p = P.make_params(batch=128, scale_bits=40, mult_depth=1, ring_dim=256)
    ctx = P.make_context(p)
    live = p.chain_len
    K, chunks, n = 2, 9, p.ring_dim   # 2*9=18 rows: not a multiple of 16
    rng = np.random.default_rng(1)
    q = np.asarray(ctx.q[:live], dtype=np.uint64)
    stacked = jnp.asarray(
        (rng.integers(0, 1 << 32, size=(K, chunks, 2, live, n),
                      dtype=np.uint64) % q[None, None, None, :, None]
         ).astype(np.uint32))
    ds = float(p.moduli[live - 1])
    res_l, shoup_l = zip(*(E.encode_scalar(p.moduli[:live], w, ds)
                           for w in [0.7, 0.3]))
    wr = jnp.asarray(np.stack(res_l))
    ws = jnp.asarray(np.stack(shoup_l))
    want = O._weighted_sum_impl(ctx, stacked, wr, ws)
    got = pallas_agg.weighted_sum_fused(stacked, wr, ws,
                                        ctx.q[:live, None], interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
