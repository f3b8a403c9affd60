"""Mesh-sharded aggregation on the virtual 8-device CPU mesh: the fused
weighted sum with the client axis psum'd across devices must match the
single-device path bit-exactly (SURVEY.md §5.8 checklist: clients + chunks
mesh axes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fhe_fed_tpu.ckks import params as P
from fhe_fed_tpu.ckks import keys as K
from fhe_fed_tpu.ckks import ops as O
from fhe_fed_tpu.ckks import encoding as E
from fhe_fed_tpu.parallel import mesh as M


@pytest.fixture(scope="module")
def setup():
    p = P.make_params(batch=128, scale_bits=40, mult_depth=1, ring_dim=256)
    ctx = P.make_context(p)
    sk, pk = K.keygen(ctx, seed=11)
    return ctx, sk, pk


def _stack_and_weights(ctx, pk, n_clients, chunks, seed=0):
    rng = np.random.default_rng(seed)
    data = [rng.random((chunks, 256)).astype(np.float32)
            for _ in range(n_clients)]
    cts = [O.encrypt(ctx, pk, jnp.asarray(d), jax.random.key(100 + i))
           for i, d in enumerate(data)]
    weights = [1.0 / n_clients] * n_clients
    return data, cts, weights


def test_sharded_weighted_sum_matches_local(setup):
    ctx, sk, pk = setup
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    n_clients, chunks = 4, 8
    data, cts, weights = _stack_and_weights(ctx, pk, n_clients, chunks)

    # Local (single-device) reference result.
    agg_local = O.weighted_sum(ctx, cts, weights)

    # Sharded: mesh (clients=2, chunks=4).
    mesh = M.make_fed_mesh(2, 4)
    live = ctx.params.chain_len
    ds = float(ctx.params.moduli[live - 1])
    import numpy as _np
    res_l, shoup_l = [], []
    for w in weights:
        r, s = E.encode_scalar(ctx.params.moduli[:live], w, ds)
        res_l.append(r)
        shoup_l.append(s)
    stacked = jnp.stack([c.data for c in cts])
    stacked = jax.device_put(stacked, M.ct_sharding(mesh))
    agg_fn = M.sharded_weighted_sum(ctx, mesh)
    out = agg_fn(stacked, jnp.asarray(_np.stack(res_l)),
                 jnp.asarray(_np.stack(shoup_l)))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(agg_local.data))

    # And it decrypts to the right average.
    ct = O.Ciphertext(data=jnp.asarray(np.asarray(out)),
                      scale=agg_local.scale, level=agg_local.level)
    got = np.asarray(O.decrypt(ctx, sk, ct))
    want = sum(w * d for w, d in zip(weights, data))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_modsum_many_clients(setup):
    """64 clients through the 16-bit split reduction — no overflow."""
    ctx, sk, pk = setup
    rng = np.random.default_rng(3)
    n_clients = 64
    data = [rng.random((1, 256)).astype(np.float32) for _ in range(n_clients)]
    cts = [O.encrypt(ctx, pk, jnp.asarray(d), jax.random.key(i))
           for i, d in enumerate(data)]
    weights = [1.0 / n_clients] * n_clients
    agg = O.weighted_sum(ctx, cts, weights)
    got = np.asarray(O.decrypt(ctx, sk, agg))
    want = sum(w * d for w, d in zip(weights, data))
    np.testing.assert_allclose(got, want, atol=2e-4)
