"""Multi-host runtime layer on the virtual 8-device pod: pod_mesh axis
layout, the no-gather host feed, and an end-to-end sharded FedAvg round
through host_client_array (SURVEY.md §5.8)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fhe_fed_tpu.ckks import params as PM
from fhe_fed_tpu.ckks import keys as K
from fhe_fed_tpu.ckks import ops as O
from fhe_fed_tpu.ckks import encoding as E
from fhe_fed_tpu.parallel import multihost as MH
from fhe_fed_tpu.parallel import mesh as mesh_mod

RING = 256


def test_init_distributed_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert MH.init_distributed() is False


def test_pod_mesh_axis_inference():
    m = MH.pod_mesh({"clients": 2, "chunks": -1})
    assert m.devices.shape == (2, 4)
    assert m.axis_names == ("clients", "chunks")
    # clients is the MAJOR axis: consecutive devices differ along chunks
    assert m.devices[0, 0].id != m.devices[0, 1].id
    m3 = MH.pod_mesh({"clients": 2, "limb": 2, "coeff": 2})
    assert m3.devices.shape == (2, 2, 2)


def test_host_feed_and_sharded_round():
    """Per-host client payloads -> global array -> sharded weighted sum,
    bit-identical to the single-device path."""
    p = PM.make_params(batch=128, scale_bits=40, mult_depth=1, ring_dim=RING)
    ctx = PM.make_context(p)
    sk, pk = K.keygen(ctx, seed=0)
    n = ctx.ring_dim
    Kc, chunks = 4, 2
    rng = np.random.default_rng(0)
    vals = rng.standard_normal((Kc, chunks, n)).astype(np.float32)
    ct = O.encrypt_symmetric_stacked(ctx, sk, jnp.asarray(vals),
                                     jax.random.key(1))
    weights = [1.0 / Kc] * Kc

    mesh = MH.pod_mesh({"clients": 4, "chunks": 2})
    chain = p.chain_len
    ds = float(p.moduli[chain - 1])
    res_l, shoup_l = zip(*(E.encode_scalar(p.moduli[:chain], w, ds)
                           for w in weights))
    w_res = jnp.asarray(np.stack(res_l))
    w_shoup = jnp.asarray(np.stack(shoup_l))

    # the host feed: single process == whole array, placed sharded
    stacked = MH.host_client_array(
        mesh, ct.data.shape, P("clients", "chunks", None, None, None),
        np.asarray(ct.data))
    agg_fn = mesh_mod.sharded_weighted_sum(ctx, mesh)
    got = np.asarray(agg_fn(stacked, w_res, w_shoup))

    want = np.asarray(O.weighted_sum(ctx, ct, weights).data)
    np.testing.assert_array_equal(got, want)
