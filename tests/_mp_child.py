"""Child process for the multi-process runtime test (test_multiprocess.py).

Not collected by pytest (leading underscore). Each of the two processes:
brings up jax.distributed over CPU (gloo collectives), builds a pod_mesh
whose 'clients' axis spans the PROCESSES, feeds only its own clients'
ciphertext payloads through host_client_array — exercising the
jax.make_array_from_process_local_data branch (multihost.py) that is dead
code in any single-process run — and checks the psum-fused weighted sum
against a local numpy recomputation of the full-cohort expectation.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np                                    # noqa: E402
import jax.numpy as jnp                               # noqa: E402
from jax.sharding import PartitionSpec as P           # noqa: E402


def main():
    port = os.environ["MP_TEST_PORT"]
    pid = int(os.environ["MP_TEST_PROC"])
    nproc = 2
    # init_distributed must run before ANY backend-touching import — the
    # package import chain builds device constants.
    import fhe_fed_tpu.parallel.multihost as MH

    ok = MH.init_distributed(coordinator_address=f"127.0.0.1:{port}",
                             num_processes=nproc, process_id=pid)
    assert ok, "init_distributed must report the multi-process branch"
    assert jax.process_count() == nproc, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == nproc * n_local, (n_global, n_local)

    # Mesh: clients across processes (the DCN axis), chunks within.
    mesh = MH.pod_mesh({"clients": nproc, "chunks": n_local})

    # Deterministic global cohort: every process can recompute the whole
    # expectation, but each FEEDS only its own clients.
    from fhe_fed_tpu.ckks import params as Pm, ops as O
    from fhe_fed_tpu.ckks import encoding as E
    params = Pm.make_params(batch=128, scale_bits=40, mult_depth=1,
                            ring_dim=256)
    ctx = Pm.make_context(params)
    chain = params.chain_len
    n = params.ring_dim
    K_per, C = 8, 2 * n_local                         # 16 clients global
    K = nproc * K_per
    rng = np.random.default_rng(42)
    stacked_np = rng.integers(
        0, min(params.moduli[:chain]),
        size=(K, C, 2, chain, n)).astype(np.uint32)

    gshape = stacked_np.shape
    local = stacked_np[pid * K_per:(pid + 1) * K_per]
    spec = P("clients", "chunks")
    stacked = MH.host_client_array(mesh, gshape, spec, local)
    assert stacked.shape == gshape

    ws = [1.0 / K] * K
    ds = float(params.moduli[chain - 1])
    res_l, shoup_l = zip(*(E.encode_scalar(params.moduli[:chain], w, ds)
                           for w in ws))
    w_res = jnp.asarray(np.stack(res_l))
    w_shoup = jnp.asarray(np.stack(shoup_l))

    # K = 16 > 8 drives _weighted_sum_impl's split-reduction path, whose
    # jnp.sum over the sharded client axis lowers to a cross-process psum.
    out = jax.jit(
        lambda s, wr, wsh: O._weighted_sum_impl(ctx, s, wr, wsh))(
            stacked, w_res, w_shoup)
    jax.block_until_ready(out)

    # Expected (full cohort, recomputed locally with exact ints).
    q = np.array(params.moduli[:chain], dtype=np.uint64)
    acc = np.zeros(out.shape, dtype=np.uint64)
    for i in range(K):
        term = (stacked_np[i].astype(np.uint64)
                * np.asarray(res_l[i], np.uint64)[None, None, :, None]) \
            % q[None, None, :, None]
        acc = (acc + term) % q[None, None, :, None]

    for shard in out.addressable_shards:
        idx = shard.index
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      acc[idx].astype(np.uint32))
    print(f"proc{pid}: psum-fused weighted sum over "
          f"{jax.process_count()} processes x {n_local} devices OK",
          flush=True)


if __name__ == "__main__":
    main()
