"""Weak-scaling of the fused aggregation on a virtual device mesh.

VERDICT r2 item 10: real multi-chip ICI numbers are unmeasurable in this
container (one TPU chip behind a tunnel), so this commits the measurable
methodology datum instead: weak-scaling of the psum-fused weighted sum on
the virtual CPU mesh — 1 -> 8 devices, FIXED per-device chunk load, the
wall-clock ratio is the scaling efficiency. On real hardware the identical
code path (parallel/mesh.py sharding + jnp.sum -> psum) runs over ICI; the
CPU-mesh numbers validate that the collective pattern weak-scales, not the
fabric bandwidth. North star: BASELINE.json >= 80% multi-host efficiency.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python -m benchmarks.scaling_virtual
(the script forces the cpu platform itself; the XLA flag must be in the
environment before process start).

Writes results/scaling_virtual.jsonl.
"""

from __future__ import annotations

import argparse
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np                                         # noqa: E402
import jax.numpy as jnp                                    # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from fhe_fed_tpu.ckks import params as Pm, ops as O        # noqa: E402
from fhe_fed_tpu.ckks import encoding as E                 # noqa: E402
from .common import append_jsonl                           # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks-per-device", type=int, default=16)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args(argv)

    params = Pm.make_params(batch=4096, scale_bits=52, mult_depth=1)
    ctx = Pm.make_context(params)
    chain = params.chain_len
    n = params.ring_dim
    K = args.clients
    ds = float(params.moduli[chain - 1])
    res_l, shoup_l = zip(*(E.encode_scalar(params.moduli[:chain], 1.0 / K,
                                           ds) for _ in range(K)))
    w_res = jnp.asarray(np.stack(res_l))
    w_shoup = jnp.asarray(np.stack(shoup_l))

    devs = jax.devices()
    sizes = [d for d in (1, 2, 4, 8) if d <= len(devs)]
    rng = np.random.default_rng(0)
    base = None
    for nd in sizes:
        chunks = args.chunks_per_device * nd     # weak scaling: fixed /dev
        mesh = Mesh(np.array(devs[:nd]).reshape(nd), ("chunks",))
        sh = NamedSharding(mesh, P(None, "chunks"))
        x = rng.integers(0, params.moduli[0],
                         size=(K, chunks, 2, chain, n)).astype(np.uint32)
        xs = jax.device_put(x, sh)
        fn = jax.jit(lambda s: O._weighted_sum_impl(ctx, s, w_res, w_shoup))
        jax.block_until_ready(fn(xs))            # compile
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(xs))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        if base is None:
            base = t
        eff = base / t
        r = {"devices": nd, "chunks": chunks,
             "chunks_per_device": args.chunks_per_device,
             "clients": K, "wall_s": round(t, 5),
             "weak_scaling_efficiency": round(eff, 3),
             "backend": jax.default_backend(),
             "note": "virtual CPU mesh — methodology stub; real ICI "
                     "numbers await multi-chip hardware"}
        append_jsonl("scaling_virtual.jsonl", r)
        print(f"{nd} devices: {t*1e3:8.2f} ms for {chunks} chunks "
              f"({args.chunks_per_device}/dev) -> efficiency {eff:.2f}")


if __name__ == "__main__":
    main()
