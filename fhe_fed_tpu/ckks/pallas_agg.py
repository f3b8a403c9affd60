"""Fused Pallas kernel for the encrypted FedAvg weighted average.

THE hot server op (SURVEY.md C14; reference ckks.cpp:264-320 does a serial
per-learner EvalMult+EvalAdd loop). The XLA path (ops._weighted_sum_impl)
materializes the per-client scaled terms before the 16-bit split reduction
(~2.5 ms on v5e for 3 clients x 1.66M params); this kernel reads each client
block once, scales and accumulates in VMEM, and writes the result once —
pure elementwise VPU work, no transposes, so Mosaic handles it well
(~3x less HBM traffic than the XLA path).

Used on single-device TPU paths only; the mesh-sharded path keeps the
psum-friendly 16-bit split reduction (ops.modsum_clients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rns.modops import add_mod, mul_mod_shoup

_LANE = 128
_TB = 16


def _ws_kernel(x_ref, w_ref, ws_ref, q_ref, o_ref, *, n_clients: int):
    l = pl.program_id(0)
    q = q_ref[l, 0]
    acc = mul_mod_shoup(x_ref[0, :, 0], w_ref[0, l], ws_ref[0, l], q)
    for k in range(1, n_clients):
        t = mul_mod_shoup(x_ref[k, :, 0], w_ref[k, l], ws_ref[k, l], q)
        acc = add_mod(acc, t, q)
    o_ref[:, 0] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def weighted_sum_fused(stacked: jnp.ndarray, w_res: jnp.ndarray,
                       w_shoup: jnp.ndarray, q2d: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """stacked: (K, chunks, 2, live, N) uint32; w_*: (K, live);
    q2d: (live, 1). Returns (chunks, 2, live, N) weighted sum mod q."""
    K, chunks, two, live, n = stacked.shape
    assert two == 2 and q2d.shape == (live, 1)
    nblk = n // _LANE
    b_total = chunks * 2
    xb = stacked.reshape(K, b_total, live, nblk, _LANE)
    tb = min(_TB, b_total)
    pad = (-b_total) % tb
    if pad:
        xb = jnp.pad(xb, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
    nb = xb.shape[1] // tb

    x_spec = pl.BlockSpec((K, tb, 1, nblk, _LANE),
                          lambda l, b: (0, b, l, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((tb, 1, nblk, _LANE), lambda l, b: (b, l, 0, 0),
                          memory_space=pltpu.VMEM)
    smem_w = pl.BlockSpec((K, live), lambda l, b: (0, 0),
                          memory_space=pltpu.SMEM)
    smem_q = pl.BlockSpec((live, 1), lambda l, b: (0, 0),
                          memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_ws_kernel, n_clients=K),
        grid=(live, nb),
        in_specs=[x_spec, smem_w, smem_w, smem_q],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct(
            (xb.shape[1], live, nblk, _LANE), jnp.uint32),
        interpret=interpret,
    )(xb, w_res, w_shoup, q2d)

    if pad:
        out = out[:b_total]
    return out.reshape(chunks, 2, live, n)
