"""Fused Pallas kernel for the exact-CRT CKKS decode.

After the MXU NTT landed, decode became the largest single kernel of the
decrypt phase (~1.06 ms of the 1.52 ms device decrypt at the headline
shape — see docs/ROOFLINE.md). The decode arithmetic (encoding.decode_core)
is ~10 elementwise passes over (chunks, live, N) when XLA materializes the
digit planes in HBM; this kernel runs the IDENTICAL arithmetic per
chunk-block entirely in VMEM: one read of the residues, one write of the
f32 coefficients.

The decode constants (puncture inverses, 16-bit digit planes of Q/q_l,
k*Q, Q) are tiny and ride along as VMEM blocks.

Reference parity: GetRealPackedValue / plaintext decode (ckks.cpp:198-204),
with the exact-integer CRT of encoding.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .params import CkksContext, DecodeConsts

_U32 = jnp.uint32

_BC = 16          # chunk-polys per grid cell


def _kernel(res_ref, q_ref, pinv_ref, pinv_sh_ref, m_ref, kq_ref, qd_ref,
            invq_ref, o_ref, *, scale, live, ndig):
    from . import encoding
    dc = DecodeConsts(
        live=live, ndig=ndig,
        punc_inv=pinv_ref[:], punc_inv_shoup=pinv_sh_ref[:],
        m_digits=m_ref[:], kq_digits=kq_ref[:], q_digits=qd_ref[0],
        inv_q_f32=invq_ref[:])
    o_ref[:, :] = encoding.decode_core(dc, q_ref[:], res_ref[:, :, :], scale)


def decode_fused(ctx: CkksContext, dc: DecodeConsts, residues: jnp.ndarray,
                 scale: float) -> jnp.ndarray:
    """residues: (chunks, live, N) u32 -> (chunks, N) f32."""
    B, live, n = residues.shape
    qs = ctx.q[:live]
    bc = min(_BC, max(8, B))
    pad = (-B) % bc
    if pad:
        residues = jnp.concatenate(
            [residues, jnp.zeros((pad, live, n), dtype=residues.dtype)],
            axis=0)
    Bp = B + pad

    def full(shape):
        return pl.BlockSpec(shape, lambda ib: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    fn = pl.pallas_call(
        functools.partial(_kernel, scale=float(scale), live=live,
                          ndig=dc.ndig),
        grid=(Bp // bc,),
        in_specs=[
            pl.BlockSpec((bc, live, n), lambda ib: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            full((live,)),
            full((live,)),
            full((live,)),
            full((live, dc.ndig)),
            full((live + 1, dc.ndig)),
            full((1, dc.ndig)),
            full((live,)),
        ],
        out_specs=pl.BlockSpec((bc, n), lambda ib: (ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )
    out = fn(residues, qs, dc.punc_inv, dc.punc_inv_shoup, dc.m_digits,
             dc.kq_digits, dc.q_digits.reshape(1, -1), dc.inv_q_f32)
    return out[:B] if pad else out
