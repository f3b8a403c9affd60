"""Fused Pallas kernel for the exact-CRT CKKS decode — OPT-IN, measured
slower than the default XLA path.

Hypothesis was that decode (the largest kernel of decrypt after the MXU
NTT landed) pays ~10 HBM passes for its digit planes and would win from a
single-VMEM-residency kernel. Measured on v5e at the headline shape
(204, 4, 8192): XLA 1.41 ms, this kernel 3.17 ms — XLA's fusion already
keeps the chain in registers/VMEM, while this kernel's ~2 MB/poly of live
digit-plane temporaries forces a 17 MB scoped-VMEM footprint (bc=8) that
kills pipelining. Kept for the record and enabled with
FHE_FED_TPU_FUSED_DECODE=1; it is bit-exact vs the XLA path
(tests/test_pallas_decode.py).

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

# Chunk-polys per grid cell. Mosaic requires the output block's
# second-to-last dim divisible by 8, and the kernel keeps ~10 digit planes
# plus y_lo/y_hi temporaries live per poly (~2 MB/poly at live=4, N=8192),
# so 8 polys needs ~17 MB of scoped VMEM — above the 16 MB default limit;
# vmem_limit_bytes below raises it (v5e has 128 MB VMEM).
_BC = 8


def _kernel(res_ref, q_ref, pinv_ref, pinv_sh_ref, m_ref, qd_ref,
            invq_ref, o_ref, *, scale, live, ndig):
    from . import encoding
    dc = DecodeConsts(
        live=live, ndig=ndig,
        punc_inv=pinv_ref[:], punc_inv_shoup=pinv_sh_ref[:],
        m_digits=m_ref[:], q_digits=qd_ref[0],
        inv_q_f32=invq_ref[:])
    o_ref[:, :] = encoding.decode_core(dc, q_ref[:], res_ref[:, :, :], scale)


def decode_fused(ctx: CkksContext, dc: DecodeConsts, residues: jnp.ndarray,
                 scale: float) -> jnp.ndarray:
    """residues: (chunks, live, N) u32 -> (chunks, N) f32."""
    B, live, n = residues.shape
    qs = ctx.q[:live]
    bc = _BC
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
            full((1, dc.ndig)),
            full((live,)),
        ],
        out_specs=pl.BlockSpec((bc, n), lambda ib: (ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )
    out = fn(residues, qs, dc.punc_inv, dc.punc_inv_shoup, dc.m_digits,
             dc.q_digits.reshape(1, -1), dc.inv_q_f32)
    return out[:B] if pad else out
