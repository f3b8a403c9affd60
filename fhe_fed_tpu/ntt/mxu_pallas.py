"""Fused Pallas kernel for the MXU digit-plane four-step NTT.

The unfused XLA version (ntt/mxu.py) materializes the int32 digit-plane
tensors (4x the ciphertext volume) in HBM between every step, which caps it
at parity with the butterfly transform. This kernel keeps the ENTIRE
four-step pipeline in VMEM per chunk-block grid cell:

    load u32 block -> center/digit-split (VPU) -> (4S x 4S) digit-plane
    matmul on the MXU -> plane reassembly (VPU) -> mid twiddle (VPU) ->
    second matmul (MXU) -> reassembly -> store u32 block

HBM traffic is exactly one read + one write of the polynomial batch; the
16 digit-plane products per stage ride the MXU as ONE int8 (or bf16/f32)
matmul with the shifted matrices precomputed in mxu.py's tables. The RNS
limb loop is statically unrolled inside the kernel (per-limb matrices and
scalars are VMEM/SMEM-resident), so the grid is 1-D over chunk blocks and
every byte is fetched once.

Same drop-in semantics as ntt.ntt / ntt.intt (bit-reversed eval order).
Numerics are identical to mxu.ntt_mxu (same tables, same reassembly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rns import modops
from .mxu import MxuNttTables, _OFF

_U32 = jnp.uint32
_I32 = jnp.int32

_BC = 8           # chunk-polys per grid cell (VMEM-sized for N=8192, L=5)


def _digits_flat(x_u32, q):
    """(R, S) u32 -> (R, 4*S) int8 signed base-256 digits, i-major columns
    [i*S + s] to match the rhs row layout (i, s)."""
    xs = x_u32.astype(_I32) - jnp.where(x_u32 > (q >> 1), q,
                                        _U32(0)).astype(_I32)
    cols = []
    for _ in range(4):
        d = ((xs + 128) & 255) - 128
        cols.append(d.astype(jnp.int8))
        xs = (xs - d) >> 8
    return jnp.concatenate(cols, axis=-1)          # (R, 4S), i-major


def _reassemble_flat(out_i32, s_out, q, c32, c32_sh, offm):
    """(R, 4*Sout) int32 plane sums (j-major columns) -> (R, Sout) u32."""
    u = (out_i32 + _OFF).astype(_U32)
    u0 = u[:, 0 * s_out:1 * s_out]
    u1 = u[:, 1 * s_out:2 * s_out]
    u2 = u[:, 2 * s_out:3 * s_out]
    u3 = u[:, 3 * s_out:4 * s_out]
    lo = u0 + (u1 << 8)
    c = (lo < u0).astype(_U32)
    lo2 = lo + (u2 << 16)
    c = c + (lo2 < lo).astype(_U32)
    lo3 = lo2 + (u3 << 24)
    c = c + (lo3 < lo2).astype(_U32)
    hi = (u1 >> 24) + (u2 >> 16) + (u3 >> 8) + c
    r1 = modops.mul_mod_shoup(hi, c32, c32_sh, q)
    r2 = jnp.where(lo3 >= (q << 1), lo3 - (q << 1), lo3)
    r2 = jnp.where(r2 >= q, r2 - q, r2)
    r2 = jnp.where(r2 >= q, r2 - q, r2)
    r = modops.add_mod(r1, r2, q)
    return modops.sub_mod(r, offm, q)


def _cast_for_dot(d_i8, rhs_i8, dtype):
    if dtype == "int8":
        return d_i8, rhs_i8, _I32
    if dtype == "bf16":
        return (d_i8.astype(jnp.bfloat16), rhs_i8.astype(jnp.bfloat16),
                jnp.float32)
    return d_i8.astype(jnp.float32), rhs_i8.astype(jnp.float32), jnp.float32


def _stage_local(x2d, rhs, s_out, q, c32, c32_sh, offm, dtype):
    """(R, S) u32 -> (R, Sout) u32: digit matmul + reassembly, in VMEM."""
    d = _digits_flat(x2d, q)
    lhs, r, pet = _cast_for_dot(d, rhs, dtype)
    out = jnp.dot(lhs, r, preferred_element_type=pet)
    if pet != _I32:
        out = out.astype(_I32)
    return _reassemble_flat(out, s_out, q, c32, c32_sh, offm)


def _kernel(q_ref, c32_ref, c32s_ref, off_ref,
            x_ref, r1_ref, r2_ref, mid_ref, mids_ref, o_ref,
            *, n1, n2, L, dtype, forward):
    bc = x_ref.shape[0]
    for l in range(L):                       # static unroll over RNS limbs
        q = q_ref[l, 0]
        c32 = c32_ref[l, 0]
        c32s = c32s_ref[l, 0]
        off = off_ref[l, 0]
        x = x_ref[:, l, :].reshape(bc, n1, n2)
        if forward:
            # Column DFTs: contract n1 -> rows (bc*n2, n1).
            xt = jnp.swapaxes(x, -1, -2).reshape(bc * n2, n1)
            y = _stage_local(xt, r1_ref[l].reshape(4 * n1, 4 * n1), n1,
                             q, c32, c32s, off, dtype)
            y = jnp.swapaxes(y.reshape(bc, n2, n1), -1, -2)
            # Mid twiddle (psi^c folded into the table).
            y = modops.mul_mod_shoup(y, mid_ref[l], mids_ref[l], q)
            # Row DFTs: contract n2.
            z = _stage_local(y.reshape(bc * n1, n2),
                             r2_ref[l].reshape(4 * n2, 4 * n2), n2,
                             q, c32, c32s, off, dtype)
            o_ref[:, l, :] = z.reshape(bc, n1 * n2)
        else:
            u = _stage_local(x.reshape(bc * n1, n2),
                             r2_ref[l].reshape(4 * n2, 4 * n2), n2,
                             q, c32, c32s, off, dtype).reshape(bc, n1, n2)
            u = modops.mul_mod_shoup(u, mid_ref[l], mids_ref[l], q)
            ut = jnp.swapaxes(u, -1, -2).reshape(bc * n2, n1)
            v = _stage_local(ut, r1_ref[l].reshape(4 * n1, 4 * n1), n1,
                             q, c32, c32s, off, dtype)
            v = jnp.swapaxes(v.reshape(bc, n2, n1), -1, -2)
            o_ref[:, l, :] = v.reshape(bc, n1 * n2)


def _call(x, mt: MxuNttTables, forward: bool, dtype: str,
          interpret: bool | None = None):
    """x: (B, L, N) u32 -> same shape. Grid (B/bc,), limbs unrolled."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L, n = x.shape
    n1, n2 = mt.n1, mt.n2
    # Pad the batch axis up to a block multiple: without this an odd chunk
    # count collapses the block to 1 poly/grid-cell (measured: resnet18's
    # 1427-chunk encrypt ran 10x slow before padding).
    bc = _BC
    pad = (-B) % bc
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, L, n), dtype=x.dtype)], axis=0)
    Bp = B + pad
    mid = mt.midf if forward else mt.midi
    mids = mt.midf_shoup if forward else mt.midi_shoup
    grid = (Bp // bc,)

    def sspec():
        return pl.BlockSpec((L, 1), lambda ib: (0, 0),
                            memory_space=pltpu.SMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda ib: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    fn = pl.pallas_call(
        functools.partial(_kernel, n1=n1, n2=n2, L=L, dtype=dtype,
                          forward=forward),
        grid=grid,
        in_specs=[
            sspec(), sspec(), sspec(), sspec(),
            pl.BlockSpec((bc, L, n), lambda ib: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            full((L, 4, n1, 4 * n1)),
            full((L, 4, n2, 4 * n2)),
            full((L, n1, n2)),
            full((L, n1, n2)),
        ],
        out_specs=pl.BlockSpec((bc, L, n), lambda ib: (ib, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, L, n), _U32),
        interpret=interpret,
    )
    out = fn(mt.q.reshape(L, 1), mt.c32.reshape(L, 1),
             mt.c32_shoup.reshape(L, 1), mt.offm.reshape(L, 1),
             x, mt.r1f if forward else mt.r1i,
             mt.r2f if forward else mt.r2i, mid, mids)
    return out[:B] if pad else out


def ntt_mxu_fused(x: jnp.ndarray, mt: MxuNttTables, dtype: str = "int8",
                  interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in forward NTT (..., L, N) -> bit-reversed eval order."""
    lead = x.shape[:-2]
    L, n = x.shape[-2], x.shape[-1]
    xb = x.reshape(-1, L, n)
    return _call(xb, mt, True, dtype, interpret).reshape(*lead, L, n)


def intt_mxu_fused(x: jnp.ndarray, mt: MxuNttTables, dtype: str = "int8",
                   interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in inverse NTT, exactly scaled."""
    lead = x.shape[:-2]
    L, n = x.shape[-2], x.shape[-1]
    xb = x.reshape(-1, L, n)
    return _call(xb, mt, False, dtype, interpret).reshape(*lead, L, n)
