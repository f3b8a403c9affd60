"""Fused negacyclic NTT / iNTT as single Pallas TPU kernels.

The pure-jnp path in ntt.py materializes the polynomial batch to HBM after
every butterfly stage (XLA cannot fuse across the relayouts), costing
2 * log2(N) HBM sweeps per transform. Here all log2(N) stages run inside one
`pallas_call` while the block stays resident in VMEM: one HBM read + one HBM
write per polynomial, per limb.

Layout contract (mirrors ntt.py's two-phase structure):
  * polynomials enter as (B, L, nblk, 128) with nblk = N // 128 — a free
    bitcast view of (B, L, N).
  * Phase A (butterfly span t >= 128) pairs elements along the `nblk`
    (sublane-major) axis; the 128-lane axis is untouched, so every reshape
    inside the kernel splits leading dims only (free in Mosaic).
  * Phase B (span t <= 64) runs after one in-VMEM transpose to
    (B, 128, nblk): butterflies pair along the 128-sublane axis.

Twiddles are pre-expanded host-side to the exact value shape of each
stage's `v` operand, so no in-kernel gathers or lane-crossing broadcasts are
ever needed:
  * phase A stage (m blocks, span t): (N//256, 128)  = repeat(tab[m:2m], t)
  * phase B stage (span t, m_in = 128/(2t)): (64, nblk) with
        value[i_in * t + _, c] = tab[m + c * m_in + i_in]

Replaces the reference's OpenMP-chunked PALISADE NTT (SURVEY.md C11,
ckks.cpp:70) with a VMEM-fused kernel; the jnp path remains as the CPU /
small-ring fallback and as the oracle for the kernel's own tests.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rns.modops import add_mod, sub_mod, mul_mod_shoup, shoup_precompute

_LANE = 128
_SB = 7            # phase-B stages cover spans 64, 32, ..., 1
# Batch rows per grid step. Mosaic's scoped-VMEM stack for the fully unrolled
# stage chain scales with the block size; the inverse kernel (two in-VMEM
# transposes) piles up more live buffers than the forward (one), so it runs
# with a smaller block to stay under the 16 MB scoped-VMEM limit.
_DEF_TB_FWD = 32
_DEF_TB_INV = 8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NttStageTables:
    """Per-stage expanded twiddles for the fused kernels (see module doc)."""
    ring_dim: int = dataclasses.field(metadata=dict(static=True))
    twA: jnp.ndarray        # (L, SA, N//256, 128) forward phase-A twiddles
    twA_sh: jnp.ndarray
    twB: jnp.ndarray        # (L, SB, 64, nblk)    forward phase-B twiddles
    twB_sh: jnp.ndarray
    itwB: jnp.ndarray       # (L, SB, 64, nblk)    inverse phase-B (t=1..64)
    itwB_sh: jnp.ndarray
    itwA: jnp.ndarray       # (L, SA, N//256, 128) inverse phase-A
    itwA_sh: jnp.ndarray
    ninv: jnp.ndarray       # (L, 1) N^{-1} mod q (SMEM scalars)
    ninv_sh: jnp.ndarray
    q2d: jnp.ndarray        # (L, 1) moduli (SMEM scalars)

    @property
    def num_stages_a(self) -> int:
        return int(self.twA.shape[1])

    def slice_limbs(self, lo: int, hi: int) -> "NttStageTables":
        return NttStageTables(
            ring_dim=self.ring_dim,
            twA=self.twA[lo:hi], twA_sh=self.twA_sh[lo:hi],
            twB=self.twB[lo:hi], twB_sh=self.twB_sh[lo:hi],
            itwB=self.itwB[lo:hi], itwB_sh=self.itwB_sh[lo:hi],
            itwA=self.itwA[lo:hi], itwA_sh=self.itwA_sh[lo:hi],
            ninv=self.ninv[lo:hi], ninv_sh=self.ninv_sh[lo:hi],
            q2d=self.q2d[lo:hi])


def _expand_a(tab_np: np.ndarray, n: int, m: int, t: int) -> np.ndarray:
    """Phase-A stage expansion: (L, N) tree-order table -> (L, N//256, 128)."""
    L = tab_np.shape[0]
    out = np.repeat(tab_np[:, m:2 * m], t, axis=1)        # (L, N//2)
    return out.reshape(L, n // 256, _LANE)


def _expand_b(tab_np: np.ndarray, n: int, m: int, t: int) -> np.ndarray:
    """Phase-B stage expansion: (L, N) -> (L, 64, nblk)."""
    L = tab_np.shape[0]
    nblk = n // _LANE
    m_in = _LANE // (2 * t)
    idx = m + np.arange(nblk)[None, :] * m_in + np.arange(m_in)[:, None]
    vals = tab_np[:, idx]                                  # (L, m_in, nblk)
    vals = np.repeat(vals[:, :, None, :], t, axis=2)       # (L, m_in, t, nblk)
    return vals.reshape(L, 64, nblk)


def make_stage_tables(ring_dim: int, moduli, tab_np: np.ndarray,
                      itab_np: np.ndarray, ninv_np: np.ndarray
                      ) -> NttStageTables | None:
    """Host-side expansion. Returns None for rings too small to fuse."""
    n = ring_dim
    if n < 256:
        return None
    qs = np.asarray(moduli, dtype=np.uint32)
    sa = n.bit_length() - 1 - _SB                          # log2(n) - 7

    twA, itwA = [], []
    m, t = 1, n // 2
    for _ in range(sa):
        twA.append(_expand_a(tab_np, n, m, t))
        m *= 2
        t //= 2
    # Inverse phase-A runs spans t = 128 .. n/2 (h = n/(2t) blocks).
    t, h = _LANE, n // 256
    for _ in range(sa):
        itwA.append(_expand_a(itab_np, n, h, t))
        t *= 2
        h //= 2

    twB, itwB = [], []
    t = 64
    for _ in range(_SB):                                   # forward: 64 .. 1
        twB.append(_expand_b(tab_np, n, n // (2 * t), t))
        t //= 2
    t = 1
    for _ in range(_SB):                                   # inverse: 1 .. 64
        itwB.append(_expand_b(itab_np, n, n // (2 * t), t))
        t *= 2

    # Host (numpy) leaves: callers materialize the whole table set to the
    # device in one batched transfer (utils/devput.py) — per-array transfers
    # cost a ~50 ms round-trip each on remote-attached TPUs.
    def dev(stages):
        arr = np.stack(stages, axis=1)                     # (L, S, ...)
        return arr, shoup_precompute(arr, qs[:, None, None, None])

    twA, twA_sh = dev(twA)
    twB, twB_sh = dev(twB)
    itwA, itwA_sh = dev(itwA)
    itwB, itwB_sh = dev(itwB)
    ninv = np.ascontiguousarray(ninv_np.reshape(-1, 1))
    return NttStageTables(
        ring_dim=n,
        twA=twA, twA_sh=twA_sh, twB=twB, twB_sh=twB_sh,
        itwB=itwB, itwB_sh=itwB_sh, itwA=itwA, itwA_sh=itwA_sh,
        ninv=ninv,
        ninv_sh=shoup_precompute(ninv, qs[:, None]),
        q2d=np.ascontiguousarray(qs[:, None]))


def _fwd_kernel(x_ref, twA_ref, twAs_ref, twB_ref, twBs_ref, q_ref, o_ref,
                *, n: int, tb: int):
    q = q_ref[pl.program_id(0), 0]
    nblk = n // _LANE
    sa = n.bit_length() - 1 - _SB
    x = x_ref[:, 0]                                        # (TB, nblk, 128)

    m, t = 1, n // 2
    for s in range(sa):
        tblk = t // _LANE
        xs = x.reshape(tb, m, 2, tblk, _LANE)
        u = xs[:, :, 0]
        v = xs[:, :, 1]
        tw = twA_ref[0, s].reshape(1, m, tblk, _LANE)
        tws = twAs_ref[0, s].reshape(1, m, tblk, _LANE)
        v = mul_mod_shoup(v, tw, tws, q)
        x = jnp.stack([add_mod(u, v, q), sub_mod(u, v, q)],
                      axis=2).reshape(tb, nblk, _LANE)
        m *= 2
        t //= 2

    xt = jnp.swapaxes(x, 1, 2)                             # (TB, 128, nblk)
    t = 64
    for s in range(_SB):
        m_in = _LANE // (2 * t)
        xs = xt.reshape(tb, m_in, 2, t, nblk)
        u = xs[:, :, 0]
        v = xs[:, :, 1]
        tw = twB_ref[0, s].reshape(1, m_in, t, nblk)
        tws = twBs_ref[0, s].reshape(1, m_in, t, nblk)
        v = mul_mod_shoup(v, tw, tws, q)
        xt = jnp.stack([add_mod(u, v, q), sub_mod(u, v, q)],
                       axis=2).reshape(tb, _LANE, nblk)
        t //= 2

    o_ref[:, 0] = jnp.swapaxes(xt, 1, 2)


def _inv_kernel(x_ref, itwB_ref, itwBs_ref, itwA_ref, itwAs_ref, q_ref,
                ninv_ref, ninvs_ref, o_ref, *, n: int, tb: int):
    q = q_ref[pl.program_id(0), 0]
    nblk = n // _LANE
    sa = n.bit_length() - 1 - _SB
    x = x_ref[:, 0]                                        # (TB, nblk, 128)

    xt = jnp.swapaxes(x, 1, 2)                             # (TB, 128, nblk)
    t = 1
    for s in range(_SB):
        m_in = _LANE // (2 * t)
        xs = xt.reshape(tb, m_in, 2, t, nblk)
        x0 = xs[:, :, 0]
        x1 = xs[:, :, 1]
        tw = itwB_ref[0, s].reshape(1, m_in, t, nblk)
        tws = itwBs_ref[0, s].reshape(1, m_in, t, nblk)
        u = add_mod(x0, x1, q)
        v = mul_mod_shoup(sub_mod(x0, x1, q), tw, tws, q)
        xt = jnp.stack([u, v], axis=2).reshape(tb, _LANE, nblk)
        t *= 2
    x = jnp.swapaxes(xt, 1, 2)                             # (TB, nblk, 128)

    t, h = _LANE, n // 256
    for s in range(sa):
        tblk = t // _LANE
        xs = x.reshape(tb, h, 2, tblk, _LANE)
        x0 = xs[:, :, 0]
        x1 = xs[:, :, 1]
        tw = itwA_ref[0, s].reshape(1, h, tblk, _LANE)
        tws = itwAs_ref[0, s].reshape(1, h, tblk, _LANE)
        u = add_mod(x0, x1, q)
        v = mul_mod_shoup(sub_mod(x0, x1, q), tw, tws, q)
        x = jnp.stack([u, v], axis=2).reshape(tb, nblk, _LANE)
        t *= 2
        h //= 2

    ninv = ninv_ref[pl.program_id(0), 0]
    ninvs = ninvs_ref[pl.program_id(0), 0]
    o_ref[:, 0] = mul_mod_shoup(x, ninv, ninvs, q)


@functools.partial(jax.jit,
                   static_argnames=("inverse", "interpret", "block_rows"))
def _fused(x: jnp.ndarray, st: NttStageTables, inverse: bool,
           interpret: bool = False,
           block_rows: int | None = None) -> jnp.ndarray:
    """x: (..., L, N) uint32 -> same shape, fused (i)NTT on TPU."""
    if block_rows is None:
        block_rows = _DEF_TB_INV if inverse else _DEF_TB_FWD
    n = st.ring_dim
    L = x.shape[-2]
    assert x.shape[-1] == n and st.q2d.shape[0] == L
    batch = x.shape[:-2]
    nblk = n // _LANE

    b_total = 1
    for d in batch:
        b_total *= d
    tb = min(block_rows, max(1, b_total))
    xb = x.reshape(b_total, L, nblk, _LANE)
    pad = (-b_total) % tb
    if pad:
        xb = jnp.pad(xb, ((0, pad), (0, 0), (0, 0), (0, 0)))
    nb = xb.shape[0] // tb

    x_spec = pl.BlockSpec((tb, 1, nblk, _LANE), lambda l, b: (b, l, 0, 0),
                          memory_space=pltpu.VMEM)
    sa = n.bit_length() - 1 - _SB

    def a_spec(arr):
        return pl.BlockSpec((1, sa, n // 256, _LANE), lambda l, b: (l, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def b_spec(arr):
        return pl.BlockSpec((1, _SB, 64, nblk), lambda l, b: (l, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    # Whole (L, 1) scalar arrays live in SMEM; kernels index by program_id(0).
    smem = pl.BlockSpec((L, 1), lambda l, b: (0, 0), memory_space=pltpu.SMEM)

    # Alias the output onto input 0: each grid step reads and writes the same
    # (l, b) block, so in-place is safe — and it stops XLA's memory-space
    # assignment from trying to stage the full result array in VMEM.
    if not inverse:
        kern = functools.partial(_fwd_kernel, n=n, tb=tb)
        out = pl.pallas_call(
            kern,
            grid=(L, nb),
            in_specs=[x_spec, a_spec(st.twA), a_spec(st.twA_sh),
                      b_spec(st.twB), b_spec(st.twB_sh), smem],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(xb.shape, jnp.uint32),
            input_output_aliases={0: 0},
            interpret=interpret,
        )(xb, st.twA, st.twA_sh, st.twB, st.twB_sh, st.q2d)
    else:
        kern = functools.partial(_inv_kernel, n=n, tb=tb)
        out = pl.pallas_call(
            kern,
            grid=(L, nb),
            in_specs=[x_spec, b_spec(st.itwB), b_spec(st.itwB_sh),
                      a_spec(st.itwA), a_spec(st.itwA_sh),
                      smem, smem, smem],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(xb.shape, jnp.uint32),
            input_output_aliases={0: 0},
            interpret=interpret,
        )(xb, st.itwB, st.itwB_sh, st.itwA, st.itwA_sh,
          st.q2d, st.ninv, st.ninv_sh)

    if pad:
        out = out[:b_total]
    return out.reshape(*batch, L, n)


def ntt_fused(x, st: NttStageTables, interpret: bool = False):
    return _fused(x, st, inverse=False, interpret=interpret)


def intt_fused(x, st: NttStageTables, interpret: bool = False):
    return _fused(x, st, inverse=True, interpret=interpret)
