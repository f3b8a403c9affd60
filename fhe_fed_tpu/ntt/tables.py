"""Twiddle-factor tables for the negacyclic NTT.

Tables are generated host-side with exact Python integers once per crypto
context, then shipped to the device as uint32 arrays of shape (L, N):

  tab[l, k]  = psi_l ** bitrev(k)        (mod q_l)   forward (CT/DIT)
  itab[l, k] = psi_l ** -bitrev(k)       (mod q_l)   inverse (GS/DIF)

following the merged-psi formulation (Longa & Naehrig 2016), so no separate
bit-reversal pass is ever needed: forward output / eval-domain data lives in
bit-reversed order, which is fine because every eval-domain op is
coefficient-wise.

Replaces PALISADE's NTT precomputations (reference SURVEY.md C11).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..rns import primes as primes_mod
from ..rns import modops
from . import pallas_ntt


def _bitrev(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NttTables:
    """Device-resident twiddle tables for a modulus chain (L primes)."""
    ring_dim: int = dataclasses.field(metadata=dict(static=True))
    q: jnp.ndarray            # (L,) uint32 moduli
    tab: jnp.ndarray          # (L, N) forward twiddles, tree order
    tab_shoup: jnp.ndarray    # (L, N)
    itab: jnp.ndarray         # (L, N) inverse twiddles, tree order
    itab_shoup: jnp.ndarray   # (L, N)
    ninv: jnp.ndarray         # (L,) N^{-1} mod q
    ninv_shoup: jnp.ndarray   # (L,)
    # Per-stage expanded twiddles for the fused Pallas kernels (None when the
    # ring is too small to fuse; the jnp path is used then).
    stages: pallas_ntt.NttStageTables | None = None

    @property
    def num_limbs(self) -> int:
        return int(self.q.shape[0])

    def slice_limbs(self, lo: int, hi: int) -> "NttTables":
        """Tables restricted to limbs [lo, hi) — used after rescale."""
        return NttTables(
            ring_dim=self.ring_dim,
            q=self.q[lo:hi],
            tab=self.tab[lo:hi],
            tab_shoup=self.tab_shoup[lo:hi],
            itab=self.itab[lo:hi],
            itab_shoup=self.itab_shoup[lo:hi],
            ninv=self.ninv[lo:hi],
            ninv_shoup=self.ninv_shoup[lo:hi],
            stages=(None if self.stages is None
                    else self.stages.slice_limbs(lo, hi)),
        )


def make_tables(ring_dim: int, moduli: tuple[int, ...]) -> NttTables:
    n = ring_dim
    bits = n.bit_length() - 1
    assert 1 << bits == n, "ring_dim must be a power of two"
    L = len(moduli)
    tab = np.zeros((L, n), dtype=np.uint32)
    itab = np.zeros((L, n), dtype=np.uint32)
    ninv = np.zeros((L,), dtype=np.uint32)
    brv = [_bitrev(k, bits) for k in range(n)]
    for l, q in enumerate(moduli):
        psi = primes_mod.primitive_root_2n(q, n)
        ipsi = pow(psi, q - 2, q)
        # Power tables via repeated squaring on exact ints.
        pw = np.empty(n, dtype=np.uint64)
        ipw = np.empty(n, dtype=np.uint64)
        x = 1
        y = 1
        for k in range(n):
            pw[k] = x
            ipw[k] = y
            x = x * psi % q
            y = y * ipsi % q
        tab[l] = pw[brv].astype(np.uint32)
        itab[l] = ipw[brv].astype(np.uint32)
        ninv[l] = pow(n, q - 2, q)
    qs = np.asarray(moduli, dtype=np.uint32)
    return NttTables(
        ring_dim=n,
        q=jnp.asarray(qs),
        tab=jnp.asarray(tab),
        tab_shoup=jnp.asarray(modops.shoup_precompute(tab, qs[:, None])),
        itab=jnp.asarray(itab),
        itab_shoup=jnp.asarray(modops.shoup_precompute(itab, qs[:, None])),
        ninv=jnp.asarray(ninv),
        ninv_shoup=jnp.asarray(modops.shoup_precompute(ninv, qs)),
        stages=pallas_ntt.make_stage_tables(n, moduli, tab, itab, ninv),
    )
