"""CKKS parameter selection for the TPU RNS backend.

Behavioral parity with the reference context
(palisade_pybind/SHELFI_FHE/src/ckks.cpp:25-33: multDepth=1,
scaleFactorBits=52, batchSize=4096, 128-bit security):

  * `batch` values are packed per ciphertext chunk.
  * message scale Delta = 2**scale_bits (up to 52 and beyond).
  * ring dimension = max(2*batch, HE-standard minimum for the chosen chain).

TPU-specific: every RNS prime is 31 bits (uint32 limbs), so a 52-bit scale is
carried across a *product* of base primes rather than PALISADE's single
60-bit first modulus. The chain is

    [b_0 .. b_{B-1} | r_1 .. r_D]

with base primes b_i (31-bit) whose product covers scale + headroom, and one
30/31-bit rescale prime r_j per multiplicative level. Plaintext scalars are
encoded at scale exactly r_j so rescaling restores Delta exactly.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp

from ..rns import primes as primes_mod
from ..rns import modops
from ..ntt import tables as ntt_tables

# Headroom above the message scale so |value| * Delta + noise stays well
# below the base modulus at decryption (values up to ~2**20, noise margin).
_HEADROOM_BITS = 34


@dataclasses.dataclass(frozen=True)
class CkksParams:
    """Static CKKS context parameters (hashable; safe as a jit static arg)."""
    ring_dim: int
    batch: int
    scale_bits: int
    mult_depth: int
    moduli: tuple[int, ...]        # base primes then rescale primes
    num_base: int                  # how many leading primes are base primes

    @property
    def num_limbs(self) -> int:
        return len(self.moduli)

    @property
    def scale(self) -> float:
        return float(2.0 ** self.scale_bits)

    @property
    def rescale_primes(self) -> tuple[int, ...]:
        return self.moduli[self.num_base:]

    @property
    def log_q(self) -> float:
        return sum(math.log2(q) for q in self.moduli)

    def limbs_at_level(self, level: int) -> int:
        """Number of live limbs for a ciphertext at `level` (0 = fresh)."""
        assert 0 <= level <= self.mult_depth
        return self.num_limbs - level


def make_params(batch: int = 4096, scale_bits: int = 52,
                mult_depth: int = 1, ring_dim: int | None = None) -> CkksParams:
    """Mirror of genCryptoContextCKKS(multDepth, scaleFactorBits, batchSize)
    (reference ckks.cpp:26-28) for the uint32-limb TPU backend."""
    num_base = max(2, math.ceil((scale_bits + _HEADROOM_BITS) / 31))
    # Total modulus estimate: base primes at 31 bits, rescale primes at 31.
    log_q = 31 * (num_base + mult_depth)
    n_sec = primes_mod.min_ring_dim_128(log_q)
    n = max(2 * batch, n_sec)
    if ring_dim is not None:
        assert ring_dim >= 2 * batch
        n = ring_dim
    moduli = primes_mod.ntt_primes(n, num_base + mult_depth)
    return CkksParams(
        ring_dim=n, batch=batch, scale_bits=scale_bits,
        mult_depth=mult_depth, moduli=moduli, num_base=num_base)


@dataclasses.dataclass(frozen=True)
class CkksContext:
    """Device-resident precomputed context: twiddle tables plus encode/decode
    and rescale constants, all derived from CkksParams."""
    params: CkksParams
    tables: ntt_tables.NttTables
    q: jnp.ndarray                 # (L,) uint32
    mu: jnp.ndarray                # (L,) Barrett constants
    # Encode: powers 2**(16*j) mod q_l, shape (DIGITS, L), plus Shoup words.
    enc_pow: jnp.ndarray
    enc_pow_shoup: jnp.ndarray
    # Decode (exact CRT): see ckks/encoding.py. Per level (list index = number
    # of live limbs - 1): punc_inv[l] = (Q/q_l)^{-1} mod q_l and digit tables.
    dec_consts: tuple               # tuple over live-limb-count of dicts
    # Rescale: for dropping limb l_top: inv of q_top mod q_j, shape (L-1,)
    rescale_inv: tuple              # tuple over level of (inv, inv_shoup) arrays

    class _H:
        pass


ENCODE_DIGITS = 5          # 5 x 16-bit digits = 80 bits of |round(m * Delta)|
DECODE_DIGIT_BITS = 16


def _make_decode_consts(moduli: tuple[int, ...], live: int):
    """Exact-CRT decode constants for the first `live` limbs.

    v = sum_l y_l * M_l - k * Q  with  y_l = x_l * punc_inv_l mod q_l,
    M_l = Q / q_l, k = round(sum y_l / q_l).  All M_l, k*Q as base-2**16
    digit arrays (uint32 per digit).
    """
    qs = moduli[:live]
    Q = 1
    for q in qs:
        Q *= q
    ndig = (Q.bit_length() + DECODE_DIGIT_BITS - 1) // DECODE_DIGIT_BITS
    mask = (1 << DECODE_DIGIT_BITS) - 1

    def digits(v: int) -> np.ndarray:
        return np.array([(v >> (DECODE_DIGIT_BITS * d)) & mask
                         for d in range(ndig)], dtype=np.uint32)

    punc_inv = []
    m_digits = np.zeros((live, ndig), dtype=np.uint32)
    for l, q in enumerate(qs):
        M = Q // q
        punc_inv.append(pow(M % q, q - 2, q))
        m_digits[l] = digits(M)
    kq_digits = np.stack([digits(k * Q) for k in range(live + 1)])
    half_q_digits = digits(Q // 2)
    return dict(
        live=live,
        punc_inv=np.array(punc_inv, dtype=np.uint32),
        punc_inv_shoup=modops.shoup_precompute(
            np.array(punc_inv, dtype=np.uint32),
            np.array(qs, dtype=np.uint32)),
        m_digits=m_digits,            # (live, ndig) uint32 16-bit digits
        kq_digits=kq_digits,          # (live+1, ndig)
        q_digits=digits(Q),           # (ndig,)
        half_q_digits=half_q_digits,  # (ndig,)
        inv_q_float=np.array([1.0 / q for q in qs], dtype=np.float64),
        ndig=ndig,
    )


def make_context(params: CkksParams) -> CkksContext:
    n = params.ring_dim
    moduli = params.moduli
    L = len(moduli)
    qs = np.array(moduli, dtype=np.uint32)
    tb = ntt_tables.make_tables(n, moduli)
    mu = np.array([modops.barrett_precompute(q) for q in moduli],
                  dtype=np.uint32)
    # Encode digit base powers 2**(16*j) mod q_l.
    enc_pow = np.zeros((ENCODE_DIGITS, L), dtype=np.uint32)
    for j in range(ENCODE_DIGITS):
        for l, q in enumerate(moduli):
            enc_pow[j, l] = pow(2, 16 * j, q)
    dec_consts = tuple(_make_decode_consts(moduli, live)
                       for live in range(1, L + 1))
    # Rescale constants: dropping the current top limb t (level -> t index).
    rescale = []
    for level in range(params.mult_depth):
        t = L - 1 - level              # index of limb being dropped
        qt = moduli[t]
        inv = np.array([pow(qt % q, q - 2, q) for q in moduli[:t]],
                       dtype=np.uint32)
        rescale.append((
            jnp.asarray(inv),
            jnp.asarray(modops.shoup_precompute(inv, qs[:t])),
        ))
    return CkksContext(
        params=params,
        tables=tb,
        q=jnp.asarray(qs),
        mu=jnp.asarray(mu),
        enc_pow=jnp.asarray(enc_pow),
        enc_pow_shoup=jnp.asarray(
            modops.shoup_precompute(enc_pow, qs[None, :])),
        dec_consts=dec_consts,
        rescale_inv=tuple(rescale),
    )
