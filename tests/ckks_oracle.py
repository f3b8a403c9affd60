"""Independent textbook-CKKS oracle: pure Python big integers.

The reference validates its PALISADE pipeline against a SECOND CKKS
implementation (TenSEAL/SEAL, benchmark_tenseal.py:123-218). Neither
tenseal nor pyhelayers is importable in this environment (no package, no
network), so this module plays that role: a from-first-principles RLWE
CKKS written with none of the framework's machinery —

  * arithmetic: arbitrary-precision Python ints over the single composite
    modulus Q = prod(q_i) (the framework uses RNS uint32 limbs);
  * polynomial multiplication: Kronecker substitution into one huge
    integer product (the framework uses per-prime NTTs);
  * encoding/decoding: exact integer round/centered-lift (the framework
    uses 16-bit digit planes + two-float division).

Shared with the framework only: the *parameters* (ring_dim, moduli,
scale) and the protocol semantics (coefficient packing, EvalMult-by-
integer-scalar, EvalAdd) — exactly what a cross-library check shares.

Interop helpers convert between the framework's RNS residue arrays and
the oracle's big-int coefficient vectors via textbook CRT, so tests can
decrypt *our* ciphertexts with the oracle's math and vice versa.
"""

from __future__ import annotations

import math
import random


class CkksOracle:
    """Textbook CKKS over R_Q = Z_Q[X]/(X^N + 1), coefficient packing."""

    def __init__(self, ring_dim: int, moduli, scale: float):
        self.n = int(ring_dim)
        self.moduli = [int(q) for q in moduli]
        self.q = math.prod(self.moduli)
        self.scale = float(scale)
        # Kronecker slot width: products of two coeffs < q**2, summed over
        # <= n terms -> q**2 * n; negacyclic fold adds one more bit.
        # Byte-aligned so slots can be carved out with int.to_bytes.
        bits = 2 * self.q.bit_length() + self.n.bit_length() + 2
        self.slot_bits = (bits + 7) // 8 * 8

    # -- ring arithmetic ----------------------------------------------------

    def negacyclic_mul(self, a: list[int], b: list[int]) -> list[int]:
        """(sum a_i X^i)(sum b_j X^j) mod (X^N + 1, Q) via Kronecker
        substitution: evaluate at X = 2**slot_bits, one big-int multiply,
        then carve out coefficients and fold X^(N+k) -> -X^k."""
        n, bits = self.n, self.slot_bits
        nbytes = bits // 8
        ia = int.from_bytes(
            b"".join((x % self.q).to_bytes(nbytes, "little") for x in a),
            "little")
        ib = int.from_bytes(
            b"".join((x % self.q).to_bytes(nbytes, "little") for x in b),
            "little")
        raw = (ia * ib).to_bytes(2 * n * nbytes, "little")
        coeffs = [int.from_bytes(raw[k * nbytes:(k + 1) * nbytes], "little")
                  for k in range(2 * n - 1)]
        out = []
        for k in range(n):
            c = coeffs[k]
            if k < n - 1:
                c -= coeffs[k + n]          # fold X^(N+k) -> -X^k
            out.append(c % self.q)
        return out

    def _poly_add(self, a, b):
        return [(x + y) % self.q for x, y in zip(a, b)]

    def _poly_scalar(self, a, t: int):
        return [(x * t) % self.q for x in a]

    def _centered(self, x: int) -> int:
        return x - self.q if x > self.q // 2 else x

    # -- sampling (its own PRNG, nothing shared) -----------------------------

    def sample_ternary(self, seed: int) -> list[int]:
        rng = random.Random(seed)
        return [rng.randrange(3) - 1 for _ in range(self.n)]

    def _sample_uniform(self, rng) -> list[int]:
        return [rng.randrange(self.q) for _ in range(self.n)]

    def _sample_err(self, rng) -> list[int]:
        # centered binomial, sigma ~ 3.2
        return [sum(rng.randrange(2) for _ in range(21)) - 10
                for _ in range(self.n)]

    # -- scheme --------------------------------------------------------------

    def encode(self, values) -> list[int]:
        return [int(round(float(v) * self.scale)) % self.q for v in values]

    def decode(self, coeffs: list[int], scale: float | None = None):
        s = self.scale if scale is None else scale
        return [self._centered(c) / s for c in coeffs]

    def encrypt_sym(self, s: list[int], values, seed: int):
        """Secret-key RLWE: (a*s + m + e, -a)."""
        rng = random.Random(seed)
        m = self.encode(values)
        a = self._sample_uniform(rng)
        e = [x % self.q for x in self._sample_err(rng)]
        c0 = self._poly_add(self._poly_add(self.negacyclic_mul(a, s), m), e)
        c1 = [(-x) % self.q for x in a]
        return c0, c1

    def decrypt(self, s: list[int], ct, scale: float | None = None):
        c0, c1 = ct
        phase = self._poly_add(c0, self.negacyclic_mul(c1, s))
        return self.decode(phase, scale)

    def weighted_average(self, cts, weights, scalar_scale: float):
        """EvalMult(ct, scalar) + EvalAdd accumulate (ckks.cpp:286-298
        semantics): scalars encoded as round(w * scalar_scale)."""
        acc0 = [0] * self.n
        acc1 = [0] * self.n
        for (c0, c1), w in zip(cts, weights):
            t = int(round(float(w) * scalar_scale))
            acc0 = self._poly_add(acc0, self._poly_scalar(c0, t))
            acc1 = self._poly_add(acc1, self._poly_scalar(c1, t))
        return acc0, acc1


# -- CRT interop with the framework's RNS residue arrays ---------------------

def rns_to_int(residues, moduli) -> list[int]:
    """(live, N) uint32 residues -> N big ints mod prod(moduli) (CRT)."""
    ms = [int(q) for q in moduli]
    q = math.prod(ms)
    punc = [q // m for m in ms]
    inv = [pow(p % m, m - 2, m) for p, m in zip(punc, ms)]
    live, n = residues.shape
    assert live == len(ms)
    out = []
    for j in range(n):
        x = 0
        for l in range(live):
            x += int(residues[l, j]) * inv[l] % ms[l] * punc[l]
        out.append(x % q)
    return out


def int_to_rns(coeffs: list[int], moduli, np_mod):
    """N big ints -> (live, N) uint32 residues (np_mod: numpy module)."""
    ms = [int(q) for q in moduli]
    arr = np_mod.empty((len(ms), len(coeffs)), dtype=np_mod.uint32)
    for l, m in enumerate(ms):
        arr[l] = [c % m for c in coeffs]
    return arr
