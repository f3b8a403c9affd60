"""Parsers for EXTERNALLY-GENERATED CKKS key material (off-box origin).

Two independent lattice libraries' serialized keys are committed as
byte-for-byte copies of data files from the reference repo — data neither
authored nor derived by any code in this repo:

  tests/vectors/reference_palisade_ckks/
      PALISADE binary serializations (CEREAL portable-binary) committed at
      reference code/resources/cryptoparams/{cryptocontext,key-private,
      key-public}.txt — written by CKKS::genCryptoContextAndKeyGen
      (reference ckks.cpp:25-59) at the production point multDepth=1 /
      scaleFactorBits=52 / batch=4096 / ring 8192.

  tests/vectors/reference_tenseal_ckks/context.pickle
      A TenSEAL (Microsoft SEAL) context serialized WITH its secret key,
      committed at reference code/context.pickle, written by
      code/tenseal_test.py:8-18 at the reference's ecosystem anchor point
      (poly 8192, coeff_mod_bit_sizes [60,40,40,60], scale 2^52 —
      benchmark_tenseal.py:124-125).

  tests/vectors/reference_tenseal_ckks/{tenseal_model,model}.pickle
      (r5) Byte-copies of reference code/tenseal_model.pickle — TenSEAL
      CKKSVector blobs (Microsoft-SEAL-serialized ciphertexts) of the
      Linear(100,1) model — and code/model.pickle, its torch state_dict
      plaintext counterpart. Parsed forensically below (restricted
      unpicklers; the torch legacy pickle is read without torch).

  tests/vectors/reference_palisade_ckks_pybind/
      (r5) Byte-copies of the reference's SECOND PALISADE resource set
      (palisade_pybind/SHELFI_FHE/resources/cryptoparams/): another
      keygen instance's cryptocontext/key-private/key-public plus the
      orphan relinearization key key-eval-mult.txt
      (LPEvalKeyRelinImpl<DCRTPoly>, ring 16384) that no committed code
      writes or reads. All are DATA files imported as external
      known-answer vectors; no code in this repo produced them.

The parsers below are deliberately minimal/forensic: PALISADE arrays are
located by their (length=8192, residues < q) signature; the TenSEAL blob
is walked as protobuf wire format and each SEAL payload is unwrapped from
its 16-byte SEALHeader (magic 0xA15E, zstd/zlib compr mode byte).

The big-integer negacyclic transform here is the SHARED convention both
libraries' keys decode under (bit-reversed evaluation order, Longa-Naehrig
formulation — the same convention fhe_fed_tpu/ntt uses, see
test_external_ckks_vectors.test_engine_matches_external_convention):

    eval[i] = C(psi**(2*bitrev(i) + 1))  (mod q)
"""

from __future__ import annotations

import os
import pickle
import re
import struct

HERE = os.path.dirname(os.path.abspath(__file__))
PALISADE_DIR = os.path.join(HERE, "vectors", "reference_palisade_ckks")
# A SECOND, independent PALISADE keygen instance: the reference commits a
# separate resource set at palisade_pybind/SHELFI_FHE/resources/
# cryptoparams/ (written by the same CKKS::genCryptoContextAndKeyGen,
# ckks.cpp:25-59, from a different run) PLUS an orphan relinearization
# key `key-eval-mult.txt` no committed code writes or reads.
PYBIND_DIR = os.path.join(HERE, "vectors", "reference_palisade_ckks_pybind")
TENSEAL_DIR = os.path.join(HERE, "vectors", "reference_tenseal_ckks")
TENSEAL_PICKLE = os.path.join(TENSEAL_DIR, "context.pickle")
# Reference code/tenseal_model.pickle: OrderedDict{name: TenSEAL
# CKKSVector bytes} — Microsoft-SEAL-serialized ciphertexts of the
# reference's Linear(100,1) model; code/model.pickle is the matching
# plaintext state_dict (torch legacy pickle).
TENSEAL_MODEL_PICKLE = os.path.join(TENSEAL_DIR, "tenseal_model.pickle")
TORCH_MODEL_PICKLE = os.path.join(TENSEAL_DIR, "model.pickle")

N = 8192
BITS = 13

# PALISADE production context (multDepth=1, scale 52): chain [60-bit,
# 53-bit]; note the 60-bit prime 2**60 - 2**14 + 1 also appears as SEAL's
# special modulus below.
PALISADE_MODULI = (1152921504606830593, 4503599627763713)


def _brv(i: int, bits: int = BITS) -> int:
    return int(bin(i)[2:].zfill(bits)[::-1], 2)


def _fft(v, w, q):
    """Iterative radix-2 DIT FFT over Z_q; v natural order, w an n-th root."""
    n = len(v)
    bits = n.bit_length() - 1
    a = [v[_brv(i, bits)] for i in range(n)]
    span = 1
    while span < n:
        wm = pow(w, n // (2 * span), q)
        for start in range(0, n, 2 * span):
            x = 1
            for k in range(start, start + span):
                t = a[k + span] * x % q
                a[k + span] = (a[k] - t) % q
                a[k] = (a[k] + t) % q
                x = x * wm % q
        span *= 2
    return a


def intt_neg_brv(vals, psi, q):
    """Coefficients from bit-reversed-order negacyclic evals:
    vals[i] = C(psi**(2*bitrev(i)+1))."""
    v = [vals[_brv(i)] for i in range(N)]
    u = _fft(v, pow(psi * psi % q, q - 2, q), q)
    ninv = pow(N, q - 2, q)
    psi_inv = pow(psi, q - 2, q)
    out = []
    x = 1
    for k in range(N):
        out.append(u[k] * ninv % q * x % q)
        x = x * psi_inv % q
    return out


def ntt_neg_brv(coeffs, psi, q):
    """Forward: coeffs -> bit-reversed-order negacyclic evals (inverse of
    intt_neg_brv)."""
    tw = []
    x = 1
    for k in range(len(coeffs)):
        tw.append(coeffs[k] * x % q)
        x = x * psi % q
    u = _fft(tw, psi * psi % q, q)
    return [u[_brv(i)] for i in range(N)]


def center(v: int, q: int) -> int:
    return v - q if v > q // 2 else v


def minimal_psi(q: int, n: int = N) -> int:
    """SEAL's root convention: the MINIMAL primitive 2n-th root mod q."""
    for g in range(2, 10000):
        c = pow(g, (q - 1) // (2 * n), q)
        if pow(c, n, q) == q - 1:
            break
    else:
        raise ValueError("no primitive root found")
    c2 = c * c % q
    best = cur = c
    for _ in range(n - 1):
        cur = cur * c2 % q
        if cur < best:
            best = cur
    return best


# ---------------------------------------------------------------------------
# PALISADE (CEREAL portable binary)
# ---------------------------------------------------------------------------

def _palisade_scan_u64(blob: bytes, pred) -> list[tuple[int, int]]:
    out = []
    for off in range(len(blob) - 8):
        v = struct.unpack_from("<Q", blob, off)[0]
        if pred(v):
            out.append((off, v))
    return out


def palisade_roots(dirname: str = PALISADE_DIR) -> tuple[int, ...]:
    """The serialized primitive 2N-th roots of unity, one per modulus,
    located inside cryptocontext.txt by their algebraic property."""
    blob = open(os.path.join(dirname, "cryptocontext.txt"), "rb").read()
    roots = []
    for q in PALISADE_MODULI:
        hits = _palisade_scan_u64(
            blob, lambda v, q=q: 1 < v < q and pow(v, N, q) == q - 1)
        assert len(hits) == 1, f"expected one 2N-th root for {q}: {hits}"
        roots.append(hits[0][1])
    return tuple(roots)


def _palisade_arrays(path: str) -> list[tuple[int, list[int]]]:
    """All (modulus, values[8192]) NativeVector payloads in a PALISADE
    blob, located by the (length, residue-bound) signature."""
    blob = open(path, "rb").read()
    out = []
    off = 0
    while off < len(blob) - 8:
        v = struct.unpack_from("<Q", blob, off)[0]
        if v == N and off + 8 + N * 8 <= len(blob):
            vals = list(struct.unpack_from(f"<{N}Q", blob, off + 8))
            mx = max(vals)
            for q in PALISADE_MODULI:
                if q // 4 < mx < q:
                    out.append((q, vals))
                    off += 8 + N * 8 - 1
                    break
        off += 1
    return out


def palisade_secret_key(dirname: str = PALISADE_DIR
                        ) -> list[tuple[int, list[int]]]:
    """[(q0, tower0), (q1, tower1)] eval-domain residues of the sk."""
    arrs = _palisade_arrays(os.path.join(dirname, "key-private.txt"))
    assert [q for q, _ in arrs] == list(PALISADE_MODULI), arrs and [
        q for q, _ in arrs]
    return arrs


def palisade_public_key(dirname: str = PALISADE_DIR):
    """((b_tower0, b_tower1), (a_tower0, a_tower1)) eval-domain residues;
    pk satisfies b + a*s = e with e small (b stored as -a*s + e)."""
    arrs = _palisade_arrays(os.path.join(dirname, "key-public.txt"))
    assert [q for q, _ in arrs] == list(PALISADE_MODULI) * 2
    return (arrs[0][1], arrs[1][1]), (arrs[2][1], arrs[3][1])


def palisade_key_tag(path: str) -> str:
    """The 32-hex-char PALISADE key tag identifying the keygen instance
    a serialized key belongs to (CEREAL blobs embed it in the clear)."""
    tags = set(re.findall(rb"[0-9a-f]{32}", open(path, "rb").read()))
    assert len(tags) == 1, f"expected one key tag in {path}: {tags}"
    return tags.pop().decode()


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


EVALMULT_N = 16384  # ring dimension of the orphan relin key (see below)


def evalmult_key_regions():
    """Forensic parse of key-eval-mult.txt (LPEvalKeyRelinImpl<DCRTPoly>,
    class name in the clear at byte 44).

    Layout recovered from the bytes: 20 tower polynomials, each a
    contiguous run of 16384 u64 residues whose TRAILER carries the
    tower's modulus (twice), its primitive 2N-th root of unity, and the
    cyclotomic order 32768 / ring dim 16384 as u32 fields — i.e. FOUR
    DCRTPolys (b/a rows of a 2-digit key-switch key) over a 5-tower
    chain [60, 52, 53 | 60, 60]-bit repeated per poly. Returns a list
    of 20 (modulus, root, values[16384]) tuples in file order.

    Self-validating twice over: the root is located by
    pow(root, N, q) == q-1 (a wrong boundary guess cannot parse), and
    each value block ends flush against its trailer's first modulus
    word, so boundaries are exact."""
    import numpy as np
    blob = open(os.path.join(PYBIND_DIR, "key-eval-mult.txt"), "rb").read()

    # every NTT-friendly prime occurrence in the file (numpy prefilter:
    # v % 2N == 1 constrains the two low bytes)
    b = np.frombuffer(blob, dtype=np.uint8)
    cand = np.where((b[:-8] == 1) & ((b[1:-7] & 0x7F) == 0))[0]
    occ = []
    for off in cand:
        v = struct.unpack_from("<Q", blob, int(off))[0]
        if (2**40 < v < 2**61 and v % (2 * EVALMULT_N) == 1
                and _is_prime(v)):
            w = struct.unpack_from("<Q", blob, int(off) + 8)[0]
            root = (w if 1 < w < v and pow(w, EVALMULT_N, v) == v - 1
                    else None)
            occ.append((int(off), v, root))

    # collapse occurrences within one trailer (modulus appears twice,
    # ~30 bytes apart, root after the second occurrence where present)
    clusters = []
    for off, v, root in occ:
        if clusters and clusters[-1][1] == v and off - clusters[-1][0] < 64:
            if root is not None:
                clusters[-1][2] = root
        else:
            clusters.append([off, v, root])

    # chain moduli are the ones recurring across the four b/a rows;
    # residue values that coincidentally decode as NTT primes occur once
    from collections import Counter
    counts = Counter(v for _, v, _ in clusters)
    chain_set = {v for v, c in counts.items() if c >= 4}
    roots = {v: r for _, v, r in clusters if r is not None and
             v in chain_set}
    trailers = [(off, v) for off, v, _ in clusters
                if v in chain_set and off > 3000]
    assert len(trailers) == 20 and len(chain_set) == 5, (
        len(trailers), chain_set)

    out = []
    prev_end = 0
    for m_off, q in trailers:
        # the data block is the N words ending flush at the trailer's
        # first modulus word
        start = m_off - EVALMULT_N * 8
        assert start >= prev_end, "blocks overlap — bad trailer offsets"
        vals = np.frombuffer(blob, dtype="<u8", count=EVALMULT_N,
                             offset=start)
        assert int(vals.max()) < q, f"block at {start} out of range"
        assert int(vals[0]) >= 1 << 16 and int(vals[1]) >= 1 << 16
        out.append((q, roots[q], vals))
        prev_end = m_off
    return out


# ---------------------------------------------------------------------------
# TenSEAL / SEAL
# ---------------------------------------------------------------------------

class _BytesOnlyUnpickler(pickle.Unpickler):
    """The committed pickle holds a single bytes object; refuse anything
    that would import code."""

    def find_class(self, module, name):
        raise pickle.UnpicklingError(
            f"vector pickle must not reference {module}.{name}")


def _proto_walk(b: bytes):
    i = 0
    out = []
    while i < len(b):
        tag = b[i]
        fld, wt = tag >> 3, tag & 7
        i += 1
        if wt == 2:
            ln = sh = 0
            while True:
                c = b[i]
                i += 1
                ln |= (c & 0x7F) << sh
                sh += 7
                if not (c & 0x80):
                    break
            out.append((fld, b[i:i + ln]))
            i += ln
        elif wt == 0:
            v = sh = 0
            while True:
                c = b[i]
                i += 1
                v |= (c & 0x7F) << sh
                sh += 7
                if not (c & 0x80):
                    break
            out.append((fld, v))
        elif wt == 1:
            out.append((fld, int.from_bytes(b[i:i + 8], "little")))
            i += 8
        elif wt == 5:
            out.append((fld, int.from_bytes(b[i:i + 4], "little")))
            i += 4
        else:
            raise ValueError(f"unexpected wire type {wt}")
    return out


def _seal_payload(b: bytes) -> bytes:
    """Unwrap a Microsoft SEAL serialized object: 16-byte SEALHeader
    (magic 0xA15E u16 | header size u8 | version | compr_mode u8 at +5 |
    total size u64 at +8) then a none/zlib/zstd payload."""
    assert b[:2] == b"\x5e\xa1", f"not a SEAL blob: {b[:4].hex()}"
    compr = b[5]
    size = struct.unpack_from("<Q", b, 8)[0]
    payload = b[16:size]
    if compr == 2:
        import zstandard
        payload = zstandard.ZstdDecompressor().decompress(
            payload, max_output_size=1 << 26)
    elif compr == 1:
        import zlib
        payload = zlib.decompress(payload)
    return payload


def tenseal_context():
    """Parse the committed TenSEAL context -> (moduli, pk_polys, sk_limbs).

    moduli: the 4 SEAL coeff moduli ([60,40,40,60] bit sizes).
    pk: ((poly0 limbs), (poly1 limbs)) — 4 limbs each, eval domain.
    sk: 4 limbs, eval domain (SEAL stores sk over the full chain incl.
    the special modulus).
    """
    with open(TENSEAL_PICKLE, "rb") as f:
        blob = _BytesOnlyUnpickler(f).load()
    top = _proto_walk(blob)
    fields = {fld: sub for fld, sub in top}

    ep = _seal_payload(fields[1])
    # EncryptionParameters payload: scheme u8, poly degree u64, count u64,
    # then `count` SEALHeader-wrapped Modulus objects (24 bytes each).
    scheme = ep[0]
    degree, count = struct.unpack_from("<QQ", ep, 1)
    assert scheme == 2 and degree == N, (scheme, degree)
    moduli = []
    off = 17
    for _ in range(count):
        sub = ep[off:off + 24]
        moduli.append(struct.unpack_from("<Q", _seal_payload(sub), 0)[0])
        off += 24

    def limbs(raw: bytes, npoly: int):
        data = raw[-npoly * count * N * 8:]
        out = []
        for p in range(npoly):
            pol = []
            for l in range(count):
                vals = list(struct.unpack_from(
                    f"<{N}Q", data, (p * count + l) * N * 8))
                assert max(vals) < moduli[l]
                pol.append(vals)
            out.append(pol)
        return out

    pk = limbs(_seal_payload(_proto_walk(fields[2])[0][1]), 2)
    sk = limbs(_seal_payload(_proto_walk(fields[3])[0][1]), 1)[0]
    return moduli, (pk[0], pk[1]), sk


class _OrderedDictOnlyUnpickler(pickle.Unpickler):
    """tenseal_model.pickle is an OrderedDict of bytes; allow exactly
    that one import and nothing that would execute code."""

    def find_class(self, module, name):
        if (module, name) == ("collections", "OrderedDict"):
            import collections
            return collections.OrderedDict
        raise pickle.UnpicklingError(
            f"vector pickle must not reference {module}.{name}")


def tenseal_model_ciphertexts():
    """Parse reference code/tenseal_model.pickle: for each state_dict key
    a TenSEAL CKKSVector protobuf (field 1 = vector size, field 2 = the
    Microsoft SEAL Ciphertext blob, field 3 = scale as f64 bits).

    Returns {name: dict(size, scale, parms_id, is_ntt, degree,
    coeff_mod_size, polys)} with polys[2][3][8192] eval-domain residues.
    SEAL Ciphertext payload layout (save_members): parms_id 4xu64,
    is_ntt_form u8, size u64, poly_modulus_degree u64, coeff_modulus_size
    u64, scale f64, then the coefficient data as the trailing
    size*coeff_mod_size*degree u64 words."""
    with open(TENSEAL_MODEL_PICKLE, "rb") as f:
        d = _OrderedDictOnlyUnpickler(f).load()
    out = {}
    for name, v in d.items():
        fields = {fld: sub for fld, sub in _proto_walk(v)}
        size = fields[1][0] if isinstance(fields[1], bytes) else fields[1]
        payload = _seal_payload(fields[2])
        parms_id = struct.unpack_from("<4Q", payload, 0)
        is_ntt = payload[32]
        npoly, degree, cms = struct.unpack_from("<3Q", payload, 33)
        scale = struct.unpack_from("<d", payload, 57)[0]
        data = payload[-npoly * cms * degree * 8:]
        polys = []
        for p in range(npoly):
            pol = []
            for l in range(cms):
                pol.append(list(struct.unpack_from(
                    f"<{degree}Q", data, (p * cms + l) * degree * 8)))
            polys.append(pol)
        out[name] = dict(size=size, scale=scale, parms_id=parms_id,
                         is_ntt=is_ntt, degree=degree,
                         coeff_mod_size=cms, polys=polys)
    return out


def reference_model_weights():
    """Forensic parse of reference code/model.pickle — the torch
    state_dict of the Linear(100, 1) model (reference benchmark.py:50-53)
    whose encrypted form is tenseal_model.pickle — WITHOUT importing
    torch: each legacy FloatStorage payload inside the pickle is
    [pickled storage-key list][u64 count][count f32 LE values].

    Returns {'weight': (100,) f32, 'bias': (1,) f32}."""
    import numpy as np
    blob = open(TORCH_MODEL_PICKLE, "rb").read()
    vals = {}
    for m in re.finditer(rb"\x80\x02\]q\x00X\t\x00\x00\x00\d{9}q\x01a\.",
                         blob):
        off = m.end()
        cnt = struct.unpack_from("<Q", blob, off)[0]
        vals[cnt] = np.frombuffer(blob, dtype="<f4", count=cnt,
                                  offset=off + 8).copy()
    assert set(vals) == {100, 1}, set(vals)
    return {"weight": vals[100], "bias": vals[1]}
