"""Stable wire format for ciphertexts and key material.

The reference serializes PALISADE objects to opaque binary blobs as the
client<->server boundary (ckks.cpp:98-101, 41-56). Here the format is a
small explicit header + raw little-endian uint32 limb data, stable across
hosts, so "bytes on the wire" remains the deployment boundary concept.

Layout (ciphertext):
  magic 'FFTC' | ver u16 | ring_dim u32 | batch u32 | scale_bits u16 |
  chunks u32 | live u32 | level u16 | scale f64 | payload u32[chunks*2*live*N]

Keys use magic 'FFTK' with a kind byte (0=secret, 1=public) and the same
limb layout.
"""

from __future__ import annotations

import io
import struct

import numpy as np
import jax.numpy as jnp

from .params import CkksContext
from .keys import SecretKey, PublicKey
from .ops import Ciphertext, SeededCiphertext, expand_seeded
from ..utils.devput import device_materialize

_CT_MAGIC = b"FFTC"       # coefficient-packed ciphertext
_CTP_MAGIC = b"FFTP"      # slot-packed (canonical embedding) ciphertext
_SCT_MAGIC = b"FFTS"
_KEY_MAGIC = b"FFTK"
_VER = 1
_CT_HDR = struct.Struct("<4sHIIHIIHd")
_KEY_HDR = struct.Struct("<4sHBIII")

CT_HEADER_BYTES = _CT_HDR.size


def serialize_ct(ctx: CkksContext, ct: Ciphertext,
                 packing: str = "coeff") -> bytes:
    """packing="slots" stamps the slot-packed magic so a coefficient-mode
    consumer cannot silently mis-decode the blob (the coeff wire format
    is byte-identical to v1 — pinned digests unaffected)."""
    data = np.asarray(ct.data)
    chunks, two, live, n = data.shape
    assert two == 2
    magic = _CTP_MAGIC if packing == "slots" else _CT_MAGIC
    hdr = _CT_HDR.pack(magic, _VER, ctx.ring_dim, ctx.params.batch,
                       ctx.params.scale_bits, chunks, live, ct.level,
                       float(ct.scale))
    return hdr + np.ascontiguousarray(data, dtype="<u4").tobytes()


def deserialize_ct(ctx: CkksContext, blob: bytes,
                   packing: str = "coeff") -> Ciphertext:
    magic, ver, ring_dim, batch, scale_bits, chunks, live, level, scale = \
        _CT_HDR.unpack_from(blob, 0)
    want = _CTP_MAGIC if packing == "slots" else _CT_MAGIC
    if magic in (_CT_MAGIC, _CTP_MAGIC) and magic != want:
        raise ValueError(
            "ciphertext packing mismatch: blob is "
            f"{'slot' if magic == _CTP_MAGIC else 'coefficient'}-packed "
            f"but this helper decodes {packing!r}")
    if magic != want or ver != _VER:
        raise ValueError("not a fhe_fed_tpu ciphertext blob")
    if ring_dim != ctx.ring_dim or scale_bits != ctx.params.scale_bits:
        raise ValueError(
            f"ciphertext params (N={ring_dim}, sb={scale_bits}) do not match "
            f"context (N={ctx.ring_dim}, sb={ctx.params.scale_bits})")
    n = ring_dim
    arr = np.frombuffer(blob, dtype="<u4", offset=_CT_HDR.size)
    arr = arr.reshape(chunks, 2, live, n)
    return Ciphertext(data=jnp.asarray(arr), scale=scale, level=level)


def serialize_seeded_ct(ctx: CkksContext, sct: SeededCiphertext) -> bytes:
    """Seed-compressed fresh ciphertext: header | seed u32[4] | c0 payload.
    Half the bytes of serialize_ct (c1 is expanded from the 128-bit seed
    server-side; see ops.SeededCiphertext)."""
    c0 = np.asarray(sct.c0)
    chunks, live, n = c0.shape
    hdr = _CT_HDR.pack(_SCT_MAGIC, _VER, ctx.ring_dim, ctx.params.batch,
                       ctx.params.scale_bits, chunks, live, sct.level,
                       float(sct.scale))
    seed = np.ascontiguousarray(np.asarray(sct.seed), dtype="<u4")
    return hdr + seed.tobytes() + \
        np.ascontiguousarray(c0, dtype="<u4").tobytes()


def deserialize_seeded_ct(ctx: CkksContext, blob: bytes) -> SeededCiphertext:
    magic, ver, ring_dim, batch, scale_bits, chunks, live, level, scale = \
        _CT_HDR.unpack_from(blob, 0)
    if magic != _SCT_MAGIC or ver != _VER:
        raise ValueError("not a fhe_fed_tpu seeded-ciphertext blob")
    if ring_dim != ctx.ring_dim or scale_bits != ctx.params.scale_bits:
        raise ValueError("seeded ciphertext params do not match context")
    seed = np.frombuffer(blob, dtype="<u4", offset=_CT_HDR.size, count=4)
    c0 = np.frombuffer(blob, dtype="<u4", offset=_CT_HDR.size + 16)
    c0 = c0.reshape(chunks, live, ring_dim)
    return SeededCiphertext(c0=jnp.asarray(c0), seed=jnp.asarray(seed),
                            scale=scale, level=level)


def deserialize_any_ct(ctx: CkksContext, blob: bytes,
                       packing: str = "coeff") -> Ciphertext:
    """Dispatch on magic: full ciphertexts pass through, seed-compressed
    fresh ciphertexts are expanded to full (c0, c1) on this side."""
    if blob[:4] == _SCT_MAGIC:
        return expand_seeded(ctx, deserialize_seeded_ct(ctx, blob))
    return deserialize_ct(ctx, blob, packing=packing)


def _pack_key_arrays(kind: int, ring_dim: int, arrays: list[np.ndarray]) -> bytes:
    out = io.BytesIO()
    a0 = np.asarray(arrays[0])
    out.write(_KEY_HDR.pack(_KEY_MAGIC, _VER, kind, ring_dim,
                            a0.shape[0], len(arrays)))
    for a in arrays:
        out.write(np.ascontiguousarray(np.asarray(a), dtype="<u4").tobytes())
    return out.getvalue()


def _unpack_key_arrays(blob: bytes, want_kind: int):
    magic, ver, kind, ring_dim, L, count = _KEY_HDR.unpack_from(blob, 0)
    if magic != _KEY_MAGIC or ver != _VER or kind != want_kind:
        raise ValueError("not a matching fhe_fed_tpu key blob")
    flat = np.frombuffer(blob, dtype="<u4", offset=_KEY_HDR.size)
    n = flat.size // (count * L)
    return [a.reshape(L, n) for a in np.split(flat, count)]


def serialize_secret_key(ctx: CkksContext, sk: SecretKey) -> bytes:
    return _pack_key_arrays(0, ctx.ring_dim, [sk.s, sk.s_shoup])


def deserialize_secret_key(blob: bytes) -> SecretKey:
    s, s_shoup = _unpack_key_arrays(blob, 0)
    return device_materialize(SecretKey(s=s, s_shoup=s_shoup))


def serialize_public_key(ctx: CkksContext, pk: PublicKey) -> bytes:
    return _pack_key_arrays(
        1, ctx.ring_dim, [pk.p0, pk.p0_shoup, pk.p1, pk.p1_shoup])


def deserialize_public_key(blob: bytes) -> PublicKey:
    p0, p0s, p1, p1s = _unpack_key_arrays(blob, 1)
    return device_materialize(
        PublicKey(p0=p0, p0_shoup=p0s, p1=p1, p1_shoup=p1s))
