"""Federated averaging under encryption, pytree-native.

The reference's FL pipeline flattens a torch state_dict, encrypts per key
per client in a Python loop, aggregates, decrypts, reshapes
(benchmark_crypto.py:151-233, function_helper.py:7-26). Here the whole
model is flattened once into a single vector (pytree-level), encrypted in
one batched call, aggregated in one fused kernel, and unflattened — no
per-layer Python loop ever touches the device.

Selective encryption (reference benchmark_selection.py:39-57 — by layer —
and benchmark_selection_rate.py:134-139 — first `rate` fraction of each
tensor) is expressed as a per-leaf policy; the encrypted segments of all
leaves are concatenated and processed as one ciphertext batch, the plain
remainder is aggregated directly.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax


@dataclasses.dataclass(frozen=True)
class SelectivePolicy:
    """Which parts of the model get encrypted.

    layer_mask: optional list/set of leaf indices (or a predicate on
        (index, path)) selecting leaves to encrypt entirely
        (benchmark_selection.py:39-46 semantics).
    rate: optional fraction p in [0, 1]: encrypt the first ceil(p * size)
        elements of every (selected) leaf
        (benchmark_selection_rate.py:134-139 semantics).
    """
    layer_mask: object = None
    rate: float | None = None

    def leaf_selected(self, idx: int, path=None) -> bool:
        if self.layer_mask is None:
            return True
        if callable(self.layer_mask):
            return bool(self.layer_mask(idx, path))
        return idx in self.layer_mask

    def enc_count(self, size: int) -> int:
        if self.rate is None:
            return size
        return min(size, math.ceil(self.rate * size))


FULL = SelectivePolicy()


def flatten_params(pytree):
    """pytree of arrays -> (flat float32 vector, spec). Parity with
    tensor_to_numpy_arr / tensor_shape (function_helper.py:7-26)."""
    leaves, treedef = jax.tree_util.tree_flatten(pytree)
    flats = [np.asarray(x).reshape(-1).astype(np.float32) for x in leaves]
    shapes = [np.asarray(x).shape for x in leaves]
    sizes = [f.size for f in flats]
    flat = np.concatenate(flats) if flats else np.zeros(0, np.float32)
    return flat, (treedef, shapes, sizes)


def unflatten_params(flat, spec):
    """Inverse of flatten_params (numpy_arr_to_tensor parity)."""
    treedef, shapes, sizes = spec
    out = []
    off = 0
    for shp, sz in zip(shapes, sizes):
        out.append(np.asarray(flat[off:off + sz],
                              dtype=np.float32).reshape(shp))
        off += sz
    return jax.tree_util.tree_unflatten(treedef, out)


def split_by_policy(flat, spec, policy: SelectivePolicy):
    """Split a flat model vector into (encrypted_part, plain_part, plan).

    plan records per-leaf (enc_len, plain_len) so the split is invertible.
    """
    _, _, sizes = spec
    enc_segs, plain_segs, plan = [], [], []
    off = 0
    for idx, sz in enumerate(sizes):
        leaf = flat[off:off + sz]
        off += sz
        if policy.leaf_selected(idx):
            k = policy.enc_count(sz)
        else:
            k = 0
        enc_segs.append(leaf[:k])
        plain_segs.append(leaf[k:])
        plan.append((k, sz - k))
    enc = (np.concatenate(enc_segs) if enc_segs
           else np.zeros(0, np.float32))
    plain = (np.concatenate(plain_segs) if plain_segs
             else np.zeros(0, np.float32))
    return enc, plain, plan


def merge_by_policy(enc, plain, plan):
    out = []
    eo = po = 0
    for k, r in plan:
        out.append(enc[eo:eo + k])
        out.append(plain[po:po + r])
        eo += k
        po += r
    return np.concatenate(out) if out else np.zeros(0, np.float32)


def fhe_fedavg(scheme, client_params: list, weights: list[float],
               policy: SelectivePolicy = FULL, use_bytes: bool = False):
    """End-to-end secure FedAvg over pytrees.

    scheme: a fed.api.CKKS (or any Scheme) instance with keys loaded.
    client_params: list of pytrees (same structure).
    weights: scaling factors, typically summing to 1.
    use_bytes: force the per-client bytes wire path (the reference's
        client<->server boundary, ckks.cpp:98-101). By default the whole
        cohort goes through the device-resident fast path when the scheme
        offers one (fed.api.CKKS.fedavg_round) — no per-client dispatch, no
        host serialize/deserialize round-trip.

    Returns the aggregated pytree. The plaintext remainder (selective mode)
    is aggregated directly (benchmark_selection.py:152-158 semantics).
    """
    assert len(client_params) == len(weights)
    flats, specs = zip(*(flatten_params(p) for p in client_params))
    spec = specs[0]

    encs, plains = [], []
    plan = None
    for f in flats:
        e, pl, plan = split_by_policy(f, spec, policy)
        encs.append(e)
        plains.append(pl)

    if encs[0].size:
        if not use_bytes and hasattr(scheme, "fedavg_round"):
            enc_out = scheme.fedavg_round(
                encs, list(weights), encs[0].size).astype(np.float32)
        else:
            blobs = [scheme.encrypt(e) for e in encs]
            agg_blob = scheme.computeWeightedAverage(blobs, list(weights))
            enc_out = scheme.decrypt(agg_blob, encs[0].size).astype(np.float32)
    else:
        enc_out = np.zeros(0, np.float32)

    if plains[0].size:
        plain_out = sum(w * p.astype(np.float64)
                        for w, p in zip(weights, plains)).astype(np.float32)
    else:
        plain_out = np.zeros(0, np.float32)

    return unflatten_params(merge_by_policy(enc_out, plain_out, plan), spec)


def plain_fedavg(client_params: list, weights: list[float]):
    """Plaintext FedAvg baseline (benchmark.py:37-45)."""
    flats, specs = zip(*(flatten_params(p) for p in client_params))
    agg = sum(w * f.astype(np.float64) for w, f in zip(weights, flats))
    return unflatten_params(agg.astype(np.float32), specs[0])
