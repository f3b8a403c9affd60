"""3-learner weighted-average smoke demo — `SHELFI_FHE_MAIN` parity
(reference src/main.cpp:26-83: learners with weights 0.5/0.3/0.5 over
random 100-dim data; prints decrypted vs expected values).

Usage: python -m benchmarks.fedavg_demo [n_dims] [--scheme ckks|ckks-threshold]
(--scheme ckks-threshold runs the same round with 3-party threshold keys:
no single secret key exists; decryption is the multiparty ceremony.)
"""

from __future__ import annotations

import sys
import tempfile

import numpy as np

from fhe_fed_tpu import CKKS, ThresholdCKKS


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    scheme = "ckks"
    if "--scheme" in argv:
        i = argv.index("--scheme")
        scheme = argv[i + 1]
        del argv[i:i + 2]
    n = int(argv[0]) if argv else 100
    weights = [0.5, 0.3, 0.5]                 # main.cpp:55
    rng = np.random.default_rng(42)
    data = [rng.random(n).astype(np.float32) for _ in weights]

    if scheme == "ckks-threshold":
        helper = ThresholdCKKS("ckks-threshold", 4096, 52,
                               cryptodir=tempfile.mkdtemp(), parties=3)
    else:
        helper = CKKS("ckks", 4096, 52, cryptodir=tempfile.mkdtemp())
    helper.genCryptoContextAndKeyGen()
    helper.loadCryptoParams()

    blobs = [helper.encrypt(d) for d in data]
    agg = helper.computeWeightedAverage(blobs, weights)
    out = helper.decrypt(agg, n)
    want = sum(w * d for w, d in zip(weights, data))

    show = min(n, 10)
    for i in range(show):
        print(f"computed: {out[i]:.6f}   actual: {want[i]:.6f}")
    err = float(np.max(np.abs(out - want)))
    print(f"max |computed - actual| over {n} dims: {err:.3e}")
    assert err < 1e-4, "weighted average mismatch"
    return err


if __name__ == "__main__":
    main()
