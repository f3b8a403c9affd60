"""ThresholdCKKS Scheme: the mkhe ceremony (mkhe.cpp:188-465) wired into
the FL pipeline as a drop-in Scheme — no party ever holds the joint
secret key. Beyond the reference, whose threshold CKKS lives only in a
standalone timing binary while its production path gives every learner
the single sk (ckks.cpp:11-23)."""

import numpy as np
import jax
import pytest

from fhe_fed_tpu import (ThresholdCKKS, fhe_fedavg, plain_fedavg,
                         get_scheme, SelectivePolicy)


@pytest.fixture(scope="module")
def helper(tmp_path_factory):
    d = tmp_path_factory.mktemp("thr_cryptoparams")
    h = ThresholdCKKS("ckks-threshold", batchSize=128, scaleFactorBits=40,
                      cryptodir=str(d), parties=3, seed=5)
    h.genCryptoContextAndKeyGen()
    return h


def test_registered_and_no_single_key(helper):
    assert get_scheme("ckks-threshold") is ThresholdCKKS
    # the defining property: no single secret key exists anywhere
    assert helper._sk is None
    assert helper._secrets.n_parties == 3


def test_bytes_path_weighted_average(helper):
    rng = np.random.default_rng(0)
    w = [0.5, 0.2, 0.3]
    v = [rng.standard_normal(500).astype(np.float32) for _ in range(3)]
    blobs = [helper.encrypt(x) for x in v]
    agg = helper.computeWeightedAverage(blobs, w)
    out = helper.decrypt(agg, 500)
    want = sum(wi * x for wi, x in zip(w, v))
    np.testing.assert_allclose(out, want, atol=2e-3)


def test_fedavg_round_uses_threshold_fused_kernel(helper, monkeypatch):
    """fedavg_round must never touch the single-sk symmetric kernel (no
    single sk exists); by default it runs the THRESHOLD fused round
    (joint-pk encrypt -> weighted sum -> decryption ceremony in one XLA
    computation), and fused=False stages with the threshold decrypt."""
    from fhe_fed_tpu.ckks import ops as ckks_ops
    from fhe_fed_tpu.ckks import threshold as thr
    monkeypatch.setattr(
        ckks_ops, "fedavg_round_fused",
        lambda *a, **kw: pytest.fail("threshold mode has no single sk — "
                                     "the symmetric fused kernel must not "
                                     "run"))
    calls = []
    real = thr.threshold_round_fused
    monkeypatch.setattr(
        thr, "threshold_round_fused",
        lambda *a, **kw: (calls.append(1), real(*a, **kw))[1])
    rng = np.random.default_rng(1)
    w = [0.25, 0.25, 0.5]
    v = [rng.standard_normal(500).astype(np.float32) for _ in range(3)]
    want = sum(wi * x for wi, x in zip(w, v))
    out = helper.fedavg_round(v, w, 500)
    assert calls == [1], "threshold fused round did not run"
    np.testing.assert_allclose(out, want, atol=2e-3)
    out_staged = helper.fedavg_round(v, w, 500, fused=False)
    assert calls == [1]
    np.testing.assert_allclose(out_staged, want, atol=2e-3)


def test_pytree_fedavg_and_selective(helper):
    rng = np.random.default_rng(2)

    def model():
        return {"a": rng.standard_normal((7, 9)).astype(np.float32),
                "b": rng.standard_normal((33,)).astype(np.float32)}

    clients = [model() for _ in range(3)]
    weights = [1 / 3] * 3
    got = fhe_fedavg(helper, clients, weights)
    want = plain_fedavg(clients, weights)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=2e-3)
    got_sel = fhe_fedavg(helper, clients, weights,
                         policy=SelectivePolicy(rate=0.4))
    for k in want:
        np.testing.assert_allclose(got_sel[k], want[k], atol=2e-3)


def test_share_persistence_roundtrip(helper):
    """A fresh instance reloads the joint pk + per-party shares and can
    run the decryption ceremony."""
    rng = np.random.default_rng(3)
    v = rng.standard_normal(500).astype(np.float32)
    blob = helper.computeWeightedAverage([helper.encrypt(v)], [1.0])
    h2 = ThresholdCKKS("ckks-threshold", batchSize=128,
                       scaleFactorBits=40, cryptodir=helper.cryptodir,
                       parties=3)
    h2.loadCryptoParams()
    out = h2.decrypt(blob, 500)
    np.testing.assert_allclose(out, v, atol=2e-3)
    # mismatched party count must refuse to load
    h3 = ThresholdCKKS("ckks-threshold", batchSize=128,
                       scaleFactorBits=40, cryptodir=helper.cryptodir,
                       parties=4)
    with pytest.raises(ValueError):
        h3.loadCryptoParams()


def test_per_party_protocol_matches_ceremony(helper):
    """The deployment shape — each party publishes its partial, fusion
    combines them — agrees with the one-dispatch ceremony."""
    rng = np.random.default_rng(4)
    w = [0.5, 0.2, 0.3]
    v = [rng.standard_normal(500).astype(np.float32) for _ in range(3)]
    agg = helper.computeWeightedAverage([helper.encrypt(x) for x in v], w)
    parts = [helper.partial_decrypt(i, agg, rng_key=jax.random.key(70 + i))
             for i in range(3)]
    out = helper.fuse_partials(parts, agg, 500)
    want = sum(wi * x for wi, x in zip(w, v))
    np.testing.assert_allclose(out, want, atol=2e-3)


def test_single_partial_reveals_nothing(helper):
    """One party's partial decryption alone must not decode to the
    plaintext (smudging + missing shares)."""
    v = np.zeros(500, dtype=np.float32)
    blob = helper.computeWeightedAverage([helper.encrypt(v)], [1.0])
    part = helper.partial_decrypt(0, blob, rng_key=jax.random.key(80))
    out = helper.fuse_partials([part], blob, 500)
    assert np.abs(out).max() > 1.0
