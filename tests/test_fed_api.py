"""Scheme API parity tests — the reference acceptance example end-to-end
through the bytes interface (pythonApi/ckks_example.py), chunk/tail rules
(ckks.cpp:65,192-196), key persistence (ckks.cpp:11-59), selective
encryption (benchmark_selection*.py), and pytree FedAvg."""

import numpy as np
import pytest

from fhe_fed_tpu import CKKS, fhe_fedavg, plain_fedavg, SelectivePolicy


@pytest.fixture(scope="module")
def helper(tmp_path_factory):
    d = tmp_path_factory.mktemp("cryptoparams")
    # Small ring for test speed; API identical to CKKS() defaults.
    h = CKKS("ckks", batchSize=128, scaleFactorBits=40,
             cryptodir=str(d), seed=7)
    h.genCryptoContextAndKeyGen()
    h.loadCryptoParams()
    return h


def test_ckks_example_acceptance(helper):
    """3 learners x 100k dims, weights 0.5/0.2/0.3 — the reference's
    de-facto acceptance test (pythonApi/ckks_example.py:91-111), at 10k dims
    for speed."""
    dims = 10_000
    rng = np.random.default_rng(0)
    scaling = [0.5, 0.2, 0.3]
    data = [rng.random(dims) for _ in range(3)]
    blobs = [helper.encrypt(d) for d in data]
    agg = helper.computeWeightedAverage(blobs, scaling)
    out = helper.decrypt(agg, dims)
    want = sum(w * d for w, d in zip(scaling, data))
    assert out.shape == (dims,)
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_chunk_tail_rule(helper):
    """size not a multiple of batch: ceil chunking + exact tail recovery."""
    for dims in [1, 127, 128, 129, 1000]:
        rng = np.random.default_rng(dims)
        d = rng.random(dims)
        out = helper.decrypt(helper.encrypt(d), dims)
        assert out.shape == (dims,)
        np.testing.assert_allclose(out, d, atol=1e-4)


def test_key_persistence_roundtrip(tmp_path):
    h1 = CKKS("ckks", batchSize=128, scaleFactorBits=40,
              cryptodir=str(tmp_path), seed=3)
    h1.genCryptoContextAndKeyGen()
    blob = h1.encrypt(np.arange(50) / 50.0)
    # Fresh instance loads the persisted keys and can decrypt.
    h2 = CKKS("ckks", batchSize=128, scaleFactorBits=40,
              cryptodir=str(tmp_path))
    h2.loadCryptoParams()
    out = h2.decrypt(blob, 50)
    np.testing.assert_allclose(out, np.arange(50) / 50.0, atol=1e-4)


def test_mismatched_weights_raises(helper):
    with pytest.raises(ValueError):
        helper.computeWeightedAverage([b"", b""], [1.0])


def test_fused_round_matches_staged(tmp_path, monkeypatch):
    """fedavg_round's one-dispatch fused path (encrypt -> weighted sum ->
    decrypt in a single XLA computation) must agree with the staged
    three-dispatch path to CKKS precision, including the chunk-streamed
    case where each slice runs fused.

    The fused path only engages in secret-key mode (_round_slice guards on
    `self.symmetric and self._sk is not None`; pk mode always stages), so
    this test builds a symmetric helper and spies on
    ckks_ops.fedavg_round_fused to prove the fused kernel actually ran —
    a silent fallback to staging must fail here."""
    from fhe_fed_tpu.ckks import ops as ckks_ops

    h = CKKS("ckks", batchSize=128, scaleFactorBits=40,
             cryptodir=str(tmp_path), symmetric=True, seed=11)
    h.genCryptoContextAndKeyGen()

    calls = []
    real_fused = ckks_ops.fedavg_round_fused
    monkeypatch.setattr(
        ckks_ops, "fedavg_round_fused",
        lambda *a, **kw: (calls.append(1), real_fused(*a, **kw))[1])

    dims = 1000
    rng = np.random.default_rng(5)
    scaling = [0.5, 0.2, 0.3]
    data = [rng.standard_normal(dims).astype(np.float32) for _ in range(3)]
    want = sum(w * d for w, d in zip(scaling, data))
    out_f = h.fedavg_round(data, scaling, dims)
    assert len(calls) == 1, "fused path did not run (silently staged?)"
    out_s = h.fedavg_round(data, scaling, dims, fused=False)
    assert len(calls) == 1
    np.testing.assert_allclose(out_f, want, atol=1e-4)
    np.testing.assert_allclose(out_s, want, atol=1e-4)
    # Streamed: force multiple slices through the same fused program.
    out_stream = h.fedavg_round(data, scaling, dims, max_chunks=2)
    assert len(calls) == 5, "streamed slices must each run fused"
    np.testing.assert_allclose(out_stream, want, atol=1e-4)


def test_fused_round_stages_in_pk_mode(helper, monkeypatch):
    """The default (pk) helper cannot run the fused symmetric kernel:
    fedavg_round must stage, and still be correct."""
    from fhe_fed_tpu.ckks import ops as ckks_ops
    monkeypatch.setattr(
        ckks_ops, "fedavg_round_fused",
        lambda *a, **kw: pytest.fail("pk-mode round must not call the "
                                     "symmetric fused kernel"))
    dims = 500
    rng = np.random.default_rng(6)
    scaling = [0.4, 0.6]
    data = [rng.standard_normal(dims).astype(np.float32) for _ in range(2)]
    out = helper.fedavg_round(data, scaling, dims)
    np.testing.assert_allclose(
        out, sum(w * d for w, d in zip(scaling, data)), atol=1e-4)


def _toy_model(rng):
    return {
        "conv": {"w": rng.standard_normal((3, 3, 8)).astype(np.float32),
                 "b": rng.standard_normal((8,)).astype(np.float32)},
        "fc": {"w": rng.standard_normal((64, 10)).astype(np.float32)},
    }


def test_fhe_fedavg_pytree(helper):
    rng = np.random.default_rng(5)
    clients = [_toy_model(rng) for _ in range(4)]
    weights = [0.25] * 4
    got = fhe_fedavg(helper, clients, weights)
    want = plain_fedavg(clients, weights)
    for k in ["conv", "fc"]:
        for kk in want[k]:
            np.testing.assert_allclose(got[k][kk], want[k][kk], atol=1e-4)


def test_selective_by_rate(helper):
    rng = np.random.default_rng(6)
    clients = [_toy_model(rng) for _ in range(3)]
    weights = [1 / 3] * 3
    got = fhe_fedavg(helper, clients, weights,
                     policy=SelectivePolicy(rate=0.3))
    want = plain_fedavg(clients, weights)
    for k in want:
        for kk in want[k]:
            np.testing.assert_allclose(got[k][kk], want[k][kk], atol=1e-4)


def test_selective_by_layer(helper):
    rng = np.random.default_rng(7)
    clients = [_toy_model(rng) for _ in range(3)]
    weights = [0.5, 0.25, 0.25]
    got = fhe_fedavg(helper, clients, weights,
                     policy=SelectivePolicy(layer_mask={0, 2}))
    want = plain_fedavg(clients, weights)
    for k in want:
        for kk in want[k]:
            np.testing.assert_allclose(got[k][kk], want[k][kk], atol=1e-4)


def test_dense_pack_halves_ciphertext(tmp_path):
    h = CKKS("ckks", batchSize=128, scaleFactorBits=40,
             cryptodir=str(tmp_path), dense_pack=True, seed=9)
    h.genCryptoContextAndKeyGen()
    d = np.random.default_rng(8).random(1000)
    blob = h.encrypt(d)
    out = h.decrypt(blob, 1000)
    np.testing.assert_allclose(out, d, atol=1e-4)
    h2 = CKKS("ckks", batchSize=128, scaleFactorBits=40,
              cryptodir=str(tmp_path), dense_pack=False)
    h2.loadCryptoParams()
    blob2 = h2.encrypt(d)
    assert len(blob) < 0.6 * len(blob2)
