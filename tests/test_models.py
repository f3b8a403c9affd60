"""Model zoo: param-count ladder parity (reference figs/processing.py:11-22,
exact where the architecture is pinned) and forward smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fhe_fed_tpu import models
from fhe_fed_tpu.models import graph_tabular

EXACT = {
    "linear": 101,
    "mlp": 79510,
    "rnn_lstm": 822570,
    "cnn_fedavg": 1663370,
    "mobilenet": 3315428,
    "resnet34": 21797672,
    "resnet50": 25557032,
    "groupvit": 55726609,
    "vit": 86389248,
    "bert": 109482240,
}


@pytest.mark.parametrize("name,count", sorted(EXACT.items()))
def test_param_ladder_exact(name, count):
    spec = models.build(name)
    assert spec.count == count


def test_resnet18_canonical():
    # The reference ladder lists 12,556,426 which matches no torchvision
    # resnet; ours is the canonical 1000-class resnet18.
    assert models.build("resnet18").count == 11689512


def test_forward_small_models():
    rng = np.random.default_rng(0)
    s = models.build("linear")
    assert s.apply(s.params, jnp.ones((2, 100))).shape == (2, 1)
    s = models.build("mlp")
    assert s.apply(s.params, jnp.ones((2, 784))).shape == (2, 10)
    s = models.build("lenet")
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    assert s.apply(s.params, x).shape == (2, 100)
    s = models.build("cnn_fedavg")
    x = jnp.asarray(rng.random((2, 28, 28), dtype=np.float32))
    assert s.apply(s.params, x).shape == (2, 10)
    s = models.build("rnn_lstm")
    ids = jnp.asarray(rng.integers(0, 90, (2, 12)))
    assert s.apply(s.params, ids).shape == (2, 90)
    s = models.build("tst")
    past = jnp.asarray(rng.random((2, 24, 9), dtype=np.float32))
    fut = jnp.asarray(rng.random((2, 8, 9), dtype=np.float32))
    assert s.apply(s.params, past, fut).shape == (2, 8, 64)


def test_forward_convnets():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    s = models.build("mobilenet")
    out = s.apply(s.params, s.state, x)
    assert out.shape == (1, 100) and np.isfinite(np.asarray(out)).all()
    for name in ("resnet18", "resnet50"):
        s = models.build(name)
        out = s.apply(s.params, s.state, x)
        assert out.shape == (1, 1000) and np.isfinite(np.asarray(out)).all()


def test_forward_bert():
    s = models.build("bert")
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 30522, (1, 16)))
    seq, pooled = s.apply(s.params, ids)
    assert seq.shape == (1, 16, 768) and pooled.shape == (1, 768)
    assert np.isfinite(np.asarray(pooled)).all()


@pytest.mark.slow
def test_forward_vit_groupvit():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((1, 224, 224, 3), dtype=np.float32))
    s = models.build("vit")
    seq, pooled = s.apply(s.params, img)
    assert seq.shape == (1, 197, 768) and pooled.shape == (1, 768)

    s = models.build("groupvit")
    ids = jnp.asarray(rng.integers(1, 49408, (1, 12)))
    iemb, temb, scale = s.apply(s.params, img, ids)
    assert iemb.shape == (1, 256) and temb.shape == (1, 256)
    assert np.isfinite(np.asarray(iemb)).all()
    assert np.isfinite(np.asarray(temb)).all()


def test_forward_gcn_tabnet():
    rng = np.random.default_rng(4)
    s = models.build("gcn")
    x = jnp.asarray(rng.random((20, 1433), dtype=np.float32))
    a = jnp.asarray((rng.random((20, 20)) < 0.2).astype(np.float32))
    adj = graph_tabular.normalize_adjacency(a)
    out = s.apply(s.params, x, adj)
    assert out.shape == (20, 7)
    # log-softmax rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(1), 1.0,
                               rtol=1e-4)

    s = models.build("tabnet")
    x = jnp.asarray(rng.random((8, 54), dtype=np.float32))
    out = s.apply(s.params, s.state, x)
    assert out.shape == (8, 7) and np.isfinite(np.asarray(out)).all()


def test_sparsemax_is_simplex_projection():
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.standard_normal((6, 10)).astype(np.float32))
    p = np.asarray(graph_tabular.sparsemax(z))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
    assert (p >= 0).all()
    # sparser than softmax: some exact zeros expected for gaussian input
    assert (p == 0).any()


def test_zoo_feeds_fedavg_pipeline(tmp_path):
    """End-to-end: zoo pytree -> flatten -> fhe_fedavg -> unflatten."""
    from fhe_fed_tpu import CKKS, fhe_fedavg, flatten_params
    scheme = CKKS("ckks", 1024, 40, cryptodir=str(tmp_path))
    scheme.genCryptoContextAndKeyGen()
    scheme.loadCryptoParams()
    spec = models.build("mlp")
    clients = []
    for i in range(3):
        leaves = jax.tree_util.tree_map(
            lambda x: x + 0.01 * (i + 1), spec.params)
        clients.append(leaves)
    weights = [0.5, 0.2, 0.3]
    out = fhe_fedavg(scheme, clients, weights)
    want_flat, _ = flatten_params(jax.tree_util.tree_map(
        lambda *xs: sum(w * x for w, x in zip(weights, xs)), *clients))
    got_flat, _ = flatten_params(out)
    np.testing.assert_allclose(got_flat, want_flat, atol=1e-4)
