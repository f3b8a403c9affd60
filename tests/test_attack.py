"""Attack suite: DLG gradient inversion (recovers inputs from shared
gradients; fails when sensitive layers are protected), jacfwd gradient
sensitivity + top-k masking, and the similarity metrics
(reference code/attack/: code.py, masking/masking.py, similarity.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fhe_fed_tpu import attack
from fhe_fed_tpu.models import layers as L

D_IN, D_HID, N_CLS = 24, 12, 5


def tiny_model(seed=0):
    k1, k2 = jax.random.split(jax.random.key(seed))
    params = {"fc1": L.dense_init(k1, D_IN, D_HID),
              "fc2": L.dense_init(k2, D_HID, N_CLS)}

    def apply(p, x):
        return L.dense(p["fc2"], jax.nn.relu(L.dense(p["fc1"], x)))
    return params, apply


@pytest.fixture(scope="module")
def target():
    params, apply = tiny_model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, D_IN), dtype=np.float32))
    onehot = jax.nn.one_hot(jnp.asarray([2]), N_CLS)
    return params, apply, x, onehot


def test_dlg_recovers_unprotected(target):
    params, apply, x, onehot = target
    grads = attack.model_gradients(apply, params, x, onehot)
    res = attack.dlg_attack(apply, params, grads, x.shape, N_CLS,
                            steps=600, lr=0.05, seed=1)
    # label recovered exactly; input recovered to high correlation
    assert int(np.argmax(res.label)) == 2
    corr = np.corrcoef(res.data.reshape(-1), np.asarray(x).reshape(-1))[0, 1]
    assert corr > 0.9, corr
    assert res.losses[-1] < res.losses[0] * 1e-3


def test_dlg_lbfgs_recovers(target):
    """The reference's own optimizer (torch.optim.LBFGS, exp1.py) —
    optax.lbfgs converges to near-exact reconstruction in fewer steps."""
    params, apply, x, onehot = target
    grads = attack.model_gradients(apply, params, x, onehot)
    res = attack.dlg_attack(apply, params, grads, x.shape, N_CLS,
                            steps=150, seed=1, optimizer="lbfgs")
    assert int(np.argmax(res.label)) == 2
    corr = np.corrcoef(res.data.reshape(-1), np.asarray(x).reshape(-1))[0, 1]
    assert corr > 0.99, corr


def test_dlg_fails_when_protected(target):
    """Zeroing the first layer's gradients (= encrypting it) breaks the
    reconstruction (code.py protected_layers sweep)."""
    params, apply, x, onehot = target
    protected = (0, 1)   # fc1 w+b — the input-adjacent layer
    grads = attack.model_gradients(apply, params, x, onehot,
                                   protected_layers=protected)
    res = attack.dlg_attack(apply, params, grads, x.shape, N_CLS,
                            protected_layers=protected,
                            steps=600, lr=0.05, seed=1)
    corr = np.corrcoef(res.data.reshape(-1), np.asarray(x).reshape(-1))[0, 1]
    assert abs(corr) < 0.5, corr


def test_sensitivity_topk_mask(target):
    params, apply, x, onehot = target
    sens = attack.gradient_sensitivity(apply, params, x, onehot)
    n_params = sum(v.size for v in jax.tree_util.tree_leaves(params))
    assert sens.shape == (n_params,)
    assert bool(jnp.all(jnp.isfinite(sens)))
    mask = attack.top_k_mask(sens, 0.4)
    assert int(mask.sum()) == int(np.ceil(0.4 * n_params))
    grads = attack.model_gradients(apply, params, x, onehot)
    masked = attack.mask_gradients(grads, mask)
    flat = jnp.concatenate([g.reshape(-1) for g in masked])
    assert int(jnp.sum(flat == 0)) >= int(mask.sum())


def test_dlg_element_mask(target):
    """Element-level protection: the attack with a top-k sensitivity
    mask (attacker knows the mask) still recovers under a tiny mask but
    its matching loss ignores masked elements — masking EVERYTHING makes
    the loss identically minimizable to zero without recovering x."""
    params, apply, x, onehot = target
    n_params = sum(v.size for v in jax.tree_util.tree_leaves(params))
    sens = attack.gradient_sensitivity(apply, params, x, onehot)
    mask = attack.top_k_mask(sens, 1.0)        # protect everything
    grads = attack.mask_gradients(
        attack.model_gradients(apply, params, x, onehot), mask)
    assert all(float(jnp.abs(g).max()) == 0.0 for g in grads)
    res = attack.dlg_attack(apply, params, grads, x.shape, N_CLS,
                            element_mask=mask, steps=100, lr=0.05, seed=1)
    corr = np.corrcoef(res.data.reshape(-1),
                       np.asarray(x).reshape(-1))[0, 1]
    assert abs(corr) < 0.5, corr               # nothing to match -> no leak
    # zero-mask path is mathematically the unmasked objective
    zmask = jnp.zeros(n_params, jnp.float32)
    res2 = attack.dlg_attack(
        apply, params, attack.model_gradients(apply, params, x, onehot),
        x.shape, N_CLS, element_mask=zmask, steps=600, lr=0.05, seed=1)
    corr2 = np.corrcoef(res2.data.reshape(-1),
                        np.asarray(x).reshape(-1))[0, 1]
    assert corr2 > 0.9, corr2


def test_similarity_metrics():
    rng = np.random.default_rng(1)
    img = rng.random((32, 32))
    same = img.copy()
    noisy = img + rng.normal(0, 0.25, img.shape)
    other = rng.random((32, 32))

    assert attack.mssim(img, same) == pytest.approx(1.0, abs=1e-6)
    assert attack.uqi(img, same) == pytest.approx(1.0, abs=1e-6)
    assert attack.vifp(img, same) == pytest.approx(1.0, abs=1e-3)
    # noisy < perfect, unrelated < noisy
    assert attack.mssim(img, noisy) < 0.95
    assert attack.uqi(img, other) < attack.uqi(img, noisy)
    assert attack.vifp(img, other) < attack.vifp(img, noisy) < 1.0
    # msssim on a larger image exercises multi-scale
    big = rng.random((96, 96))
    assert attack.msssim(big, big) == pytest.approx(1.0, abs=1e-6)
    assert attack.msssim(big, rng.random((96, 96))) < 0.5
