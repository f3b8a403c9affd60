"""Gradient-sensitivity masking (reference attack/masking/masking.py).

The reference computes, per gradient element, d(grad)/d(label) at the
true class by an element-at-a-time torch.autograd loop
(masking.py:104-145 — O(n_params) backward passes). The JAX version is
one jacfwd over the label vector: grads are a function of the onehot
label (dim = n_classes, small), so forward-mode gives the full
(n_params, n_classes) sensitivity in n_classes passes.

The top-|sensitivity| fraction of elements is the protection mask — the
part selective encryption should cover (masking.py:15-21 get_top_k_mask).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from .dlg import cross_entropy_onehot


def gradient_sensitivity(apply: Callable, params, x: jnp.ndarray,
                         onehot: jnp.ndarray) -> jnp.ndarray:
    """|d grad_theta L / d label| at the true class, flattened to
    (n_params,). Mirrors sensitivity_each_element (masking.py:115-135)."""
    gt_class = jnp.argmax(onehot, axis=-1)

    def flat_grads(label_vec):
        def loss_fn(p):
            return cross_entropy_onehot(apply(p, x), label_vec)
        g = jax.grad(loss_fn)(params)
        leaves, _ = jax.tree_util.tree_flatten(g)
        return jnp.concatenate([l.reshape(-1) for l in leaves])

    # full f32 matmul precision — sensitivity ranks individual elements,
    # which bf16 matmul defaults visibly reorder (see dlg.model_gradients)
    with jax.default_matmul_precision("highest"):
        jac = jax.jacfwd(flat_grads)(onehot)  # (n_params, B, n_classes)
    sens = jac[:, jnp.arange(onehot.shape[0]), gt_class]
    return jnp.sum(jnp.abs(sens), axis=-1)


def top_k_mask(sensitivity: jnp.ndarray, fraction: float) -> jnp.ndarray:
    """1.0 for the top-`fraction` most sensitive elements, else 0.0 —
    get_top_k_mask (masking.py:15-21). NOTE: the protection semantics
    zero the protected elements, so the mask to APPLY to shared grads is
    (1 - this)."""
    n = sensitivity.shape[0]
    k = int(np.ceil(fraction * n))
    idx = jnp.argsort(-sensitivity)[:k]
    return jnp.zeros(n, jnp.float32).at[idx].set(1.0)


def mask_gradients(grads: list, mask_flat: jnp.ndarray) -> list:
    """Zero the protected (mask==1) elements of a flat leaf-grad list
    (masking.py:141-145: flat grads * (1-mask) semantics)."""
    out = []
    off = 0
    for g in grads:
        m = mask_flat[off:off + g.size].reshape(g.shape)
        out.append(g * (1.0 - m))
        off += g.size
    return out
