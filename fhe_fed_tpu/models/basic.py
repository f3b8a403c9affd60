"""Small models of the reference zoo, pure JAX.

Reference parity (param counts, reference code/benchmark.py):
  linear      101        nn.Linear(100, 1)            (benchmark.py:50-53)
  mlp         79,510     784-100-10 ReLU MLP          (benchmark.py:64-78)
  lenet       ~78k       4xconv(12ch,5x5)+fc768-100   (benchmark.py:81-105)
  cnn_fedavg  1,663,370  FedAvg-paper MNIST CNN       (benchmark.py:152-219)
  rnn_lstm    822,570    2xLSTM(256)+fc, vocab 90     (benchmark.py:108-149)
  tst         124,608    TimeSeriesTransformer (modern config shape; the
                         paper's figure ladder lists 5,609 from an older
                         library version — architecture unrecoverable)
                                                       (benchmark.py:56-61)

Each model is `init(key) -> params` + `apply(params, x) -> y`; params are
plain dict pytrees consumed by fed.fedavg.flatten_params.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import layers as L


# --- Linear regression: nn.Linear(100, 1) ---------------------------------

def linear_init(key):
    return L.dense_init(key, 100, 1)


def linear_apply(p, x):
    return L.dense(p, x)


# --- MLP 784-100-10 --------------------------------------------------------

def mlp_init(key):
    k1, k2 = jax.random.split(key)
    return {"fc1": L.dense_init(k1, 784, 100),
            "fc2": L.dense_init(k2, 100, 10)}


def mlp_apply(p, x):
    x = x.reshape(x.shape[0], -1)
    return L.dense(p["fc2"], jax.nn.relu(L.dense(p["fc1"], x)))


# --- LeNet (DLG-attack variant: 4 convs, sigmoid, fc 768->100) -------------

def lenet_init(key):
    k = jax.random.split(key, 5)
    return {"conv1": L.conv_init(k[0], 5, 5, 3, 12),
            "conv2": L.conv_init(k[1], 5, 5, 12, 12),
            "conv3": L.conv_init(k[2], 5, 5, 12, 12),
            "conv4": L.conv_init(k[3], 5, 5, 12, 12),
            "fc": L.dense_init(k[4], 768, 100)}


def lenet_apply(p, x):
    """x: (B, 32, 32, 3) NHWC (CIFAR)."""
    act = jax.nn.sigmoid
    x = act(L.conv2d(p["conv1"], x, stride=2))
    x = act(L.conv2d(p["conv2"], x, stride=2))
    x = act(L.conv2d(p["conv3"], x, stride=1))
    x = act(L.conv2d(p["conv4"], x, stride=1))
    x = x.reshape(x.shape[0], -1)
    return L.dense(p["fc"], x)


# --- CNN_OriginalFedAvg (1,663,370 params) --------------------------------

def cnn_fedavg_init(key, only_digits: bool = True):
    k = jax.random.split(key, 4)
    return {"conv1": L.conv_init(k[0], 5, 5, 1, 32),
            "conv2": L.conv_init(k[1], 5, 5, 32, 64),
            "fc1": L.dense_init(k[2], 3136, 512),
            "fc2": L.dense_init(k[3], 512, 10 if only_digits else 62)}


def cnn_fedavg_apply(p, x):
    """x: (B, 28, 28) or (B, 28, 28, 1)."""
    if x.ndim == 3:
        x = x[..., None]
    x = jax.nn.relu(L.conv2d(p["conv1"], x))
    x = L.max_pool(x, 2, 2)
    x = jax.nn.relu(L.conv2d(p["conv2"], x))
    x = L.max_pool(x, 2, 2)
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(L.dense(p["fc1"], x))
    return L.dense(p["fc2"], x)


# --- RNN_OriginalFedAvg: embed(90,8) + 2xLSTM(256) + fc(256,90) ------------

def rnn_lstm_init(key, vocab: int = 90, embed: int = 8, hidden: int = 256):
    k = jax.random.split(key, 4)
    return {"embed": L.embedding_init(k[0], vocab, embed),
            "lstm1": L.lstm_layer_init(k[1], embed, hidden),
            "lstm2": L.lstm_layer_init(k[2], hidden, hidden),
            "fc": L.dense_init(k[3], hidden, vocab)}


def rnn_lstm_apply(p, ids):
    """ids: (B, T) int32 -> logits (B, vocab): next-char prediction."""
    x = L.embedding(p["embed"], ids)
    x = L.lstm_layer(p["lstm1"], x)
    x = L.lstm_layer(p["lstm2"], x)
    return L.dense(p["fc"], x[:, -1])


# --- Time-series transformer (encoder-decoder, d=64) -----------------------

_TST_D = 64
_TST_FFN = 32
_TST_HEADS = 2
_TST_CTX = 24          # context_length
_TST_PRED = 24         # prediction_length
_TST_FEAT = 9          # lags(7) + log-scale features etc. -> input dim


def _tst_block_init(key, cross: bool):
    k = jax.random.split(key, 6)
    p = {"attn": L.mha_init(k[0], _TST_D),
         "ln1": L.layernorm_init(_TST_D),
         "fc1": L.dense_init(k[1], _TST_D, _TST_FFN),
         "fc2": L.dense_init(k[2], _TST_FFN, _TST_D),
         "ln2": L.layernorm_init(_TST_D)}
    if cross:
        p["xattn"] = L.mha_init(k[3], _TST_D)
        p["lnx"] = L.layernorm_init(_TST_D)
    return p


def _tst_block_apply(p, x, enc=None):
    x = L.layernorm(p["ln1"], x + L.mha(p["attn"], x, _TST_HEADS))
    if enc is not None:
        x = L.layernorm(p["lnx"], x + L.mha(p["xattn"], x, _TST_HEADS,
                                            kv=enc))
    h = L.dense(p["fc2"], jax.nn.relu(L.dense(p["fc1"], x)))
    return L.layernorm(p["ln2"], x + h)


def tst_init(key, enc_layers: int = 2, dec_layers: int = 2):
    k = jax.random.split(key, 3 + enc_layers + dec_layers)
    p = {"value_proj": {"w": jax.random.normal(k[0], (_TST_FEAT, _TST_D),
                                               jnp.float32) * 0.02},
         "enc_pos": jax.random.normal(k[1], (2 * _TST_CTX, _TST_D),
                                      jnp.float32) * 0.02,
         "dec_pos": jax.random.normal(k[2], (2 * _TST_PRED, _TST_D),
                                      jnp.float32) * 0.02,
         "enc": [_tst_block_init(k[3 + i], cross=False)
                 for i in range(enc_layers)],
         "dec": [_tst_block_init(k[3 + enc_layers + i], cross=True)
                 for i in range(dec_layers)]}
    return p


def tst_apply(p, past, future):
    """past: (B, T, feat), future: (B, S, feat) -> decoder states (B,S,D)."""
    e = past @ p["value_proj"]["w"] + p["enc_pos"][None, :past.shape[1]]
    for blk in p["enc"]:
        e = _tst_block_apply(blk, e)
    d = future @ p["value_proj"]["w"] + p["dec_pos"][None, :future.shape[1]]
    for blk in p["dec"]:
        d = _tst_block_apply(blk, d, enc=e)
    return d
