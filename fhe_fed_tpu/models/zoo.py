"""Model zoo registry — the reference's 13+ model ladder as JAX pytrees.

Mirrors the model set of reference code/benchmark.py:50-415,
benchmark_gcn.py:50-72 and model_helper.py:494-899. `build(name)` returns
a ModelSpec whose `params` (and optional `state` for BatchNorm stats)
feed straight into fed.fedavg.flatten_params — the FedAvg-under-FHE
pipeline consumes only flat parameters, exactly like the reference's
state_dict round-trip (benchmark_crypto.py:151-233).

Param-count ladder (reference figs/processing.py:11-22 vs ours):

  name        reference    ours       note
  linear      101          101        exact
  tst         5,609        124,608    reference used an older HF config;
                                      ours mirrors the modern
                                      TimeSeriesTransformerModel (125,440)
                                      with enc/dec value projection shared
  mlp         79,510       79,510     exact
  rnn_lstm    822,570      822,570    exact
  cnn_fedavg  1,663,370    1,663,370  exact
  mobilenet   3,315,428    3,315,428  exact
  resnet18    12,556,426   11,689,512 reference count is not torchvision's
                                      resnet18 (11,689,512); ours is the
                                      canonical model the code imports
  resnet34    21,797,672   21,797,672 exact
  resnet50    25,557,032   25,557,032 exact
  groupvit    55,726,609   55,726,609 exact
  vit         86,389,248   86,389,248 exact
  bert        109,482,240  109,482,240 exact
  (extra)     gcn 23,335 / lenet 88,648 / tabnet — not in the figure
              ladder but present in the reference code.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax

from . import basic, convnets, transformers_zoo, graph_tabular
from .layers import param_count


@dataclasses.dataclass
class ModelSpec:
    name: str
    params: Any
    state: Any                      # BatchNorm running stats or None
    apply: Callable | None
    reference_count: int | None     # published ladder value (None if absent)

    @property
    def count(self) -> int:
        return param_count(self.params)


# name -> (builder(key) -> (params, state, apply), reference_count)
def _no_state(init, apply):
    def build(key):
        p = init(key)
        return p, None, apply
    return build


def _with_state(init, apply):
    def build(key):
        p, s = init(key)
        return p, s, apply
    return build


_REGISTRY: dict[str, tuple[Callable, int | None]] = {
    "linear": (_no_state(basic.linear_init, basic.linear_apply), 101),
    "tst": (_no_state(basic.tst_init, basic.tst_apply), 5609),
    "mlp": (_no_state(basic.mlp_init, basic.mlp_apply), 79510),
    "lenet": (_no_state(basic.lenet_init, basic.lenet_apply), None),
    "rnn_lstm": (_no_state(basic.rnn_lstm_init, basic.rnn_lstm_apply),
                 822570),
    "cnn_fedavg": (_no_state(basic.cnn_fedavg_init, basic.cnn_fedavg_apply),
                   1663370),
    "mobilenet": (_with_state(convnets.mobilenet_init,
                              convnets.mobilenet_apply), 3315428),
    "resnet18": (_with_state(lambda k: convnets.resnet_init(k, 18),
                             lambda p, s, x: convnets.resnet_apply(
                                 p, s, x, 18)), 12556426),
    "resnet34": (_with_state(lambda k: convnets.resnet_init(k, 34),
                             lambda p, s, x: convnets.resnet_apply(
                                 p, s, x, 34)), 21797672),
    "resnet50": (_with_state(lambda k: convnets.resnet_init(k, 50),
                             lambda p, s, x: convnets.resnet_apply(
                                 p, s, x, 50)), 25557032),
    "groupvit": (_no_state(transformers_zoo.groupvit_init,
                           transformers_zoo.groupvit_apply), 55726609),
    "vit": (_no_state(transformers_zoo.vit_init,
                      transformers_zoo.vit_apply), 86389248),
    "bert": (_no_state(transformers_zoo.bert_init,
                       transformers_zoo.bert_apply), 109482240),
    "gcn": (_no_state(graph_tabular.gcn_init, graph_tabular.gcn_apply),
            None),
    "tabnet": (_with_state(graph_tabular.tabnet_init,
                           graph_tabular.tabnet_apply), None),
}

MODEL_NAMES = tuple(_REGISTRY)

# The 12-model figure ladder order (figs/processing.py:11-29).
LADDER = ("linear", "tst", "mlp", "rnn_lstm", "cnn_fedavg", "mobilenet",
          "resnet18", "resnet34", "resnet50", "groupvit", "vit", "bert")


def build(name: str, seed: int = 0) -> ModelSpec:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {MODEL_NAMES}")
    builder, ref_count = _REGISTRY[name]
    params, state, apply = builder(jax.random.key(seed))
    return ModelSpec(name=name, params=params, state=state, apply=apply,
                     reference_count=ref_count)
