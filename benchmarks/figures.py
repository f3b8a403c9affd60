"""Figure generation (reference code/figs/*.py family).

Reads results/*.jsonl produced by the benchmark drivers and renders the
reference's figure set with our measurements overlaid on the published
baseline series (hardcoded in the reference scripts, mirrored here from
BASELINE.md):

  comp_time.pdf   per-model secure-agg wall-clock, ours vs reference CPU
                  (processing.py / processing_comp.py)
  comm.pdf        communication expansion per model (processing_comm.py)
  round_pie.pdf   FL-round phase composition (processing_pie*.py)
  selective.pdf   ciphertext bytes vs encryption rate (processing_comm
                  selective series)

Usage: python -m benchmarks.figures [--out results/figs]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from .common import results_dir

# Published reference series (BASELINE.md; figs/processing.py:11-85).
REF_MODELS = ["linear", "tst", "mlp", "rnn_lstm", "cnn_fedavg",
              "mobilenet", "resnet18", "resnet34", "resnet50",
              "groupvit", "vit", "bert"]
REF_FHE_S = [0.216, 2.792, 0.586, 1.195, 2.456, 9.481, 19.950, 37.555,
             46.672, 86.098, 112.504, 136.914]
REF_PLAIN_S = [0.001, 0.700, 0.010, 0.033, 0.058, 1.031, 1.100, 2.925,
               5.379, 19.921, 17.739, 19.674]
# NB: reference series index 3 is RNN; TST occupies index 1. LeNet is
# only in processing_comp.py and omitted here, matching the 12-bar plot.
REF_COMM_RATIO = [240.8, 10.1, 17.1, 16.7, 16.7, 16.5, 16.6, 16.6, 16.6,
                  16.6, 16.6, 16.6]
REF_PIE = {"Train": 148.3, "Enc": 9.98, "Agg": 17.48, "Dec": 19.20,
           "Comm": 2 * 8.09}           # figs/processing_pie.py:4-6
REF_SELECTIVE_BERT = {0.1: 1_095_986_994, 0.5: 3_768_961_664,
                      1.0: 7_280_824_320}  # processing_comm.py:81-107


def _load_jsonl(name: str) -> list[dict]:
    path = os.path.join(results_dir(), name)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(results_dir(), "figs"))
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ours = {}
    for r in _load_jsonl("model_bench.jsonl"):
        # Figures plot the reference-accounting phase split, which only
        # the staged cohort/bytes rows carry; fused one-dispatch rows
        # (path "fused") report a single 'round' phase and are skipped.
        if r.get("path") == "fused":
            continue
        ours[r["model"]] = r          # last run wins

    # -- comp_time ---------------------------------------------------------
    fig, ax = plt.subplots(figsize=(10, 4))
    x = np.arange(len(REF_MODELS))
    ax.bar(x - 0.2, REF_FHE_S, 0.4, label="reference CPU (published)")
    ours_t = [ours[m]["total"] if m in ours else np.nan
              for m in REF_MODELS]
    ax.bar(x + 0.2, ours_t, 0.4, label="ours (TPU)")
    ax.set_yscale("log")
    ax.set_xticks(x, REF_MODELS, rotation=45, ha="right")
    ax.set_ylabel("secure agg total (s)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "comp_time.pdf"))
    plt.close(fig)

    # -- comm --------------------------------------------------------------
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.bar(x - 0.2, REF_COMM_RATIO, 0.4, label="reference (published)")
    ours_c = [ours[m]["comm_expansion"] if m in ours else np.nan
              for m in REF_MODELS]
    ax.bar(x + 0.2, ours_c, 0.4, label="ours")
    ax.set_yscale("log")
    ax.set_xticks(x, REF_MODELS, rotation=45, ha="right")
    ax.set_ylabel("ciphertext / plaintext bytes")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "comm.pdf"))
    plt.close(fig)

    # -- round pie ---------------------------------------------------------
    fig, axes = plt.subplots(1, 2, figsize=(9, 4))
    axes[0].pie(list(REF_PIE.values()), labels=list(REF_PIE.keys()),
                autopct="%1.1f%%")
    axes[0].set_title("reference round (published)")
    cnn = ours.get("cnn_fedavg")
    if cnn:
        ph = cnn["phases"]
        vals = {"Train": REF_PIE["Train"], "Enc": ph["encrypt"],
                "Agg": ph["aggregate"], "Dec": ph["decrypt"],
                "Comm": REF_PIE["Comm"]}
        axes[1].pie(list(vals.values()), labels=list(vals.keys()),
                    autopct="%1.1f%%")
        axes[1].set_title("ours (TPU crypto phases)")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "round_pie.pdf"))
    plt.close(fig)

    # -- selective ---------------------------------------------------------
    fig, ax = plt.subplots(figsize=(6, 4))
    rates = sorted(REF_SELECTIVE_BERT)
    ax.plot(rates, [REF_SELECTIVE_BERT[r] for r in rates], "o-",
            label="reference BERT (published)")
    sel = [r for r in _load_jsonl("selective.jsonl")]
    if sel:
        by_rate = sorted((r["rate"], r["ct_bytes"]) for r in sel)
        ax.plot([r for r, _ in by_rate], [b for _, b in by_rate], "s-",
                label=f"ours ({sel[0].get('model', '?')})")
    ax.set_xlabel("encryption rate")
    ax.set_ylabel("ciphertext bytes")
    ax.set_yscale("log")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "selective.pdf"))
    plt.close(fig)

    made = sorted(os.listdir(args.out))
    print("wrote", ", ".join(made), "to", args.out)
    return made


if __name__ == "__main__":
    main()
