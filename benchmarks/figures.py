"""Figure generation (reference code/figs/*.py family).

Reads results/*.jsonl produced by the benchmark drivers and renders the
reference's figure set with our measurements overlaid on the published
baseline series (hardcoded in the reference scripts, mirrored here from
BASELINE.md):

  comp_time.pdf   per-model secure-agg wall-clock, ours vs reference CPU
                  (processing.py / processing_comp.py)
  comm.pdf        communication expansion per model (processing_comm.py)
  round_pie.pdf   FL-round phase composition (processing_pie*.py)
  selective.pdf   per-model ciphertext bytes + device round time vs
                  encryption rate (processing_comm selective series),
                  seeded-upload series dashed
  bandwidth_bar.pdf  round time vs link bandwidth (MAR/SAR/IB stacked
                  bars, processing_comm_bar.py family) derived from
                  measured phase times + measured ct bytes, for full /
                  seeded / 10%-selective / plaintext uploads

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
    thr_fused = {}
    for r in _load_jsonl("model_bench.jsonl"):
        if r.get("scheme") == "ckks-threshold":
            # threshold rows get their own series (fused round time);
            # they must not override the single-key phase-split bars
            if r.get("path") == "fused":
                thr_fused[r["model"]] = r
            continue
        # Figures plot the reference-accounting phase split, which only
        # the staged cohort/bytes rows carry; fused one-dispatch rows
        # (path "fused") report a single 'round' phase and are skipped.
        if r.get("path") == "fused":
            continue
        ours[r["model"]] = r          # last run wins

    # -- comp_time ---------------------------------------------------------
    fig, ax = plt.subplots(figsize=(10, 4))
    x = np.arange(len(REF_MODELS))
    ax.bar(x - 0.27, REF_FHE_S, 0.27, label="reference CPU (published)")
    ours_t = [ours[m]["total"] if m in ours else np.nan
              for m in REF_MODELS]
    ax.bar(x, ours_t, 0.27, label="ours (TPU, staged)")
    thr_t = [thr_fused[m]["total"] if m in thr_fused else np.nan
             for m in REF_MODELS]
    if not all(np.isnan(v) for v in thr_t):
        ax.bar(x + 0.27, thr_t, 0.27,
               label="ours (TPU, 3-party threshold fused round)")
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
    # bytes-vs-rate (left) and device round-time-vs-rate (right) per model,
    # overlaying the reference's published BERT byte series
    # (processing_comm.py:81-107).
    sel = [r for r in _load_jsonl("selective.jsonl")
           if r.get("path", "fused_cohort") == "fused_cohort"]
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    rates = sorted(REF_SELECTIVE_BERT)
    axes[0].plot(rates, [REF_SELECTIVE_BERT[r] for r in rates], "o--",
                 color="gray", label="reference BERT (published)")
    sel_models = sorted({r["model"] for r in sel})
    for m in sel_models:
        rows = sorted((r["rate"], r) for r in sel if r["model"] == m)
        axes[0].plot([rr for rr, _ in rows],
                     [r["ct_bytes"] for _, r in rows], "s-",
                     label=f"ours {m}")
        axes[0].plot([rr for rr, _ in rows],
                     [r["ct_bytes_seeded"] for _, r in rows], "s:",
                     alpha=0.6, label=f"ours {m} (seeded)")
        axes[1].plot([rr for rr, _ in rows],
                     [r["round_s"] for _, r in rows], "s-", label=m)
    axes[0].set_xlabel("encryption rate")
    axes[0].set_ylabel("ciphertext bytes / client upload")
    axes[0].set_yscale("log")
    axes[0].legend(fontsize=7)
    axes[1].set_xlabel("encryption rate")
    axes[1].set_ylabel("device round time (s)")
    axes[1].set_yscale("log")
    if sel_models:
        axes[1].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "selective.pdf"))
    plt.close(fig)

    # -- attack: reconstruction quality vs top-k protection ---------------
    # sensitivity-based element masking (attack/masking.py, reference
    # masking/masking.py:104-145) driven through the DLG attack:
    # the element-level selective-encryption justification, measured.
    topk = [r for r in _load_jsonl("attack_eval.jsonl")
            if r.get("protection", "").startswith("topk_")]
    if topk:
        rows = sorted((float(r["protection"].split("_")[1]), r)
                      for r in topk)
        ks = [k for k, _ in rows]
        fig, ax = plt.subplots(figsize=(5.2, 3.6))
        for metric, style in (("mssim", "o-"), ("uqi", "s-"),
                              ("vifp", "^-"), ("corr", "d--")):
            ax.plot(ks, [r[metric] for _, r in rows], style,
                    label=metric)
        ax.set_xscale("symlog", linthresh=1e-3)
        ax.set_xlabel("protected fraction k (top-|sensitivity| elements)")
        ax.set_ylabel("reconstruction quality vs ground truth")
        ax.set_title("DLG attack vs sensitivity-masked gradients "
                     "(best of 3 restarts)")
        ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "attack_topk.pdf"))
        plt.close(fig)

    # -- bandwidth sensitivity (processing_comm_bar.py:8-22 family) -------
    # Round time = measured crypto phases + ct_bytes/bandwidth (up + down),
    # at the reference's three implied link speeds (derived from its
    # published comm seconds / CNN ct bytes: 221.7 MB / 103.713 s etc.).
    bw = {"MAR": 2.14e6, "SAR": 81.1e6, "IB": 701e6}   # bytes/s
    cnn_sel = {r["rate"]: r for r in sel if r["model"] == "cnn_fedavg"}
    cnn_row = ours.get("cnn_fedavg")
    if cnn_row and 1.0 in cnn_sel:
        full = cnn_sel[1.0]
        per_client_ct = full["ct_bytes"]          # per-client upload
        comp_s = cnn_sel[1.0]["round_s"]
        variants = {
            "full enc": (per_client_ct, per_client_ct, comp_s),
            "seeded up": (full["ct_bytes_seeded"], per_client_ct, comp_s),
        }
        if 0.1 in cnn_sel:
            s10 = cnn_sel[0.1]
            b10 = s10["ct_bytes"] + s10["plain_bytes"]
            variants["10% selective"] = (b10, b10, s10["round_s"])
        variants["plaintext"] = (cnn_row["plain_bytes"]
                                 / cnn_row["clients"],
                                 cnn_row["plain_bytes"]
                                 / cnn_row["clients"], 0.001)
        labels, comm_s, rest_s = [], [], []
        for name, (up, down, comp) in variants.items():
            for link, speed in bw.items():
                labels.append(f"{link}\n{name}")
                comm_s.append((up + down) / speed)
                rest_s.append(comp)
        xpos = np.arange(len(labels))
        fig, ax = plt.subplots(figsize=(11, 4))
        ax.bar(xpos, rest_s, color="tab:green", label="crypto phases")
        ax.bar(xpos, comm_s, bottom=rest_s, color="tab:red",
               label="communication")
        ax.set_xticks(xpos, labels, fontsize=7)
        ax.set_ylabel("round time (s)")
        ax.set_yscale("log")
        ax.set_title("CNN 1.66M round vs link bandwidth "
                     "(measured phases + bytes/bandwidth)")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "bandwidth_bar.pdf"))
        plt.close(fig)

    made = sorted(os.listdir(args.out))
    print("wrote", ", ".join(made), "to", args.out)
    return made


if __name__ == "__main__":
    main()
