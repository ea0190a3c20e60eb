#!/usr/bin/env python
# scripts/14_plot_results.py
#
# Summary metrics + publication-style figures from the merged predictions:
#   Figure 14: Macro AUROC / AUPRC bars
#   Figure 15: Per-class AUROC bars
#   Figure 16: ROC for MI
#   Figure 17: AF ROC & PR curves (if available)
# Plus outputs/figures/metrics_summary.csv with per-class columns
# (reference: scripts/14_plot_results.py).

import os
import sys
from pathlib import Path

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from sklearn.metrics import (  # noqa: E402
    average_precision_score,
    precision_recall_curve,
    roc_auc_score,
    roc_curve,
)


def compute_multilabel_metrics(y_true, y_prob):
    """AUROC/AUPRC macro + per-class, skipping single-valued classes."""
    n_cls = y_true.shape[1]
    aurocs, auprcs = [], []
    for k in range(n_cls):
        yt, yp = y_true[:, k], y_prob[:, k]
        if np.unique(yt).size < 2:
            aurocs.append(np.nan)
            auprcs.append(np.nan)
            continue
        aurocs.append(roc_auc_score(yt, yp))
        auprcs.append(average_precision_score(yt, yp))
    return {
        "auroc_macro": float(np.nanmean(aurocs)),
        "auprc_macro": float(np.nanmean(auprcs)),
        "auroc_per_class": aurocs,
        "auprc_per_class": auprcs,
    }


def save_metrics_table(metrics, labels, out_path):
    rows = []
    for model_key, m in metrics.items():
        r = {"model": model_key, "auroc_macro": m["auroc_macro"], "auprc_macro": m["auprc_macro"]}
        for lb, v in zip(labels, m["auroc_per_class"]):
            r[f"auroc_{lb}"] = v
        for lb, v in zip(labels, m["auprc_per_class"]):
            r[f"auprc_{lb}"] = v
        rows.append(r)
    pd.DataFrame(rows).to_csv(out_path, index=False)
    print(f"[INFO] Saved metrics table: {out_path}")


def plot_macro_scores(metrics, model_defs, out_path):
    plt.style.use("default")
    model_keys = list(model_defs.keys())
    x = np.arange(len(model_keys))
    auroc_vals = [metrics[k]["auroc_macro"] for k in model_keys]
    auprc_vals = [metrics[k]["auprc_macro"] for k in model_keys]
    width = 0.35
    colors = ["#4C72B0", "#DD8452"]

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.bar(x - width / 2, auroc_vals, width, label="AUROC", color=colors[0])
    ax.bar(x + width / 2, auprc_vals, width, label="AUPRC", color=colors[1])
    ax.set_xticks(x)
    ax.set_xticklabels([model_defs[k]["name"] for k in model_keys])
    ax.set_ylim(0, 1)
    ax.set_ylabel("Score")
    ax.set_title("Macro AUROC / AUPRC on PTB-XL test set")
    ax.legend(loc="lower right")
    ax.grid(axis="y", alpha=0.3)
    for i, v in enumerate(auroc_vals):
        ax.text(x[i] - width / 2, v + 0.01, f"{v:.3f}", ha="center", va="bottom", fontsize=8)
    for i, v in enumerate(auprc_vals):
        ax.text(x[i] + width / 2, v + 0.01, f"{v:.3f}", ha="center", va="bottom", fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=300)
    plt.close(fig)


def plot_per_class_auc(metrics, model_defs, labels, out_path):
    plt.style.use("default")
    model_keys = list(model_defs.keys())
    x = np.arange(len(labels))
    width = 0.35
    colors = ["#4C72B0", "#DD8452"]

    fig, ax = plt.subplots(figsize=(8, 4))
    for i, key in enumerate(model_keys):
        ax.bar(x + (-0.5 + i) * width, metrics[key]["auroc_per_class"], width,
               label=model_defs[key]["name"], color=colors[i])
    ax.set_xticks(x)
    ax.set_xticklabels(labels)
    ax.set_ylim(0, 1)
    ax.set_ylabel("AUROC")
    ax.set_title("Per-class AUROC comparison")
    ax.legend(loc="lower right")
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=300)
    plt.close(fig)


def plot_single_roc(y_true, y_prob_dict, auroc_dict, model_defs, class_name, out_path):
    plt.style.use("default")
    fig, ax = plt.subplots(figsize=(5, 5))
    colors = {"ecg": "#4C72B0", "mm": "#DD8452"}
    for key, yp in y_prob_dict.items():
        fpr, tpr, _ = roc_curve(y_true, yp)
        ax.plot(fpr, tpr, label=f"{model_defs[key]['name']} (AUROC={auroc_dict[key]:.3f})",
                linewidth=2, color=colors[key])
    ax.plot([0, 1], [0, 1], "--", color="#888888", linewidth=1)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.set_xlabel("False Positive Rate")
    ax.set_ylabel("True Positive Rate")
    ax.set_title(f"ROC curves for {class_name}")
    ax.legend(loc="lower right")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=300)
    plt.close(fig)


def plot_af_curves(y_true, y_prob, out_path):
    plt.style.use("default")
    fpr, tpr, _ = roc_curve(y_true, y_prob)
    precision, recall, _ = precision_recall_curve(y_true, y_prob)
    auroc = roc_auc_score(y_true, y_prob)
    auprc = average_precision_score(y_true, y_prob)

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    color = "#55A868"

    ax = axes[0]
    ax.plot(fpr, tpr, color=color, linewidth=2, label=f"AUROC={auroc:.3f}")
    ax.plot([0, 1], [0, 1], "--", color="#888888", linewidth=1)
    ax.set_title("AF ROC curve")
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    ax.legend()
    ax.grid(alpha=0.3)

    ax = axes[1]
    ax.plot(recall, precision, color=color, linewidth=2, label=f"AUPRC={auprc:.3f}")
    ax.set_title("AF Precision-Recall curve")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.legend()
    ax.grid(alpha=0.3)

    fig.tight_layout()
    fig.savefig(out_path, dpi=300)
    plt.close(fig)


def main():
    merged_path = Path("outputs/merged/test_03_04_05_merged.csv")
    out_dir = Path("outputs/figures")
    out_dir.mkdir(parents=True, exist_ok=True)

    labels = ["MI", "STTC", "HYP", "CD", "NORM"]

    print(f"[INFO] Loading merged results: {merged_path}")
    df = pd.read_csv(merged_path)
    print(f"[INFO] Shape: {df.shape}")

    y_true = df[[f"y_true_{lb}" for lb in labels]].values.astype(float)

    model_defs = {
        "ecg": {"name": "ECG-only", "cols": [f"y_prob_{lb}" for lb in labels]},
        "mm": {"name": "ECG+demographics", "cols": [f"y_prob_{lb}_mm" for lb in labels]},
    }

    metrics, y_probs = {}, {}
    for key, md in model_defs.items():
        y_prob = df[md["cols"]].values.astype(float)
        y_probs[key] = y_prob
        metrics[key] = compute_multilabel_metrics(y_true, y_prob)

    save_metrics_table(metrics, labels, out_dir / "metrics_summary.csv")
    plot_macro_scores(metrics, model_defs, out_dir / "figure14_macro_scores.png")
    plot_per_class_auc(metrics, model_defs, labels, out_dir / "figure15_per_class_auroc.png")
    plot_single_roc(
        y_true[:, 0],
        {k: y_probs[k][:, 0] for k in y_probs},
        {k: metrics[k]["auroc_per_class"][0] for k in metrics},
        model_defs, class_name="MI",
        out_path=out_dir / "figure16_mi_roc.png",
    )

    if "y_true_AF" in df.columns and any(c.startswith("y_prob_AF") for c in df.columns):
        y_true_af = df["y_true_AF"].values.astype(float)
        y_prob_af = df[[c for c in df.columns if c.startswith("y_prob_AF")]].values[:, 0]
        plot_af_curves(y_true_af, y_prob_af, out_dir / "figure17_af_curves.png")
        print("[INFO] AF figure saved.")
    else:
        print("[WARN] AF predictions not found; skip AF plots.")

    print("[INFO] Finished. All figures saved to:", out_dir.resolve())


if __name__ == "__main__":
    main()
