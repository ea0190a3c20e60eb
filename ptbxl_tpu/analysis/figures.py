"""Figure rendering backend for the analysis CLIs (scripts 14-17).

Produces the reference's artifact set — macro-score bars, per-class AUROC
bars, single-class ROC comparison, AF ROC/PR panels, per-class ROC/PR sweeps,
KDE probability-density figures, and metrics_summary.csv — from a merged
prediction frame.  Figure geometry, palettes, and filenames match the
reference outputs (scripts/14-17); rendering code is organized around a small
set of generic helpers instead of one function per figure.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
from sklearn.metrics import (
    average_precision_score,
    precision_recall_curve,
    roc_auc_score,
    roc_curve,
)

BLUE, ORANGE, GREEN, GREY = "#4C72B0", "#DD8452", "#55A868", "#888888"
LABELS_DEFAULT = ["MI", "STTC", "HYP", "CD", "NORM"]


def _savefig(fig, path):
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=300)
    plt.close(fig)


def per_class_scores(y_true: np.ndarray, y_prob: np.ndarray) -> Dict:
    """Macro + per-class AUROC/AUPRC; single-valued classes yield NaN."""
    aurocs, auprcs = [], []
    for k in range(y_true.shape[1]):
        yt, yp = y_true[:, k], y_prob[:, k]
        if np.unique(yt).size < 2:
            aurocs.append(np.nan)
            auprcs.append(np.nan)
        else:
            aurocs.append(roc_auc_score(yt, yp))
            auprcs.append(average_precision_score(yt, yp))
    return {
        "auroc_macro": float(np.nanmean(aurocs)),
        "auprc_macro": float(np.nanmean(auprcs)),
        "auroc_per_class": aurocs,
        "auprc_per_class": auprcs,
    }


def write_metrics_summary(metrics: Dict[str, Dict], labels: Sequence[str], out_path) -> None:
    """metrics_summary.csv in the reference's column layout."""
    rows = []
    for model_key, m in metrics.items():
        row = {"model": model_key, "auroc_macro": m["auroc_macro"], "auprc_macro": m["auprc_macro"]}
        row.update({f"auroc_{lb}": v for lb, v in zip(labels, m["auroc_per_class"])})
        row.update({f"auprc_{lb}": v for lb, v in zip(labels, m["auprc_per_class"])})
        rows.append(row)
    pd.DataFrame(rows).to_csv(out_path, index=False)
    print(f"[INFO] Saved metrics table: {out_path}")


def grouped_bars(
    groups: Dict[str, List[float]],
    xticklabels: Sequence[str],
    ylabel: str,
    title: str,
    out_path,
    colors=(BLUE, ORANGE),
    figsize=(6, 4),
    annotate: bool = False,
    legend_loc: str = "lower right",
) -> None:
    """Two-series grouped bar chart (figures 14 and 15)."""
    keys = list(groups)
    x = np.arange(len(xticklabels))
    width = 0.35
    fig, ax = plt.subplots(figsize=figsize)
    for i, key in enumerate(keys):
        offset = (i - (len(keys) - 1) / 2) * width
        ax.bar(x + offset, groups[key], width, label=key, color=colors[i % len(colors)])
        if annotate:
            for xi, v in zip(x + offset, groups[key]):
                ax.text(xi, v + 0.01, f"{v:.3f}", ha="center", va="bottom", fontsize=8)
    ax.set_xticks(x)
    ax.set_xticklabels(xticklabels)
    ax.set_ylim(0, 1)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.legend(loc=legend_loc)
    ax.grid(axis="y", alpha=0.3)
    _savefig(fig, out_path)


def _curve(ax, kind, yt, yp, label, color=None):
    if kind == "roc":
        xs, ys, _ = roc_curve(yt, yp)
        score = roc_auc_score(yt, yp)
        text = f"{label} (AUROC={score:.3f})"
    else:
        ys, xs, _ = precision_recall_curve(yt, yp)
        score = average_precision_score(yt, yp)
        text = f"{label} (AUPRC={score:.3f})"
    ax.plot(xs, ys, linewidth=2, label=text, color=color)
    return score


def curve_panel(
    series,  # list of (label, y_true, y_prob, color-or-None)
    kind: str,  # 'roc' | 'pr'
    title: str,
    out_path,
    figsize=(6, 6),
    legend_loc: Optional[str] = None,
    legend_fontsize=8,
) -> None:
    """A single axes of ROC or PR curves with a diagonal for ROC."""
    fig, ax = plt.subplots(figsize=figsize)
    for label, yt, yp, color in series:
        if np.unique(yt).size < 2:
            print(f"[WARN] Skipped {kind.upper()} for {label} (y_true has single value).")
            continue
        _curve(ax, kind, yt, yp, label, color)
    if kind == "roc":
        ax.plot([0, 1], [0, 1], "--", color=GREY, linewidth=1)
        ax.set_xlabel("False Positive Rate")
        ax.set_ylabel("True Positive Rate")
        legend_loc = legend_loc or "lower right"
    else:
        ax.set_xlabel("Recall")
        ax.set_ylabel("Precision")
        legend_loc = legend_loc or "upper right"
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.set_title(title)
    ax.grid(alpha=0.3)
    ax.legend(loc=legend_loc, fontsize=legend_fontsize)
    _savefig(fig, out_path)


def af_roc_pr_panels(y_true, y_prob, out_path) -> None:
    """Figure 17: AF ROC + PR side by side."""
    fpr, tpr, _ = roc_curve(y_true, y_prob)
    precision, recall, _ = precision_recall_curve(y_true, y_prob)
    auroc = roc_auc_score(y_true, y_prob)
    auprc = average_precision_score(y_true, y_prob)

    fig, (ax_roc, ax_pr) = plt.subplots(1, 2, figsize=(10, 4))
    ax_roc.plot(fpr, tpr, color=GREEN, linewidth=2, label=f"AUROC={auroc:.3f}")
    ax_roc.plot([0, 1], [0, 1], "--", color=GREY, linewidth=1)
    ax_roc.set_title("AF ROC curve")
    ax_roc.set_xlabel("FPR")
    ax_roc.set_ylabel("TPR")
    ax_pr.plot(recall, precision, color=GREEN, linewidth=2, label=f"AUPRC={auprc:.3f}")
    ax_pr.set_title("AF Precision-Recall curve")
    ax_pr.set_xlabel("Recall")
    ax_pr.set_ylabel("Precision")
    for ax in (ax_roc, ax_pr):
        ax.legend()
        ax.grid(alpha=0.3)
    _savefig(fig, out_path)


def kde_panel(
    series,  # list of (values, label, color, style) — style in {'fill','line','dash'}
    title: str,
    out_path,
    figsize=(8, 5),
) -> None:
    """Seaborn KDE density figure (scripts 15-17 distribution plots)."""
    import seaborn as sns

    plt.figure(figsize=figsize)
    for values, label, color, style in series:
        kwargs = dict(label=label, color=color)
        if style == "fill":
            kwargs["fill"] = True
        elif style == "dash":
            kwargs["linestyle"] = "--"
        sns.kdeplot(np.asarray(values), **kwargs)
    plt.title(title)
    plt.xlabel("Predicted probability")
    plt.ylabel("Density")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(out_path, dpi=300)
    plt.close()


# ---------------------------------------------------------------------------
# Composite renderers, one per analysis CLI
# ---------------------------------------------------------------------------


def render_summary_figures(df: pd.DataFrame, out_dir, labels=LABELS_DEFAULT) -> None:
    """scripts/14: metrics_summary.csv + figures 14-17."""
    y_true = df[[f"y_true_{lb}" for lb in labels]].values.astype(float)
    prob_cols = {
        "ecg": [f"y_prob_{lb}" for lb in labels],
        "mm": [f"y_prob_{lb}_mm" for lb in labels],
    }
    display = {"ecg": "ECG-only", "mm": "ECG+demographics"}
    probs = {k: df[cols].values.astype(float) for k, cols in prob_cols.items()}
    metrics = {k: per_class_scores(y_true, p) for k, p in probs.items()}

    write_metrics_summary(metrics, labels, os.path.join(str(out_dir), "metrics_summary.csv"))

    grouped_bars(
        {"AUROC": [metrics[k]["auroc_macro"] for k in probs],
         "AUPRC": [metrics[k]["auprc_macro"] for k in probs]},
        [display[k] for k in probs],
        ylabel="Score",
        title="Macro AUROC / AUPRC on PTB-XL test set",
        out_path=os.path.join(str(out_dir), "figure14_macro_scores.png"),
        annotate=True,
    )
    grouped_bars(
        {display[k]: metrics[k]["auroc_per_class"] for k in probs},
        labels,
        ylabel="AUROC",
        title="Per-class AUROC comparison",
        out_path=os.path.join(str(out_dir), "figure15_per_class_auroc.png"),
        figsize=(8, 4),
    )
    curve_panel(
        [(display[k], y_true[:, 0], probs[k][:, 0], c)
         for k, c in zip(probs, (BLUE, ORANGE))],
        kind="roc",
        title="ROC curves for MI",
        out_path=os.path.join(str(out_dir), "figure16_mi_roc.png"),
        figsize=(5, 5),
        legend_fontsize=None,
    )
    if "y_true_AF" in df.columns and any(c.startswith("y_prob_AF") for c in df.columns):
        af_col = [c for c in df.columns if c.startswith("y_prob_AF")][0]
        af_roc_pr_panels(
            df["y_true_AF"].values.astype(float),
            df[af_col].values.astype(float),
            os.path.join(str(out_dir), "figure17_af_curves.png"),
        )
        print("[INFO] AF figure saved.")
    else:
        print("[WARN] AF predictions not found; skip AF plots.")


def render_distribution_figures(df: pd.DataFrame, out_dir, labels=LABELS_DEFAULT) -> None:
    """scripts/15: MI, pooled, and AF probability-density figures."""
    yt_mi = df["y_true_MI"].values
    kde_panel(
        [
            (df["y_prob_MI"].values[yt_mi == 1], "Baseline (MI=1)", BLUE, "fill"),
            (df["y_prob_MI"].values[yt_mi == 0], "Baseline (MI=0)", BLUE, "dash"),
            (df["y_prob_MI_mm"].values[yt_mi == 1], "Multimodal (MI=1)", ORANGE, "fill"),
            (df["y_prob_MI_mm"].values[yt_mi == 0], "Multimodal (MI=0)", ORANGE, "dash"),
        ],
        "MI prediction probability distribution",
        os.path.join(str(out_dir), "mi_distribution.png"),
    )

    pooled = {"pos_base": [], "neg_base": [], "pos_mm": [], "neg_mm": []}
    for lb in labels:
        yt = df[f"y_true_{lb}"].values
        pooled["pos_base"].extend(df[f"y_prob_{lb}"].values[yt == 1])
        pooled["neg_base"].extend(df[f"y_prob_{lb}"].values[yt == 0])
        pooled["pos_mm"].extend(df[f"y_prob_{lb}_mm"].values[yt == 1])
        pooled["neg_mm"].extend(df[f"y_prob_{lb}_mm"].values[yt == 0])
    kde_panel(
        [
            (pooled["pos_base"], "Baseline (Positive)", BLUE, "line"),
            (pooled["neg_base"], "Baseline (Negative)", BLUE, "dash"),
            (pooled["pos_mm"], "Multimodal (Positive)", ORANGE, "line"),
            (pooled["neg_mm"], "Multimodal (Negative)", ORANGE, "dash"),
        ],
        "Prediction probability distribution (all classes combined)",
        os.path.join(str(out_dir), "overall_prediction_distribution.png"),
    )

    if "y_true_AF" in df.columns:
        yt_af = df["y_true_AF"].values
        af_col = [c for c in df.columns if c.startswith("y_prob_AF")][0]
        p = df[af_col].values
        kde_panel(
            [
                (p[yt_af == 1], "AF = 1", GREEN, "fill"),
                (p[yt_af == 0], "AF = 0", GREEN, "dash"),
            ],
            "AF prediction probability distribution",
            os.path.join(str(out_dir), "af_prediction_distribution.png"),
        )


def render_single_model_figures(
    df: pd.DataFrame,
    out_dir,
    labels=LABELS_DEFAULT,
    suffix: str = "",
    color: str = BLUE,
    file_names: Optional[Dict[str, str]] = None,
    titles: Optional[Dict[str, str]] = None,
    mi_labels=("MI positive", "MI negative"),
) -> None:
    """scripts/16 (baseline, suffix='') and 17 (multimodal, suffix='_mm')."""
    names = file_names or {
        "roc": "baseline_per_class_roc.png",
        "pr": "baseline_per_class_pr.png",
        "mi": "baseline_mi_distribution.png",
    }
    titles = titles or {
        "roc": "Baseline model — ROC curves (per class)",
        "pr": "Baseline model — Precision-Recall curves (per class)",
        "mi": "Baseline model — MI probability distribution",
    }
    series = [
        (lb, df[f"y_true_{lb}"].values.astype(float),
         df[f"y_prob_{lb}{suffix}"].values.astype(float), None)
        for lb in labels
    ]
    curve_panel(series, "roc", titles["roc"], os.path.join(str(out_dir), names["roc"]))
    curve_panel(series, "pr", titles["pr"], os.path.join(str(out_dir), names["pr"]))

    yt = df["y_true_MI"].values.astype(float)
    yp = df[f"y_prob_MI{suffix}"].values.astype(float)
    kde_panel(
        [(yp[yt == 1], mi_labels[0], color, "fill"), (yp[yt == 0], mi_labels[1], color, "dash")],
        titles["mi"],
        os.path.join(str(out_dir), names["mi"]),
    )
