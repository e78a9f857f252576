"""Evaluation curve plots: PR, F1, Precision, Recall PNGs.

Counterpart of reference utils/util.py:180-222 (plot_pr_curve,
plot_curve), emitted by average_precision when a plot dir is given
(reference util.py:289-292).
"""
from __future__ import annotations

import os

import numpy as np


def _setup():
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot
    return pyplot


def plot_pr_curve(px, pr_curves, ap, names, out_path):
    pyplot = _setup()
    fig, ax = pyplot.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    py = np.stack(pr_curves, axis=1) if pr_curves else np.zeros((len(px), 0))
    if 0 < len(names) < 21:
        for i, y in enumerate(py.T):
            ax.plot(px, y, linewidth=1, label=f"{names[i]} {ap[i, 0]:.3f}")
    else:
        ax.plot(px, py, linewidth=1, color="grey")
    if py.shape[1]:
        ax.plot(px, py.mean(1), linewidth=3, color="blue",
                label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left")
    fig.savefig(out_path, dpi=250)
    pyplot.close(fig)


def plot_curve(px, py, names, out_path, xlabel="Confidence", ylabel="Metric"):
    from tpu_yolo.eval.metrics import smooth

    pyplot = _setup()
    fig, ax = pyplot.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    if 0 < len(names) < 21:
        for i, y in enumerate(py):
            ax.plot(px, y, linewidth=1, label=f"{names[i]}")
    else:
        ax.plot(px, py.T, linewidth=1, color="grey")
    y = smooth(py.mean(0), 0.05)
    ax.plot(px, y, linewidth=3, color="blue",
            label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left")
    fig.savefig(out_path, dpi=250)
    pyplot.close(fig)


def plot_all_curves(px, pr_curves, ap, p_curve, r_curve, f1, names, plot_dir):
    os.makedirs(plot_dir, exist_ok=True)
    plot_pr_curve(px, pr_curves, ap, names, os.path.join(plot_dir, "PR_curve.png"))
    plot_curve(px, f1, names, os.path.join(plot_dir, "F1_curve.png"), ylabel="F1")
    plot_curve(px, p_curve, names, os.path.join(plot_dir, "P_curve.png"), ylabel="Precision")
    plot_curve(px, r_curve, names, os.path.join(plot_dir, "R_curve.png"), ylabel="Recall")
