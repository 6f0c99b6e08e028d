"""Result visualization.

Rebuild of the reference's plotting (AL.py:626-753 ``visualize_run`` /
``summarize_all``; PW_analyze_results.py:136-233,339-388): accuracy/
F-measure vs #queries curves per method, mean +/- std bands across runs,
interpolated comparison curves, and query-overlay slices.  matplotlib is
optional — all functions accept an explicit save path and no-op gracefully
without a display.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_learning_curves(curves: Dict[str, np.ndarray], k_per_round: int,
                         save_path: str, ylabel: str = "F-measure",
                         stds: Optional[Dict[str, np.ndarray]] = None):
    """Metric-vs-#queries curves, one line per method (reference
    ``visualize_run``)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, ys in curves.items():
        ys = np.asarray(ys)
        xs = np.arange(1, len(ys) + 1) * k_per_round
        ax.plot(xs, ys, marker="o", label=name)
        if stds and name in stds:
            sd = np.asarray(stds[name])
            ax.fill_between(xs, ys - sd, ys + sd, alpha=0.2)
    ax.set_xlabel("# queried samples")
    ax.set_ylabel(ylabel)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)


def interpolate_curves(curves: Sequence[np.ndarray],
                       xs_list: Sequence[np.ndarray],
                       n_points: int = 50):
    """Align curves measured at different query counts onto a common grid
    (reference FI-curve interpolation, AL.py:650-678) via np.interp."""
    lo = max(float(np.min(x)) for x in xs_list)
    hi = min(float(np.max(x)) for x in xs_list)
    grid = np.linspace(lo, hi, n_points)
    interped = [np.interp(grid, xs, ys)
                for xs, ys in zip(xs_list, curves)]
    return grid, np.stack(interped)


def mean_std_over_runs(run_curves: Sequence[np.ndarray]):
    """Mean +/- std across runs, truncated to the shortest run (reference
    ``summarize_all``, AL.py:679-753)."""
    L = min(len(c) for c in run_curves)
    arr = np.stack([np.asarray(c)[:L] for c in run_curves])
    return arr.mean(axis=0), arr.std(axis=0)


def overlay_queries_on_slice(img2d: np.ndarray, query_xy: np.ndarray,
                             save_path: str, mask2d=None):
    """Show queried voxel positions on an axial slice (reference
    PW_analyze_results query-overlay figures)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(np.asarray(img2d), cmap="gray")
    if mask2d is not None:
        ax.contour(np.asarray(mask2d), levels=[0.5], colors="cyan",
                   linewidths=0.8)
    if len(query_xy):
        ax.scatter(query_xy[:, 1], query_xy[:, 0], s=12, c="red",
                   marker="x")
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
