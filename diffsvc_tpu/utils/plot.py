"""Matplotlib figures for TensorBoard (reference utils/plot.py)."""

from __future__ import annotations

import numpy as np


def spec_to_figure(spec_pred, spec_gt=None, vmin=-6.0, vmax=1.5):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = 2 if spec_gt is not None else 1
    fig, axes = plt.subplots(n, 1, figsize=(12, 3 * n))
    axes = np.atleast_1d(axes)
    axes[0].pcolor(np.asarray(spec_pred).T, vmin=vmin, vmax=vmax)
    axes[0].set_title("pred")
    if spec_gt is not None:
        axes[1].pcolor(np.asarray(spec_gt).T, vmin=vmin, vmax=vmax)
        axes[1].set_title("gt")
    fig.tight_layout()
    return fig


def f0_to_figure(f0_gt, f0_pred=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    plt.plot(np.asarray(f0_gt), color="r", label="gt")
    if f0_pred is not None:
        plt.plot(np.asarray(f0_pred), color="b", label="pred")
    plt.legend()
    return fig
