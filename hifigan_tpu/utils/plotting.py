"""Matplotlib figure helpers (parity with reference src/utils.py:16-63)."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pylab as plt  # noqa: E402
from matplotlib import colors  # noqa: E402

all_colors = [*colors.BASE_COLORS.values(), *colors.TABLEAU_COLORS.values(), *colors.CSS4_COLORS.values()]
all_colors = (all_colors * 10)[:300]


def plot_spectrogram(spectrogram):
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(spectrogram, aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    fig.canvas.draw()
    plt.close(fig)
    return fig


def plot_image(image):
    fig, ax = plt.subplots()
    im = ax.imshow(image, aspect="auto", interpolation="none")
    plt.colorbar(im, ax=ax)
    fig.canvas.draw()
    plt.close(fig)
    return fig


def plot_categorical(categorical):
    cmap = colors.ListedColormap(all_colors)
    bounds = [i - 0.5 for i in range(len(all_colors))]
    norm = colors.BoundaryNorm(bounds, cmap.N)
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(categorical, aspect="auto", origin="lower", interpolation="none", cmap=cmap, norm=norm)
    plt.colorbar(im, ax=ax)
    fig.canvas.draw()
    plt.close(fig)
    return fig


def plot_matrix(matrix):
    fig, ax = plt.subplots(figsize=(10, 7))
    im = ax.matshow(matrix, aspect="auto", interpolation="none")
    plt.colorbar(im, ax=ax)
    fig.canvas.draw()
    plt.close(fig)
    return fig
