"""Plotting helpers (reference ``sykepic/analyze/plot.py``).

Matplotlib is imported lazily with the Agg backend so headless training
nodes never need a display. ``view_batch`` takes an NHWC image array (our
native layout) instead of a torch DataLoader batch.
"""

from __future__ import annotations

import datetime
from pathlib import Path

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    from matplotlib import pyplot as plt

    return plt


def _style(plt, name):
    try:
        plt.style.use(name)
    except OSError:
        # matplotlib >= 3.6 renamed the seaborn styles
        if name.startswith("seaborn"):
            plt.style.use(name.replace("seaborn", "seaborn-v0_8"))


def class_plot(class_csv, columns_to_plot, ylabel="Biomass (μg/L)",
               out_file=None):
    """Per-class time series from a classification CSV
    (reference ``plot.py:14-37``, Helsinki timezone)."""
    import pandas as pd

    plt = _plt()
    from matplotlib import units as munits
    from matplotlib.dates import ConciseDateConverter

    munits.registry[datetime.datetime] = ConciseDateConverter()
    _style(plt, "seaborn-whitegrid")
    if not out_file:
        out_file = Path(class_csv).with_suffix(".png")
    df = pd.read_csv(class_csv)
    df["Time"] = pd.to_datetime(df.Time).dt.tz_convert("Europe/Helsinki")
    fig, axs = plt.subplots(
        len(columns_to_plot), 1, figsize=(15, 10), sharex=True,
        constrained_layout=True,
    )
    if len(columns_to_plot) < 2:
        axs = [axs]
    fig.text(-0.02, 0.5, ylabel, va="center", rotation="vertical", size=14)
    if isinstance(columns_to_plot[0], int):
        columns_to_plot = [df.columns[i] for i in columns_to_plot]
    for name, ax in zip(columns_to_plot, axs):
        ax.title.set_text(name.replace("_", " "))
        ax.title.set_size(14)
        ax.plot(df.Time, df[name])
    plt.savefig(out_file, format="png", bbox_inches="tight")
    plt.close()
    return Path(out_file)


def view_batch(images, h=None, w=None, save=None):
    """Save an ``h x w`` collage of a batch (reference ``plot.py:40-72``).

    ``images``: (B, H, W, C) or (B, H, W) float array in [0, 1].
    """
    import cv2

    images = np.asarray(images)
    if images.ndim == 3:
        images = images[..., None]
    bs = images.shape[0]
    if w:
        h = int(bs / w)
    elif h:
        w = int(bs / h)
    else:
        h = int(np.sqrt(bs))
        w = h
    rows = [
        np.concatenate(list(images[y : y + w]), axis=1)
        for y in range(0, h * w, w)
    ]
    matrix = np.concatenate(rows, axis=0)
    matrix = np.clip(matrix * 255.0, 0, 255).astype(np.uint8)
    if save:
        cv2.imwrite(str(save), matrix)
        return Path(save)
    return matrix


def plot_stats(
    train_accs,
    train_losses,
    val_accs,
    val_losses,
    title=None,
    outfile=None,
    first_epoch=1,
    epoch_step=1,
):
    """Per-epoch accuracy/loss curves (reference ``plot.py:75-124``)."""
    plt = _plt()
    _style(plt, "dark_background")
    fig, (ax1, ax2) = plt.subplots(2, 1, sharex=True, dpi=100, figsize=(12, 8.4))
    epochs = np.arange(first_epoch, first_epoch + len(train_accs), epoch_step)
    xticks = np.arange(0, len(train_accs), epoch_step)
    plt.xticks(xticks, epochs)
    plt.xlabel("Epoch")
    if title:
        plt.title(title)

    ax1.plot(train_accs, label="Training", c="turquoise", lw=2)
    ax1.plot(val_accs, label="Validation", c="tomato", lw=2)
    ax1.legend(loc="upper left")
    ax1.set_ylabel("Accuracy")

    ax2.plot(train_losses, label="Training", c="turquoise", lw=2)
    ax2.plot(val_losses, label="Validation", c="tomato", lw=2)
    ax2.legend(loc="upper left")
    ax2.set_ylabel("Loss")

    plt.tight_layout()
    if outfile:
        plt.savefig(outfile)
    plt.close()


def plot_img(img, title="", save=None):
    """Show/save a single image (reference ``plot.py:158-171``)."""
    plt = _plt()
    plt.axis("off")
    if title:
        plt.title(title)
    img = np.asarray(img)
    if img.ndim == 2 or img.shape[-1] == 1:
        plt.imshow(img.reshape(img.shape[0], img.shape[1]), cmap="gray")
    else:
        plt.imshow(img[..., ::-1])  # BGR -> RGB
    if save:
        plt.savefig(save, bbox_inches="tight")
    plt.close()


def dataset_distribution(data, save=None, size=(8.4, 12)):
    """Horizontal bar chart of class sizes (reference ``plot.py:127-155``).

    ``data`` is a :class:`sykepic_tpu.train.data.ModelData` (uses its
    ``distribution`` mapping).
    """
    plt = _plt()
    values = []
    labels = []
    classes = sorted(data.distribution.items())
    classes = sorted(classes, key=lambda x: x[1][0])
    for class_ in classes:
        values.append(class_[1][0])
        labels.append(class_[0])

    _style(plt, "dark_background")
    plt.figure(figsize=size)
    plt.barh(labels, values, color="turquoise")
    for i, v in enumerate(values):
        plt.text(v, i, " " + str(v), va="center", color="tomato")
    plt.grid(False)
    a = plt.gca().axes
    a.get_xaxis().set_visible(False)
    for side in ("top", "right", "bottom", "left"):
        a.spines[side].set_visible(False)
    if save:
        plt.tight_layout()
        plt.savefig(save, dpi=100)
    plt.close()
