"""Matplotlib (Agg) renders of alignment / spectrogram / gate for TensorBoard
(``/root/reference/utils/plotting_utils.py:1-61``)."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def _fig_to_rgb(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf.copy()


def plot_alignment(alignment: np.ndarray, info: str | None = None) -> np.ndarray:
    """alignment: [T_enc, T_dec] (encoder rows, decoder columns — pass
    ``align.T`` for the model's [T_dec, T_enc] output, as the logger and
    CLI do) -> RGB image array."""
    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(alignment, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    xlabel = "Decoder timestep" + (f"\n\n{info}" if info else "")
    ax.set_xlabel(xlabel)
    ax.set_ylabel("Encoder timestep")
    fig.tight_layout()
    return _fig_to_rgb(fig)


def plot_spectrogram(spectrogram: np.ndarray) -> np.ndarray:
    """spectrogram: [n_mel, T] -> RGB image array."""
    fig, ax = plt.subplots(figsize=(12, 3))
    im = ax.imshow(spectrogram, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Frames")
    ax.set_ylabel("Channels")
    fig.tight_layout()
    return _fig_to_rgb(fig)


def plot_gate_outputs(gate_targets: np.ndarray, gate_outputs: np.ndarray) -> np.ndarray:
    fig, ax = plt.subplots(figsize=(12, 3))
    ax.scatter(
        range(len(gate_targets)), gate_targets, alpha=0.5,
        color="green", marker="+", s=1, label="target",
    )
    ax.scatter(
        range(len(gate_outputs)), gate_outputs, alpha=0.5,
        color="red", marker=".", s=1, label="predicted",
    )
    ax.set_xlabel("Frames (Green target, Red predicted)")
    ax.set_ylabel("Gate State")
    fig.tight_layout()
    return _fig_to_rgb(fig)
