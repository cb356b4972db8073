"""TensorBoard metrics writer (``/root/reference/utils/logger.py:7-41``):
training scalars (loss / grad-norm / lr / step-duration) and validation
scalars + parameter histograms + alignment/mel/gate images."""

from __future__ import annotations

import numpy as np

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None

import jax

from .plotting import plot_alignment, plot_gate_outputs, plot_spectrogram


class MetricsLogger:
    def __init__(self, logdir: str):
        self.writer = SummaryWriter(logdir) if SummaryWriter is not None else None

    def log_training(self, loss, grad_norm, learning_rate, duration, iteration):
        if self.writer is None:
            return
        self.writer.add_scalar("training.loss", float(loss), iteration)
        self.writer.add_scalar("grad.norm", float(grad_norm), iteration)
        self.writer.add_scalar("learning.rate", float(learning_rate), iteration)
        self.writer.add_scalar("duration", float(duration), iteration)

    def log_validation(self, val_loss, params, targets, predictions, iteration):
        """targets = (mel_target, gate_target); predictions = (mel_out,
        mel_post, gate_out, alignments) — mirrors log_validation
        (``utils/logger.py:18-41``)."""
        if self.writer is None:
            return
        self.writer.add_scalar("validation.loss", float(val_loss), iteration)
        if params is not None:
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            for path, value in flat:
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                self.writer.add_histogram(name, np.asarray(value).ravel(), iteration)

        mel_target, gate_target = targets
        mel_out, mel_post, gate_out, align = predictions
        idx = 0
        self.writer.add_image(
            "alignment",
            plot_alignment(np.asarray(align[idx]).T),
            iteration, dataformats="HWC",
        )
        self.writer.add_image(
            "mel_target",
            plot_spectrogram(np.asarray(mel_target[idx])),
            iteration, dataformats="HWC",
        )
        self.writer.add_image(
            "mel_predicted",
            plot_spectrogram(np.asarray(mel_post[idx])),
            iteration, dataformats="HWC",
        )
        self.writer.add_image(
            "gate",
            plot_gate_outputs(
                np.asarray(gate_target[idx]),
                np.asarray(jax.nn.sigmoid(gate_out[idx])),
            ),
            iteration, dataformats="HWC",
        )

    def close(self):
        if self.writer is not None:
            self.writer.close()
