"""Observability: plot renderers produce RGB arrays, MetricsLogger writes
TensorBoard event files, infolog writes its run log."""

import glob

import numpy as np

import jax.numpy as jnp

from text2speech_tpu.utils import infolog
from text2speech_tpu.utils.logger import MetricsLogger
from text2speech_tpu.utils.plotting import (
    plot_alignment,
    plot_gate_outputs,
    plot_spectrogram,
)


def test_plot_renderers():
    align = np.random.RandomState(0).rand(40, 20)
    img = plot_alignment(align, info="step 1")
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    spec = np.random.RandomState(1).randn(80, 120)
    img2 = plot_spectrogram(spec)
    assert img2.ndim == 3 and img2.shape[2] == 3
    img3 = plot_gate_outputs(np.zeros(100), np.linspace(0, 1, 100))
    assert img3.ndim == 3 and img3.shape[2] == 3


def test_metrics_logger_writes_events(tmp_path):
    logger = MetricsLogger(str(tmp_path))
    logger.log_training(1.5, 0.7, 1e-3, 0.2, 10)
    B, M, T, TIN = 1, 8, 12, 6
    rng = np.random.RandomState(0)
    targets = (rng.randn(B, M, T).astype(np.float32), np.zeros((B, T), np.float32))
    preds = (
        jnp.asarray(rng.randn(B, M, T)), jnp.asarray(rng.randn(B, M, T)),
        jnp.asarray(rng.randn(B, T)), jnp.asarray(rng.rand(B, T, TIN)),
    )
    logger.log_validation(0.9, {"w": jnp.ones((4, 4))}, targets, preds, 10)
    logger.close()
    assert glob.glob(str(tmp_path / "events.out.tfevents.*"))


def test_infolog_roundtrip(tmp_path):
    path = str(tmp_path / "train.log")
    infolog.init(path, "testrun")
    infolog.log("hello world")
    infolog.close()
    content = open(path).read()
    assert "hello world" in content and "Starting new training run" in content
