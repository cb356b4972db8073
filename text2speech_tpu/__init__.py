"""text2speech_tpu — TPU-native Korean TTS framework (JAX/XLA/Pallas/pjit).

A ground-up rebuild of the capabilities of DonggeunYu/Text2Speech (Korean
Tacotron-2 + WaveGlow) designed for TPU:

* ``text``      — Korean normalizer / jamo tokenizer / symbol IDs (host Python)
* ``dsp``       — STFT / mel / mu-law audio DSP as jittable JAX, Pallas-fused hot path
* ``models``    — Tacotron-2 (lax.scan decoder) and WaveGlow (parallel flows) in flax
* ``ops``       — scan LSTM cells and Pallas TPU kernels
* ``data``      — datasets, collate/bucketing, preprocessing pipeline
* ``train``     — pjit/shard_map training loops, Orbax checkpoints, metrics
* ``parallel``  — device mesh + sharding helpers (DP over ICI, DCN-ready)
"""

__version__ = "0.1.0"

from .config import DEFAULT_HPARAMS, HParams, WaveGlowConfig  # noqa: F401
