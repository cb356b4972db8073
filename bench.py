#!/usr/bin/env python
"""Benchmark: TTS throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Methodology: the device sits behind a high-latency tunnel, so per-dispatch
wall timing is dominated by RPC latency.  Each stage is therefore timed by
chaining n iterations *inside* one jit (``lax.fori_loop`` with a data
dependence so XLA cannot hoist the body), reading back a single scalar, and
differencing T(n) against T(1).  Sanity anchor: the same method measures a
4096^3 bf16 matmul chain at ~200 TFLOP/s on this chip (v5e peak ~197).

Primary metric: WaveGlow vocoder samples/sec/chip vs the only published
reference number (2.75e6 samples/sec on V100, waveglow/README.md:15-17).
Extras: end-to-end real-time factor (north star >50x, BASELINE.json).
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

V100_BASELINE_SAMPLES_PER_SEC = 2_750_000.0
SR = 22050
HOP = 256


def _timed_chain(fn, n_iters: int):
    """fn(n) runs n chained iterations on device and blocks on a scalar;
    returns sec/iter as (T(n) - T(1)) / (n - 1)."""
    t = {}
    for n in (1, n_iters):          # compile both variants
        fn(n)
    for n in (1, n_iters):
        t0 = time.perf_counter()
        fn(n)
        t[n] = time.perf_counter() - t0
    return max(t[n_iters] - t[1], 1e-9) / (n_iters - 1)


def bench_waveglow(batch: int = 8, frames: int = 400, n_iters: int = 6):
    from text2speech_tpu.config import WaveGlowConfig
    from text2speech_tpu.models.waveglow import WaveGlow

    cfg = WaveGlowConfig(sampling_rate=SR)
    model = WaveGlow(cfg)
    rng = jax.random.PRNGKey(0)
    mel = jnp.asarray(
        np.random.RandomState(0).randn(batch, cfg.n_mel_channels, frames),
        jnp.float32,
    )
    seg = cfg.segment_length
    variables = jax.jit(model.init)(
        rng,
        jnp.zeros((1, cfg.n_mel_channels, seg // cfg.hop_length + 1)),
        jnp.zeros((1, seg)),
    )
    jax.block_until_ready(variables)

    @partial(jax.jit, static_argnames="n")
    def chained(v, m, key, n):
        def body(i, carry):
            m_i, acc = carry
            audio = model.apply(
                v, m_i, jax.random.fold_in(key, i), 0.666,
                method=WaveGlow.infer,
            )
            s = jnp.mean(audio)
            # data dependence: next mel depends on this audio (tiny, exact)
            return (m + 1e-20 * s, acc + s)

        _, acc = jax.lax.fori_loop(0, n, body, (m, jnp.float32(0)))
        return acc

    sec_per_iter = _timed_chain(
        lambda n: float(chained(variables, mel, rng, n)), n_iters
    )
    t_up = (frames - 1) * cfg.upsample_stride + cfg.upsample_kernel
    cut = t_up - (cfg.upsample_kernel - cfg.upsample_stride)
    n_samples = batch * (cut // cfg.n_group * cfg.n_group)
    return n_samples / sec_per_iter


def bench_tacotron(batch: int = 8, t_in: int = 128, max_steps: int = 400,
                   n_iters: int = 4):
    from text2speech_tpu.config import HParams
    from text2speech_tpu.models.tacotron2 import Tacotron2
    from text2speech_tpu.text import N_SYMBOLS

    hp = HParams(sample_rate=SR, max_decoder_steps=max_steps)
    model = Tacotron2(hp, n_vocab=N_SYMBOLS)
    rng = jax.random.PRNGKey(0)
    text = jnp.zeros((batch, t_in), jnp.int32) + 3
    lengths = jnp.full((batch,), t_in, jnp.int32)
    mels = jnp.zeros((batch, hp.n_mel_channels, 64))
    out_lengths = jnp.full((batch,), 64, jnp.int32)
    variables = jax.jit(model.init)(
        {"params": rng, "dropout": rng}, text, lengths, mels, out_lengths
    )
    jax.block_until_ready(variables)

    @partial(jax.jit, static_argnames="n")
    def chained(v, t, l, key, n):
        def body(i, carry):
            t_i, acc = carry
            _, mel_post, _, _, _ = model.apply(
                v, t_i, text_lengths=l, method=Tacotron2.inference,
                rngs={"dropout": jax.random.fold_in(key, i)},
            )
            s = jnp.mean(mel_post)
            # dependence: next text derives (vacuously but opaquely) from s
            t_next = t + (s * 0).astype(jnp.int32)
            return (t_next, acc + s)

        _, acc = jax.lax.fori_loop(0, n, body, (t, jnp.float32(0)))
        return acc

    sec_per_iter = _timed_chain(
        lambda n: float(chained(variables, text, lengths, rng, n)), n_iters
    )
    return batch * max_steps / sec_per_iter  # mel frames / sec


def main():
    wg_sps = bench_waveglow()
    taco_fps = bench_tacotron()

    # End-to-end: for 1 second of audio, Tacotron makes SR/HOP frames and
    # WaveGlow makes SR samples; stages run sequentially.
    e2e_rtf = 1.0 / ((SR / HOP) / taco_fps + SR / wg_sps)
    result = {
        "metric": "vocoder_samples_per_sec_per_chip",
        "value": round(wg_sps, 1),
        "unit": "samples/sec",
        "vs_baseline": round(wg_sps / V100_BASELINE_SAMPLES_PER_SEC, 3),
        "vocoder_rtf": round(wg_sps / SR, 1),
        "tacotron_frames_per_sec": round(taco_fps, 1),
        "e2e_rtf": round(e2e_rtf, 2),
        "e2e_rtf_target": 50.0,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
