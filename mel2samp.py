#!/usr/bin/env python
"""Dump log-mel spectrograms for a list of wav files (parity with the
standalone CLI in ``/root/reference/waveglow/mel2samp.py:114-142``, which
wrote torch ``.pt`` mels; we write ``.npy``).

    python mel2samp.py -f test_files.txt -o mels/ [-c waveglow_config.json]
"""

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-f", "--filelist_path", required=True)
    parser.add_argument("-o", "--output_dir", required=True)
    parser.add_argument("-c", "--config", default=None)
    args = parser.parse_args()

    from text2speech_tpu.config import WaveGlowConfig
    from text2speech_tpu.data.mel2samp import files_to_list
    from text2speech_tpu.dsp.audio import load_wav
    from text2speech_tpu.dsp.mel import MelFrontend

    cfg = WaveGlowConfig.from_json(args.config) if args.config else WaveGlowConfig()
    fe = MelFrontend(
        filter_length=cfg.filter_length, hop_length=cfg.hop_length,
        win_length=cfg.win_length, n_mel_channels=cfg.n_mel_channels,
        sampling_rate=cfg.sampling_rate, mel_fmin=cfg.mel_fmin,
        mel_fmax=cfg.mel_fmax,
    )
    mel_fn = jax.jit(fe.mel_spectrogram)
    os.makedirs(args.output_dir, exist_ok=True)
    for path in files_to_list(args.filelist_path):
        wav = load_wav(path, cfg.sampling_rate)
        mel = np.asarray(mel_fn(jnp.asarray(wav[None])))[0]
        name = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.output_dir, f"{name}.npy")
        np.save(out, mel)
        print(out)


if __name__ == "__main__":
    main()
