#!/usr/bin/env python
"""Batch mel->wav vocoder CLI (parity with ``/root/reference/waveglow/
inference.py``): reads ``.npy``/``.npz`` mel files listed in a filelist and
writes PCM16 wavs.

    python waveglow_inference.py -f mel_files.txt -w <ckpt_dir> -o out/ \
        [-s 0.666] [-d 0.1]
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from text2speech_tpu.config import WaveGlowConfig
from text2speech_tpu.dsp.audio import save_wav
from text2speech_tpu.models.denoiser import make_denoiser
from text2speech_tpu.models.waveglow import WaveGlow


def load_mel(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        mel = np.load(path)["mel"].T          # stored [T, n_mel]
    else:
        mel = np.load(path)
        if mel.shape[0] != 80 and mel.shape[1] == 80:
            mel = mel.T
    return mel.astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-f", "--filelist_path", required=True)
    parser.add_argument("-w", "--waveglow_checkpoint", required=True)
    parser.add_argument("-o", "--output_dir", required=True)
    parser.add_argument("-s", "--sigma", type=float, default=0.6)
    parser.add_argument("--sampling_rate", type=int, default=22050)
    parser.add_argument("-d", "--denoiser_strength", type=float, default=0.0)
    parser.add_argument("--config", default=None)
    parser.add_argument("--chunk_frames", type=int, default=0,
                        help="frame-axis chunked synthesis for long mels "
                             "(0 = single pass); see models/chunked.py")
    parser.add_argument("--overlap_frames", type=int, default=None,
                        help="default: the flow stack's receptive field")
    parser.add_argument("--fused", action="store_true",
                        help="use the fused-Pallas WaveGlow serving path")
    parser.add_argument("--int8", action="store_true",
                        help="int8-quantized fused serving path (1.54x the "
                             "bf16 fused path on v5e; weight scales folded "
                             "once at startup — see wn_block_int8.py)")
    parser.add_argument("--bf16", action="store_true",
                        help="run the unfused vocoder in bfloat16 — the TPU "
                             "analog of the reference's --is_fp16 "
                             "(waveglow/inference.py:78); the --fused path "
                             "is bf16 internally already")
    args = parser.parse_args()

    cfg = (
        WaveGlowConfig.from_json(args.config)
        if args.config
        else WaveGlowConfig(sampling_rate=args.sampling_rate)
    )
    model = WaveGlow(cfg)

    from text2speech_tpu.train.checkpoint import CheckpointManager
    from text2speech_tpu.train.state import TrainState
    import optax

    rng = jax.random.PRNGKey(0)
    frames = cfg.segment_length // cfg.hop_length + 1
    variables = jax.jit(model.init)(
        rng,
        jnp.zeros((1, cfg.n_mel_channels, frames)),
        jnp.zeros((1, cfg.segment_length)),
    )
    tx = optax.adam(cfg.learning_rate)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats={}, opt_state=tx.init(variables["params"]), tx=tx,
    )
    state, _ = CheckpointManager(args.waveglow_checkpoint).restore(state)
    variables = {"params": state.params}
    if args.bf16:
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x,
            variables,
        )

    denoise = None
    if args.denoiser_strength > 0:
        _, denoise = make_denoiser(model, variables)

    if args.chunk_frames > 0:
        from functools import partial

        from text2speech_tpu.models.chunked import infer_long

        if args.int8:
            from text2speech_tpu.models.waveglow_fused import (
                quantize_waveglow_int8,
            )

            qparams = jax.jit(
                lambda p: quantize_waveglow_int8(p, cfg)
            )(variables["params"])
            infer = jax.jit(
                lambda qp, mel, key: infer_long(
                    model, {"params": None}, mel, key, sigma=args.sigma,
                    chunk_frames=args.chunk_frames,
                    overlap_frames=args.overlap_frames,
                    int8_params=qp,
                )
            )
            variables = qparams
        else:
            infer = jax.jit(
                partial(
                    infer_long, model, sigma=args.sigma,
                    chunk_frames=args.chunk_frames,
                    overlap_frames=args.overlap_frames,
                    fused=args.fused,
                )
            )
    elif args.int8:
        from text2speech_tpu.models.waveglow_fused import (
            infer_fused_int8,
            quantize_waveglow_int8,
        )

        # quantize under jit: eager ops over the device tunnel are
        # ~seconds each (CLAUDE.md gotcha #5)
        qparams = jax.jit(
            lambda p: quantize_waveglow_int8(p, cfg)
        )(variables["params"])
        infer = jax.jit(
            lambda qp, mel, key: infer_fused_int8(
                qp, cfg, mel, key, args.sigma
            )
        )
        variables = qparams  # passed as the first infer arg below
    elif args.fused:
        from text2speech_tpu.models.waveglow_fused import infer_fused

        infer = jax.jit(
            lambda v, mel, key: infer_fused(
                v["params"], cfg, mel, key, args.sigma
            )
        )
    else:
        infer = jax.jit(
            lambda v, mel, key: model.apply(
                v, mel, key, args.sigma, method=WaveGlow.infer
            )
        )

    os.makedirs(args.output_dir, exist_ok=True)
    with open(args.filelist_path, encoding="utf-8") as f:
        paths = [l.strip() for l in f if l.strip()]
    mel_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    for i, p in enumerate(paths):
        mel = load_mel(p)[None]
        audio = infer(
            variables, jnp.asarray(mel, mel_dtype), jax.random.PRNGKey(i)
        )
        if denoise is not None:
            audio = denoise(audio, args.denoiser_strength)
        out = np.asarray(jnp.asarray(audio, jnp.float32))[0]
        name = os.path.splitext(os.path.basename(p))[0]
        out_path = os.path.join(args.output_dir, f"{name}_synthesis.wav")
        save_wav(out, out_path, args.sampling_rate)
        print(out_path)


if __name__ == "__main__":
    main()
