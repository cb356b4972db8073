#!/usr/bin/env python
"""End-to-end synthesis CLI (parity with ``/root/reference/inference.py``):

    python inference.py --taco_checkpoint <dir> --waveglow_checkpoint <dir> \
        --text "이 것은 제작되고 있는 중입니다." [--out tone_440.wav]
"""

import argparse

from text2speech_tpu.config import HParams, WaveGlowConfig
from text2speech_tpu.infer import load_synthesizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--taco_checkpoint", required=True)
    parser.add_argument("--waveglow_checkpoint", required=True)
    parser.add_argument("--text", default="이 것은 제작되고 있는 중입니다.")
    parser.add_argument("--out", default="tone_440.wav")
    parser.add_argument("--sigma", type=float, default=0.666)
    parser.add_argument("--denoiser_strength", type=float, default=0.0)
    parser.add_argument("--sample_rate", type=int, default=22050)
    parser.add_argument("--hparams", default=None)
    parser.add_argument("--waveglow_config", default=None)
    args = parser.parse_args()

    hp = HParams.load(args.hparams) if args.hparams else HParams(
        sample_rate=args.sample_rate
    )
    wg_cfg = (
        WaveGlowConfig.from_json(args.waveglow_config)
        if args.waveglow_config
        else WaveGlowConfig(sampling_rate=args.sample_rate)
    )
    synth = load_synthesizer(
        hp, args.taco_checkpoint, wg_cfg, args.waveglow_checkpoint,
        use_denoiser=args.denoiser_strength > 0,
    )
    synth.synthesize_to_files(
        [args.text], [args.out],
        sample_rate=args.sample_rate,
        sigma=args.sigma,
        denoiser_strength=args.denoiser_strength,
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
