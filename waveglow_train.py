#!/usr/bin/env python
"""WaveGlow vocoder training CLI (parity with ``/root/reference/waveglow/
train.py:137-171`` + the ``distributed.py`` launcher, which is obsolete under
sharded jit):

    python waveglow_train.py -c waveglow_config.json [--num_steps N]
"""

import argparse

from text2speech_tpu.config import WaveGlowConfig
from text2speech_tpu.train.waveglow import WaveGlowTrainer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", default=None, help="reference-style config.json")
    parser.add_argument("--training_files", default=None)
    parser.add_argument("--output_directory", default="checkpoints-waveglow")
    parser.add_argument("--num_steps", type=int, default=1000000)
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize WN blocks in backward: same "
                             "gradients, ~12x less activation memory, "
                             "measured zero throughput cost — grows the "
                             "per-chip batch ~2-4x")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 matmuls/convs with f32 params and f32 "
                             "loss accumulation (the measured-fast TPU "
                             "training configuration)")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="accumulate gradients over N sequential "
                             "microbatches per optimizer step (batch_size "
                             "must divide by N); gradients identical to the "
                             "full-batch step")
    args = parser.parse_args()

    cfg = WaveGlowConfig.from_json(args.config) if args.config else WaveGlowConfig()
    training_files = args.training_files or "train_files.txt"

    from text2speech_tpu.parallel import initialize_distributed

    if initialize_distributed():
        import jax

        print(f"distributed: process {jax.process_index()}/{jax.process_count()}")

    trainer = WaveGlowTrainer(cfg, training_files, args.output_directory,
                              remat=args.remat, grad_accum=args.grad_accum,
                              bf16=args.bf16)
    trainer.restore()
    trainer.fit(args.num_steps)


if __name__ == "__main__":
    main()
