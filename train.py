#!/usr/bin/env python
"""Tacotron-2 training CLI (parity with ``/root/reference/train.py:250-284``):

    python train.py --data_paths ./datasets/kss1,./datasets/kss2 \
        [--checkpoint_path ...] [--load_path <run_dir_to_resume>]

Multiple comma-separated data paths = multi-speaker (speaker id per corpus).
"""

import argparse
import os

from text2speech_tpu.config import HParams
from text2speech_tpu.utils import infolog
from text2speech_tpu.utils.run_dirs import (
    load_hparams,
    make_run_dir,
    save_hparams,
    str2bool,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_paths", default="./datasets/kss")
    parser.add_argument("--load_path", default=None,
                        help="previous run dir to resume (reloads its hparams)")
    parser.add_argument("--checkpoint_file", default=None)
    parser.add_argument("--wav_dir", default="./wav/",
                        help="accepted for reference CLI compatibility; "
                             "unused (parsed-but-dead in the reference too, "
                             "train.py:256)")
    parser.add_argument("--log_dir", default="logdir-tacotron")
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--logger_path", default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--num_test_per_speaker", type=int, default=2)
    parser.add_argument("--random_seed", type=int, default=123)
    parser.add_argument("--skip_path_filter", type=str2bool, default=False)
    parser.add_argument("--checkpoint_interval", type=int, default=1000)
    parser.add_argument("--num_steps", type=int, default=100000)
    parser.add_argument("--hparams", default=None,
                        help="params.json overriding the defaults")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 matmuls/convs (f32 params + f32 loss "
                             "accumulation) — halves the decoder's streamed "
                             "weight bytes per scan step")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="accumulate gradients over N sequential "
                             "microbatches per optimizer step (batch_size "
                             "must divide by N); activation memory is one "
                             "microbatch's")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize decoder scan steps in backward: "
                             "same loss, ~T_out x less activation HBM — use "
                             "to raise batch_size past the non-remat ceiling")
    parser.add_argument("--data_format", choices=["auto", "wav", "npz"],
                        default="auto",
                        help="'npz' trains from preprocess.py output "
                             "(auto-detected when data_paths contain .npz)")
    args = parser.parse_args()

    data_paths = args.data_paths.split(",")

    if args.load_path:
        run_dir = args.load_path
        hp = load_hparams(run_dir)
    else:
        run_dir = make_run_dir(args.log_dir, os.path.basename(data_paths[0].rstrip("/")))
        hp = HParams.load(args.hparams) if args.hparams else HParams()
    if args.batch_size:
        hp = hp.replace(batch_size=args.batch_size)
    hp = hp.replace(
        seed=args.random_seed, checkpoint_interval=args.checkpoint_interval
    )
    save_hparams(run_dir, hp)
    infolog.init(os.path.join(run_dir, "train.log"), os.path.basename(run_dir))

    from text2speech_tpu.parallel import initialize_distributed
    from text2speech_tpu.train.tacotron import TacotronTrainer

    if initialize_distributed():
        import jax

        infolog.log(
            f"distributed: process {jax.process_index()}/{jax.process_count()}"
        )

    trainer = TacotronTrainer(
        hp,
        data_paths,
        run_dir,
        checkpoint_dir=args.checkpoint_path,
        logger_dir=args.logger_path,
        num_test_per_speaker=args.num_test_per_speaker,
        skip_path_filter=args.skip_path_filter,
        data_format=args.data_format,
        remat=args.remat,
        grad_accum=args.grad_accum,
        bf16=args.bf16,
    )
    trainer.restore(args.checkpoint_file)
    trainer.fit(args.num_steps)


if __name__ == "__main__":
    main()
