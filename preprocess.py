#!/usr/bin/env python
"""Corpus preprocessing CLI (parity with ``/root/reference/preprocess.py``):

    python preprocess.py --name kss --num_workers 8 \
        [--in_dir datasets/kss] [--out_dir data/kss]

Writes reference-format ``.npz`` files + ``train.txt`` via the batched
TPU pipeline (text2speech_tpu.data.preprocess).
"""

import argparse
import os
import time

from text2speech_tpu.config import HParams
from text2speech_tpu.data.preprocess import (
    get_transcript_parser,
    preprocess_corpus,
    write_metadata,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", default="kss", help="dataset name")
    parser.add_argument("--num_workers", type=int, default=os.cpu_count() or 8)
    parser.add_argument("--in_dir", default=None)
    parser.add_argument("--out_dir", default=None)
    parser.add_argument("--device_batch", type=int, default=16)
    parser.add_argument("--hparams", default=None, help="path to params.json")
    parser.add_argument("--trim_impl", choices=("auto", "device", "host"),
                        default="auto",
                        help="silence trim placement: 'auto' (default) "
                             "probes the H2D link + host numpy rate once "
                             "and picks the measured-faster side (device "
                             "on real TPU hosts, host on tunnel-bound "
                             "rigs); 'device' = batched on-device kernel; "
                             "'host' = per-utterance numpy in the IO pool")
    parser.add_argument("--transfer_fp16", action="store_true",
                        help="cast spectrograms to f16 on device before the "
                             "device->host copy (halves drain bytes on "
                             "transfer-bound hosts; npz stays f32, ~1e-3 "
                             "relative error)")
    args = parser.parse_args()

    hp = HParams.load(args.hparams) if args.hparams else HParams()
    in_dir = args.in_dir or os.path.join("datasets", args.name)
    out_dir = args.out_dir or os.path.join("data", args.name)

    try:
        from tqdm import tqdm
    except ImportError:
        tqdm = lambda x: x

    t0 = time.time()
    metadata = preprocess_corpus(
        hp, in_dir, out_dir,
        num_workers=args.num_workers,
        device_batch=args.device_batch,
        progress=tqdm,
        parser=get_transcript_parser(args.name),
        trim_impl=args.trim_impl,
        transfer_fp16=args.transfer_fp16,
    )
    write_metadata(metadata, out_dir, hp)
    frames = sum(int(m[4]) for m in metadata)
    dt = time.time() - t0
    print(f"preprocessed in {dt:.1f}s ({frames / max(dt, 1e-9):.0f} mel frames/sec)")


if __name__ == "__main__":
    main()
