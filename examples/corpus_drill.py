#!/usr/bin/env python
"""One-command corpus-to-audio drill: the reference's full workflow on a
reference-format corpus directory, end to end.

    python examples/corpus_drill.py --in_dir /path/to/kss --work_dir work \
        --taco_steps 50000 --wg_steps 100000 --text "안녕하세요."

runs, in order (each stage is the real CLI — the equivalent standalone
command is printed, so this file doubles as the recipe):

1. ``preprocess.py``  — corpus dir -> npz features + train.txt
   (reference ``preprocess.py:10-13`` -> ``datasets/kss.py:45-160``)
2. ``train.py``       — Tacotron-2 on the preprocessed corpus
   (reference ``train.py:250-284``)
3. ``waveglow_train.py`` — WaveGlow on the corpus wavs
   (reference ``waveglow/train.py:62-135``)
4. ``inference.py``   — text -> wav with BOTH trained checkpoints, plus
   alignment/mel diagnostic plots (reference ``inference.py:80-95``)

Artifacts land under ``--work_dir``:

    preprocessed/        npz features + train.txt
    tacotron/<run>/      Tacotron run dir (checkpoints/, params.json, log)
    waveglow/            WaveGlow Orbax checkpoints (+ config.json used)
    synth/out.wav        synthesized audio
    synth/plots/         alignment + mel spectrogram pngs

``--in_dir`` must look like the reference's KSS layout: wav files in
subdirectories plus a ``transcript.txt`` with
``path|text|normalized|N.N초`` lines.  Defaults train the full-size
models (HParams() / the reference WaveGlow config); pass ``--hparams`` /
``--waveglow_config`` JSONs to scale down (the smoke test in
``tests/test_cli.py`` drives this script on a 4-utterance synthetic
corpus with tiny configs).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import runpy
import shlex
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:      # runnable from any cwd without PYTHONPATH
    sys.path.insert(0, REPO)


def run_stage(script: str, argv: list) -> None:
    argv = [str(a) for a in argv]
    print("\n=== " + " ".join(
        ["python", script] + [shlex.quote(a) for a in argv]), flush=True)
    old_argv = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(REPO, script), run_name="__main__")
    finally:
        sys.argv = old_argv


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--in_dir", required=True,
                    help="reference-format corpus dir (wavs + transcript.txt)")
    ap.add_argument("--work_dir", required=True)
    ap.add_argument("--taco_steps", type=int, default=50000)
    ap.add_argument("--wg_steps", type=int, default=100000)
    ap.add_argument("--text", default="안녕하세요. 음성 합성 결과입니다.")
    ap.add_argument("--hparams", default=None,
                    help="HParams JSON (default: full-size HParams())")
    ap.add_argument("--waveglow_config", default=None,
                    help="reference-style 4-block config.json (default: "
                         "the reference WaveGlow config)")
    ap.add_argument("--device_batch", type=int, default=16)
    ap.add_argument("--sigma", type=float, default=0.666)
    ap.add_argument("--denoiser_strength", type=float, default=0.0)
    args = ap.parse_args()

    wd = os.path.abspath(args.work_dir)
    pp_dir = os.path.join(wd, "preprocessed")
    taco_dir = os.path.join(wd, "tacotron")
    wg_dir = os.path.join(wd, "waveglow")
    synth_dir = os.path.join(wd, "synth")
    for d in (wd, synth_dir):
        os.makedirs(d, exist_ok=True)

    # --- 1. preprocess ------------------------------------------------------
    pp_args = ["--in_dir", args.in_dir, "--out_dir", pp_dir,
               "--device_batch", args.device_batch]
    if args.hparams:
        pp_args += ["--hparams", args.hparams]
    run_stage("preprocess.py", pp_args)

    # --- 2. Tacotron-2 training ---------------------------------------------
    tr_args = ["--data_paths", pp_dir, "--log_dir", taco_dir,
               "--num_steps", args.taco_steps]
    if args.hparams:
        tr_args += ["--hparams", args.hparams]
    run_stage("train.py", tr_args)
    runs = sorted(
        (d for d in glob.glob(os.path.join(taco_dir, "*"))
         if os.path.isdir(os.path.join(d, "checkpoints"))),
        key=os.path.getmtime)
    assert runs, f"no Tacotron run dir with checkpoints under {taco_dir}"
    taco_ckpt = os.path.join(runs[-1], "checkpoints")

    # --- 3. WaveGlow training -------------------------------------------------
    wavs = sorted(
        glob.glob(os.path.join(args.in_dir, "**", "*.wav"), recursive=True))
    assert wavs, f"no wavs under {args.in_dir}"
    filelist = os.path.join(wd, "waveglow_files.txt")
    with open(filelist, "w", encoding="utf-8") as f:
        f.write("\n".join(wavs))
    cfg_path = args.waveglow_config or os.path.join(wd, "waveglow_config.json")
    if args.waveglow_config is None:
        # the reference's config.json (waveglow/config.json:1-39), written
        # out so the run's exact architecture rides with its artifacts
        from text2speech_tpu.config import WaveGlowConfig

        c = WaveGlowConfig()
        with open(cfg_path, "w", encoding="utf-8") as f:
            json.dump({
                "train_config": {
                    "learning_rate": c.learning_rate, "sigma": c.sigma,
                    "iters_per_checkpoint": c.iters_per_checkpoint,
                    "batch_size": c.batch_size, "seed": c.seed,
                },
                "data_config": {
                    "segment_length": c.segment_length,
                    "sampling_rate": c.sampling_rate,
                    "filter_length": c.filter_length,
                    "hop_length": c.hop_length, "win_length": c.win_length,
                    "mel_fmin": c.mel_fmin, "mel_fmax": c.mel_fmax,
                },
                "waveglow_config": {
                    "n_mel_channels": c.n_mel_channels,
                    "n_flows": c.n_flows, "n_group": c.n_group,
                    "n_early_every": c.n_early_every,
                    "n_early_size": c.n_early_size,
                    "WN_config": {"n_layers": c.wn_n_layers,
                                  "n_channels": c.wn_n_channels,
                                  "kernel_size": c.wn_kernel_size},
                },
            }, f, indent=2)
    run_stage("waveglow_train.py",
              ["-c", cfg_path, "--training_files", filelist,
               "--output_directory", wg_dir, "--num_steps", args.wg_steps])

    # --- 4. synthesize with both trained checkpoints --------------------------
    out_wav = os.path.join(synth_dir, "out.wav")
    inf_args = ["--taco_checkpoint", taco_ckpt,
                "--waveglow_checkpoint", wg_dir,
                "--text", args.text, "--out", out_wav,
                "--sigma", args.sigma,
                "--denoiser_strength", args.denoiser_strength,
                "--plot_dir", os.path.join(synth_dir, "plots"),
                "--waveglow_config", cfg_path]
    if args.hparams:
        inf_args += ["--hparams", args.hparams]
    run_stage("inference.py", inf_args)

    print("\n=== drill complete ===")
    print(f"features:    {pp_dir}")
    print(f"tacotron:    {taco_ckpt}")
    print(f"waveglow:    {wg_dir}")
    print(f"audio:       {out_wav}")
    print(f"plots:       {os.path.join(synth_dir, 'plots')}")


if __name__ == "__main__":
    main()
