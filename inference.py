#!/usr/bin/env python
"""End-to-end synthesis CLI (parity with ``/root/reference/inference.py``):

    python inference.py --taco_checkpoint <dir> --waveglow_checkpoint <dir> \
        --text "이 것은 제작되고 있는 중입니다." [--out tone_440.wav]
"""

import argparse

from text2speech_tpu.config import HParams, WaveGlowConfig
from text2speech_tpu.infer import load_synthesizer


def _save_plots(plot_dir, wav_path, mel, align, text):
    """Render alignment + mel diagnostics next to the synthesized wav
    (reference ``inference.py:88-90``).  mel: [n_mel, T]; align:
    [T_dec, T_enc]."""
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from text2speech_tpu.utils.plotting import plot_alignment, plot_spectrogram

    os.makedirs(plot_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(wav_path))[0]
    align_png = os.path.join(plot_dir, f"{stem}_alignment.png")
    mel_png = os.path.join(plot_dir, f"{stem}_mel.png")
    plt.imsave(align_png, plot_alignment(align.T, info=text))
    plt.imsave(mel_png, plot_spectrogram(mel))
    print(f"wrote {align_png} {mel_png}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--taco_checkpoint", required=True)
    parser.add_argument("--waveglow_checkpoint", default=None,
                        help="omit to synthesize with Griffin-Lim instead")
    parser.add_argument("--griffin_lim_iters", type=int, default=60)
    parser.add_argument("--text", default="이 것은 제작되고 있는 중입니다.")
    parser.add_argument("--out", default="tone_440.wav")
    parser.add_argument("--sigma", type=float, default=0.666)
    parser.add_argument("--speaker_id", type=int, default=None,
                        help="voice selection on a multi-speaker model "
                             "(reference inference.py:51-87; requires "
                             "--num_speakers > 1)")
    parser.add_argument("--num_speakers", type=int, default=1,
                        help="speaker count the checkpoint was trained "
                             "with (train.py with N --data_paths trains "
                             "num_speakers=N)")
    parser.add_argument("--denoiser_strength", type=float, default=0.0)
    parser.add_argument("--fused_vocoder", action="store_true",
                        help="use the fused-Pallas WaveGlow serving path")
    parser.add_argument("--int8_vocoder", action="store_true",
                        help="int8-quantized WN kernels (1.54x the bf16 "
                             "fused path on v5e; see docs/KERNELS.md)")
    parser.add_argument("--sample_rate", type=int, default=22050)
    parser.add_argument("--hparams", default=None)
    parser.add_argument("--waveglow_config", default=None)
    parser.add_argument("--plot_dir", default=None,
                        help="also render alignment + mel plots here "
                             "(reference inference.py:88-90 diagnostics)")
    parser.add_argument("--stream", action="store_true",
                        help="incremental synthesis: decode in chunks and "
                             "write audio as soon as each chunk clears the "
                             "vocoder's receptive field (first-audio "
                             "latency ~= one chunk, not the full decode)")
    parser.add_argument("--stream_chunk_steps", type=int, default=64)
    parser.add_argument("--serve_slots", type=int, default=0,
                        help="continuous-batching server mode: serve the "
                             "input texts through N decode slots (requests "
                             "join freed slots mid-flight), writing one wav "
                             "per session as it completes")
    parser.add_argument("--texts_file", default=None,
                        help="one text per line; with --serve_slots these "
                             "are the request queue (default: --text)")
    parser.add_argument("--http_reload_token", default=None,
                        help="with --http_port: require this X-Reload-Token "
                             "header on POST /reload (the admin endpoint "
                             "accepts filesystem paths; set a token when "
                             "binding beyond localhost)")
    parser.add_argument("--http_port", type=int, default=None,
                        help="with --serve_slots: expose the continuous-"
                             "batching server over HTTP (POST /synthesize "
                             "streams chunked WAV; GET /stats, /healthz) "
                             "instead of batch-processing --texts_file")
    parser.add_argument("--serve_max_text_len", type=int, default=256,
                        help="static encoder width sessions pad to")
    parser.add_argument("--no_serve_warmup", action="store_true",
                        help="with --http_port: skip the pre-bind warmup "
                             "session (the first real request then pays "
                             "the program compiles)")
    args = parser.parse_args()

    hp = HParams.load(args.hparams) if args.hparams else HParams(
        sample_rate=args.sample_rate
    )
    wg_cfg = (
        WaveGlowConfig.from_json(args.waveglow_config)
        if args.waveglow_config
        else WaveGlowConfig(sampling_rate=args.sample_rate)
    )
    if args.waveglow_checkpoint:
        synth = load_synthesizer(
            hp, args.taco_checkpoint, wg_cfg, args.waveglow_checkpoint,
            # serving mode keeps the denoiser available regardless of the
            # CLI default: HTTP requests carry per-request strengths
            use_denoiser=args.denoiser_strength > 0 or args.serve_slots > 0,
            num_speakers=args.num_speakers,
        )
        synth.use_fused_vocoder = args.fused_vocoder
        synth.int8_vocoder = args.int8_vocoder
        if args.fused_vocoder or args.int8_vocoder:
            synth.__post_init__()  # rebuild jitted fns with the fused path

        import numpy as np

        from text2speech_tpu.dsp.audio import save_wav

        if args.serve_slots:
            import os
            import time

            from text2speech_tpu.server import make_server

            if args.texts_file:
                with open(args.texts_file, encoding="utf-8") as f:
                    texts = [ln.strip() for ln in f if ln.strip()]
            else:
                texts = [args.text]
            srv = make_server(
                synth, slots=args.serve_slots,
                chunk_steps=args.stream_chunk_steps,
                max_text_len=args.serve_max_text_len, sigma=args.sigma,
            )
            if args.http_port is not None:
                from text2speech_tpu.http_serve import make_http_server

                if not args.no_serve_warmup:
                    # the first scheduling round compiles the decode/
                    # postnet/vocoder programs (minutes on a cold TPU
                    # cache) — run throwaway sessions through the
                    # scheduler BEFORE binding the port so the first real
                    # request streams immediately.  Warm EVERY program an
                    # HTTP client can reach, not just the CLI's own
                    # settings: the denoiser (serve mode keeps it
                    # available regardless of -d; strength is a traced
                    # scalar, so one pass covers all strengths) and, on
                    # multi-speaker models, BOTH the speaker-conditioned
                    # and unconditioned encode programs — otherwise the
                    # first request exercising them compiles inside
                    # step() on the scheduler thread, stalling every
                    # live session.
                    t0 = time.perf_counter()
                    wtext = texts[0] if texts else "."
                    wds = (args.denoiser_strength
                           if args.denoiser_strength > 0 else 0.1)
                    speakers = [args.speaker_id]
                    if args.num_speakers > 1:
                        speakers.append(
                            0 if args.speaker_id is None else None)
                    for i, sp in enumerate(speakers):
                        srv.submit(
                            wtext if sp is None else (wtext, sp),
                            # the denoise program needs one warm pass
                            denoiser_strength=wds if i == 0 else None)
                    while not srv.idle:
                        srv.step()
                    # the warmup sessions' rounds only compile the window
                    # widths their text lengths happen to hit (a short
                    # warmup text never leaves the Wv1 first-window width)
                    # — compile BOTH fixed widths explicitly
                    srv.warm_window_widths()
                    # the masked-length short-utterance pass is reachable
                    # by any client whose text gates under one vocoder
                    # window — warm it too (no-op on fused/int8 chains,
                    # whose static-length kernels have no masked pass:
                    # there, short sessions compile per-length exact
                    # programs on first occurrence and the scheduler logs
                    # a warning per length)
                    srv.warm_short_pass()
                    print("serving programs warmed in "
                          f"{time.perf_counter() - t0:.1f}s")

                httpd, runner = make_http_server(
                    srv, host="0.0.0.0", port=args.http_port,
                    sample_rate=args.sample_rate, log_requests=True,
                    # POST /reload {"taco_ckpt_dir": ..., "wg_ckpt_dir":
                    # ...}: zero-recompile live checkpoint swap
                    reload_fn=lambda taco_ckpt_dir=None, wg_ckpt_dir=None:
                        synth.load_checkpoints(taco_ckpt_dir, wg_ckpt_dir),
                    reload_token=args.http_reload_token)
                print(f"HTTP TTS server on :{httpd.server_address[1]} "
                      f"({args.serve_slots} slots; POST /synthesize)")
                try:
                    httpd.serve_forever()
                except KeyboardInterrupt:
                    pass
                finally:
                    runner.shutdown()
                return
            # the CLI's -d strength / --speaker_id apply to every session
            # (HTTP clients set them per request instead)
            ds = args.denoiser_strength if args.denoiser_strength > 0 else None
            sids = [srv.submit(
                t if args.speaker_id is None else (t, args.speaker_id),
                denoiser_strength=ds) for t in texts]
            base, ext = os.path.splitext(args.out)
            parts: dict = {sid: [] for sid in sids}
            t0 = time.perf_counter()
            first: dict = {}
            while not srv.idle:
                for ev in srv.step():
                    if ev.final:
                        path = f"{base}_{ev.sid}{ext or '.wav'}"
                        save_wav(np.concatenate(parts[ev.sid]), path,
                                 args.sample_rate)
                        print(f"session {ev.sid} complete at "
                              f"t={time.perf_counter() - t0:.2f}s -> {path}")
                    elif ev.audio is not None:
                        if ev.sid not in first:
                            first[ev.sid] = time.perf_counter() - t0
                            print(f"session {ev.sid} first audio at "
                                  f"t={first[ev.sid]:.2f}s")
                        parts[ev.sid].append(ev.audio)
            print(f"served {len(texts)} sessions through "
                  f"{args.serve_slots} slots in {srv.stats['rounds']} "
                  f"rounds")
            return

        if args.stream:
            import time

            t0 = time.perf_counter()
            chunks = []
            for i, chunk in enumerate(synth.synthesize_incremental(
                args.text, sigma=args.sigma,
                chunk_steps=args.stream_chunk_steps,
                denoiser_strength=args.denoiser_strength,
                speaker_id=args.speaker_id,
            )):
                chunks.append(chunk)
                print(f"chunk {i}: +{len(chunk)} samples "
                      f"at t={time.perf_counter() - t0:.2f}s")
            save_wav(np.concatenate(chunks), args.out, args.sample_rate)
            print(f"wrote {args.out}")
            return

        mel_post, out_lengths, align = synth.text_to_mel(
            [args.text], with_align=True, speaker_id=args.speaker_id
        )
        T = int(out_lengths[0])
        audio = np.asarray(
            synth.mel_to_audio(
                mel_post[:, :, :T], args.sigma,
                denoiser_strength=args.denoiser_strength,
            )
        )[0, : T * wg_cfg.upsample_stride]
        save_wav(audio, args.out, args.sample_rate)
        if args.plot_dir:
            _save_plots(
                args.plot_dir, args.out,
                np.asarray(mel_post)[0, :, :T],
                np.asarray(align)[0, :T],
                args.text,
            )
    else:
        # Vocoder-free path: Tacotron mel -> pinv(mel basis) + Griffin-Lim
        # (the reference's utils/audio.py:105-120 inversion chain).
        import jax
        import jax.numpy as jnp
        import numpy as np

        from text2speech_tpu.dsp.audio import save_wav
        from text2speech_tpu.dsp.mel import dynamic_range_decompression
        from text2speech_tpu.dsp.audio import (
            griffin_lim,
            _offline_mel_basis,
        )
        from text2speech_tpu.infer import load_synthesizer as _ls

        synth = _ls(hp, args.taco_checkpoint, wg_cfg, None,
                    use_denoiser=False, num_speakers=args.num_speakers)
        mel_post, out_lengths, align = synth.text_to_mel(
            [args.text], with_align=True, speaker_id=args.speaker_id
        )
        T = int(out_lengths[0])
        if args.plot_dir:
            _save_plots(
                args.plot_dir, args.out,
                np.asarray(mel_post)[0, :, :T],
                np.asarray(align)[0, :T],
                args.text,
            )
        # model mels are log-clamp (online convention): invert to magnitude
        mel_amp = dynamic_range_decompression(mel_post[:, :, :T])
        basis = _offline_mel_basis(hp.sample_rate, hp.filter_length,
                                   hp.n_mel_channels)
        inv_basis = jnp.asarray(np.linalg.pinv(basis))
        linear = jnp.maximum(
            1e-10, jnp.einsum("fm,bmt->bft", inv_basis, mel_amp)
        )
        wav = griffin_lim(linear ** hp.power, hp, jax.random.PRNGKey(0),
                          n_iters=args.griffin_lim_iters)
        save_wav(np.asarray(wav)[0], args.out, args.sample_rate)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
