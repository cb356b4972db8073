#!/usr/bin/env python
"""Worked example: the full framework API on a synthetic corpus.

The reference ships notebook scratch files (Untitled.py/.ipynb) as its demo;
this is the equivalent guided tour — runs on CPU or TPU in a few minutes:

    python examples/demo.py [--workdir /tmp/t2s_demo]

1. builds a tiny synthetic Korean corpus (sine "speech" + transcript.txt)
2. preprocesses it to reference-format .npz (batched device DSP)
3. trains a small Tacotron-2 for a few steps (sharded-jit data parallel)
4. trains a small WaveGlow for a few steps
5. synthesizes a sentence end-to-end and writes out.wav
6. serves the same chain tensor-parallel over a device mesh (if >=2 devices)
7. streams one utterance's audio incrementally (first-audio latency path)
8. serves two concurrent streaming sessions through one batched decode
9. runs the continuous-batching server (requests join freed slots mid-flight)
10. exposes it over HTTP (chunked-transfer WAV streaming)
11. mixes per-request denoiser strengths in one batch (streaming denoise)
"""

import argparse
import os
import sys

# `python examples/demo.py` puts examples/ (not the repo root) on sys.path;
# make the demo runnable from anywhere without an installed package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax



def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/t2s_demo")
    parser.add_argument("--steps", type=int, default=5)
    args = parser.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    from scipy.io import wavfile

    from text2speech_tpu.config import HParams, WaveGlowConfig
    from text2speech_tpu.data.preprocess import preprocess_corpus, write_metadata
    from text2speech_tpu.infer import Synthesizer
    from text2speech_tpu.train.tacotron import TacotronTrainer
    from text2speech_tpu.train.waveglow import WaveGlowTrainer

    hp = HParams(
        sample_rate=22050, trim_silence=False, batch_size=2,
        embedding_size=32, enc_conv_num_layers=1, enc_conv_channels=32,
        attention_rnn_dim=32, decoder_rnn_dim=32, attention_dim=16,
        attention_location_n_filters=4, attention_location_kernel_size=11,
        prenet_dim=16, postnet_embedding_dim=16, postnet_n_convolutions=2,
        max_decoder_steps=40, checkpoint_interval=args.steps,
    )
    wg_cfg = WaveGlowConfig(
        n_mel_channels=hp.n_mel_channels, n_flows=2, n_group=8,
        n_early_every=4, wn_n_layers=2, wn_n_channels=32,
        sampling_rate=hp.sample_rate, batch_size=2, segment_length=4096,
        iters_per_checkpoint=args.steps,
    )

    # 1. synthetic corpus ---------------------------------------------------
    corpus = os.path.join(args.workdir, "corpus")
    os.makedirs(os.path.join(corpus, "1"), exist_ok=True)
    texts = ["안녕하세요.", "반갑습니다.", "오늘 날씨가 좋네요.", "감사합니다."]
    rng = np.random.RandomState(0)
    lines = []
    for i, t in enumerate(texts):
        n = 11025 + 2000 * i
        tt = np.arange(n) / hp.sample_rate
        sig = 0.4 * np.sin(2 * np.pi * (180 + 40 * i) * tt) + 0.01 * rng.randn(n)
        wavfile.write(
            os.path.join(corpus, "1", f"u{i}.wav"), hp.sample_rate,
            (sig * 32767).astype(np.int16),
        )
        lines.append(f"1/u{i}.wav|{t}|{t}|dur")
    with open(os.path.join(corpus, "transcript.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    with open(os.path.join(corpus, "val.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines[:2]))

    # 2. preprocess ---------------------------------------------------------
    pp_out = os.path.join(args.workdir, "preprocessed")
    meta = preprocess_corpus(hp, corpus, pp_out, device_batch=4)
    write_metadata(meta, pp_out, hp)

    # 3. train Tacotron-2 a few steps ---------------------------------------
    run_dir = os.path.join(args.workdir, "taco_run")
    os.makedirs(run_dir, exist_ok=True)
    trainer = TacotronTrainer(hp, [corpus], run_dir)
    trainer.fit(args.steps)
    print(f"tacotron trained {args.steps} steps")

    # 4. train WaveGlow a few steps ------------------------------------------
    filelist = os.path.join(args.workdir, "train_files.txt")
    with open(filelist, "w") as f:
        for i in range(len(texts)):
            f.write(os.path.join(corpus, "1", f"u{i}.wav") + "\n")
    wg_dir = os.path.join(args.workdir, "wg_run")
    wg_trainer = WaveGlowTrainer(wg_cfg, filelist, wg_dir)
    wg_trainer.fit(args.steps)
    print(f"waveglow trained {args.steps} steps")

    # 5. synthesize ----------------------------------------------------------
    synth = Synthesizer(
        hp=hp,
        taco=trainer.model,
        taco_variables={
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        },
        wg_cfg=wg_cfg,
        waveglow=wg_trainer.model,
        wg_variables={"params": wg_trainer.state.params},
        use_denoiser=False,
    )
    out_path = os.path.join(args.workdir, "out.wav")
    synth.synthesize_to_files(["안녕하세요."], [out_path])
    print(f"wrote {out_path}")

    # 6. tensor-parallel serving (multi-device) ------------------------------
    # text -> mel -> waveform over a ('model',) mesh: column-sharded decoder
    # LSTMs + Megatron-sharded WN stacks; reproduces step 5's Synthesizer.
    # Try it on CPU with: XLA_FLAGS=--xla_force_host_platform_device_count=8
    devices = jax.devices()
    if len(devices) >= 2:
        from jax.sharding import Mesh

        from text2speech_tpu.parallel.serve import TPSynthesizer

        p = 8 if len(devices) >= 8 else 2
        mesh = Mesh(np.asarray(devices[:p]), ("model",))
        tp_synth = TPSynthesizer(
            hp=hp, taco=trainer.model,
            taco_variables={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            wg_cfg=wg_cfg, waveglow=wg_trainer.model,
            wg_variables={"params": wg_trainer.state.params},
            mesh=mesh, data_axis=None, chunk_steps=8,
        )
        wavs = tp_synth.synthesize(["안녕하세요."])
        tp_path = os.path.join(args.workdir, "out_tp.wav")
        wavfile.write(
            tp_path, hp.sample_rate,
            (np.clip(wavs[0], -1, 1) * 32767).astype(np.int16),
        )
        print(f"wrote {tp_path} (tensor-parallel over {p} devices)")
    else:
        print(
            "skipping tensor-parallel section (1 device; set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 to try it)"
        )

    # 7. streaming synthesis (first audio before the full decode) ------------
    # audio chunks arrive as soon as the decoded mel clears the vocoder's
    # receptive field; the concatenation equals step 5's single-pass output
    # for the same seed (same decode, same noise stream).
    chunks = list(synth.synthesize_incremental("안녕하세요.", chunk_steps=8))
    stream_wav = np.concatenate(chunks)
    print(
        f"streamed {len(chunks)} audio chunks "
        f"({stream_wav.shape[0]} samples; first chunk after ~"
        f"{8 + 8} of {hp.max_decoder_steps} decoder steps)"
    )

    # 8. concurrent streaming sessions ---------------------------------------
    # N utterances decode in ONE lockstep batched scan (decode is weight-
    # streaming-bound, so the batch is nearly free) while each session's
    # audio streams out as its own frames clear the vocoder window.
    sessions: dict = {0: 0, 1: 0}
    for row, chunk in synth.synthesize_incremental_batch(
        ["안녕하세요.", "반갑습니다."], chunk_steps=8
    ):
        sessions[row] += len(chunk)
    print(
        "served 2 concurrent streaming sessions: "
        + ", ".join(f"row {r}: {n} samples" for r, n in sessions.items())
    )

    # 9. continuous batching --------------------------------------------------
    # a production queue: more requests than slots; sessions are admitted
    # into freed slots mid-flight while the fixed-shape decode batch keeps
    # running (decode rows are weight-streaming-bound ~free), and each
    # session's audio is a function of (text, seed) only.
    from text2speech_tpu.server import make_server

    srv = make_server(synth, slots=2, chunk_steps=8, max_text_len=96)
    for text in ["안녕하세요.", "반갑습니다.", "세 번째 요청."]:
        srv.submit(text)
    served: dict = {}
    while not srv.idle:
        for ev in srv.step():
            if ev.audio is not None:
                served[ev.sid] = served.get(ev.sid, 0) + len(ev.audio)
    print(
        f"continuous batching: 3 requests through 2 slots in "
        f"{srv.stats['rounds']} rounds — "
        + ", ".join(f"sid {s}: {n} samples" for s, n in sorted(served.items()))
    )

    # 10. HTTP serving ---------------------------------------------------------
    # the continuous batcher behind a stdlib HTTP server: POST /synthesize
    # streams chunked-transfer WAV as the session decodes; a per-request
    # "sigma" sets the flow temperature; /stats exposes the scheduler.
    import http.client
    import json as _json
    import threading

    from text2speech_tpu.http_serve import make_http_server

    httpd, runner = make_http_server(
        make_server(synth, slots=2, chunk_steps=8, max_text_len=96), port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.request("POST", "/synthesize",
                 body=_json.dumps({"text": "안녕하세요.", "seed": 7,
                                   "sigma": 0.6}))
    resp = conn.getresponse()
    wav_bytes = resp.read()
    conn.request("GET", "/stats")
    stats = _json.loads(conn.getresponse().read())
    conn.close()
    httpd.shutdown()
    runner.shutdown()
    print(
        f"HTTP serving: POST /synthesize on :{port} streamed "
        f"{len(wav_bytes)} WAV bytes (status {resp.status}); "
        f"/stats: {stats['completed']} completed, "
        f"{stats['emitted_samples']} samples emitted"
    )

    # 11. per-request quality knobs -------------------------------------------
    # the reference applies its bias-subtraction denoiser offline
    # (waveglow/denoiser.py); here it STREAMS — sessions with different
    # strengths share one batched windowed-STFT device call per round,
    # equal to the offline denoiser over each session's raw audio
    den_synth = Synthesizer(
        hp=hp, taco=trainer.model,
        taco_variables={"params": trainer.state.params,
                        "batch_stats": trainer.state.batch_stats},
        wg_cfg=wg_cfg, waveglow=wg_trainer.model,
        wg_variables={"params": wg_trainer.state.params},
        use_denoiser=True,
        denoiser_kwargs=dict(filter_length=64, n_overlap=4, win_length=64,
                             n_frames=16),
    )
    srv = make_server(den_synth, slots=2, chunk_steps=8, max_text_len=96)
    wavs = srv.run(["안녕하세요.", "안녕하세요."], seeds=[5, 5],
                   denoiser_strengths=[0.0, 0.3])
    delta = float(
        np.abs(wavs[0][: wavs[1].size] - wavs[1]).max()) if wavs[1].size else 0
    print(
        f"per-request denoiser: raw vs strength-0.3 sessions in ONE batch "
        f"(max sample delta {delta:.2e} — tiny on this 5-step toy vocoder, "
        f"whose bias spectrum is near zero; "
        f"{srv.stats['denoiser_calls']} windowed-denoise calls)"
    )


if __name__ == "__main__":
    main()
