"""Smoke tests for the two user-facing synthesis CLIs (``inference.py``,
``waveglow_inference.py``) — the reference's ``inference.py`` and
``waveglow/inference.py`` surfaces.  Random-init checkpoints are written
in-process, then each script runs in a forced-CPU subprocess and must produce
wavs (and, for ``inference.py --plot_dir``, alignment/mel diagnostics —
reference ``inference.py:88-90``).
"""

import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

from tests.test_cli import TINY_HP, run_cli

TINY_WG = dict(
    n_mel_channels=8,
    n_flows=2,
    n_group=4,
    n_early_every=4,
    n_early_size=2,
    wn_n_layers=2,
    wn_n_channels=16,
    wn_kernel_size=3,
    upsample_kernel=128,
    upsample_stride=64,
    hop_length=64,
    segment_length=2048,
    sampling_rate=22050,
)


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    """Random-init Tacotron + WaveGlow checkpoints in the exact layout
    ``load_synthesizer`` / the CLIs restore from."""
    import jax
    import jax.numpy as jnp
    import optax

    from text2speech_tpu.config import HParams, WaveGlowConfig
    from text2speech_tpu.models.tacotron2 import Tacotron2
    from text2speech_tpu.models.waveglow import WaveGlow
    from text2speech_tpu.text import N_SYMBOLS
    from text2speech_tpu.train.checkpoint import CheckpointManager
    from text2speech_tpu.train.state import TrainState, create_train_state

    root = tmp_path_factory.mktemp("synth_ckpts")
    hp = HParams(**TINY_HP)
    hp_path = root / "hp.json"
    hp.save(str(hp_path))

    rng = jax.random.PRNGKey(0)
    taco = Tacotron2(hp, n_vocab=N_SYMBOLS)
    tvars = jax.jit(taco.init)(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32),
        jnp.asarray([8]),
        jnp.zeros((1, hp.n_mel_channels, 8)),
        jnp.asarray([8]),
    )
    tstate = create_train_state(hp, tvars)
    tdir = root / "taco_ckpt"
    m = CheckpointManager(str(tdir))
    m.save(1, tstate, wait=True)

    wg_cfg = WaveGlowConfig(**TINY_WG)
    cfg_path = root / "wg.json"
    cfg_path.write_text(json.dumps({
        "train_config": {"learning_rate": wg_cfg.learning_rate},
        "data_config": {
            "segment_length": wg_cfg.segment_length,
            "sampling_rate": wg_cfg.sampling_rate,
            "hop_length": wg_cfg.hop_length,
        },
        "waveglow_config": {
            "n_mel_channels": wg_cfg.n_mel_channels,
            "n_flows": wg_cfg.n_flows,
            "n_group": wg_cfg.n_group,
            "n_early_every": wg_cfg.n_early_every,
            "n_early_size": wg_cfg.n_early_size,
            "upsample_kernel": wg_cfg.upsample_kernel,
            "upsample_stride": wg_cfg.upsample_stride,
            "WN_config": {
                "n_layers": wg_cfg.wn_n_layers,
                "n_channels": wg_cfg.wn_n_channels,
                "kernel_size": wg_cfg.wn_kernel_size,
            },
        },
    }))

    wg = WaveGlow(wg_cfg)
    frames = wg_cfg.segment_length // wg_cfg.hop_length + 1
    wvars = jax.jit(wg.init)(
        rng,
        jnp.zeros((1, wg_cfg.n_mel_channels, frames)),
        jnp.zeros((1, wg_cfg.segment_length)),
    )
    tx = optax.adam(wg_cfg.learning_rate)
    wstate = TrainState(
        step=jnp.zeros((), jnp.int32), params=wvars["params"],
        batch_stats={}, opt_state=tx.init(wvars["params"]), tx=tx,
    )
    wdir = root / "wg_ckpt"
    CheckpointManager(str(wdir)).save(1, wstate, wait=True)

    return dict(root=root, hp=str(hp_path), taco=str(tdir), wg=str(wdir),
                wg_cfg=str(cfg_path))


def test_inference_cli_with_plots(ckpts, tmp_path):
    out = tmp_path / "utt.wav"
    plots = tmp_path / "plots"
    r = run_cli(
        "inference.py",
        ["--taco_checkpoint", ckpts["taco"],
         "--waveglow_checkpoint", ckpts["wg"],
         "--hparams", ckpts["hp"],
         "--waveglow_config", ckpts["wg_cfg"],
         "--text", "안녕하세요.",
         "--out", str(out),
         "--plot_dir", str(plots)],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    sr, wav = wavfile.read(str(out))
    assert sr == 22050 and wav.dtype == np.int16 and wav.size > 0
    assert (plots / "utt_alignment.png").exists()
    assert (plots / "utt_mel.png").exists()


def test_inference_cli_stream(ckpts, tmp_path):
    """--stream synthesizes incrementally (chunked decode + windowed
    vocoding) and writes a complete wav."""
    out = tmp_path / "stream.wav"
    r = run_cli(
        "inference.py",
        ["--taco_checkpoint", ckpts["taco"],
         "--waveglow_checkpoint", ckpts["wg"],
         "--hparams", ckpts["hp"],
         "--waveglow_config", ckpts["wg_cfg"],
         "--text", "안녕하세요.",
         "--out", str(out),
         "--stream", "--stream_chunk_steps", "8",
         # streaming denoise (-d through the incremental path; tiny
         # sessions take the flush path with np multi-reflect edges)
         "--denoiser_strength", "0.01"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "chunk 0:" in r.stdout
    sr, wav = wavfile.read(str(out))
    assert sr == 22050 and wav.dtype == np.int16 and wav.size > 0


def test_inference_cli_serve(ckpts, tmp_path):
    """--serve_slots runs the continuous-batching server over a queue of
    texts (more requests than slots) and writes one wav per session."""
    texts = tmp_path / "texts.txt"
    texts.write_text("안녕하세요.\n반갑습니다.\n세 번째 요청.\n",
                     encoding="utf-8")
    out = tmp_path / "serve.wav"
    r = run_cli(
        "inference.py",
        ["--taco_checkpoint", ckpts["taco"],
         "--waveglow_checkpoint", ckpts["wg"],
         "--hparams", ckpts["hp"],
         "--waveglow_config", ckpts["wg_cfg"],
         "--texts_file", str(texts),
         "--out", str(out),
         "--serve_slots", "2", "--stream_chunk_steps", "8",
         "--serve_max_text_len", "64",
         # per-session denoiser through the scheduler (the CLI's -d knob
         # applied to every queued session; sub-window tiny sessions take
         # the flush path with np multi-reflect edges)
         "--denoiser_strength", "0.01"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "served 3 sessions through 2 slots" in r.stdout
    for sid in range(3):
        sr, wav = wavfile.read(str(tmp_path / f"serve_{sid}.wav"))
        assert sr == 22050 and wav.dtype == np.int16 and wav.size > 0
        assert f"session {sid} first audio" in r.stdout


def test_waveglow_inference_cli(ckpts, tmp_path):
    frames = 64
    mel = np.random.RandomState(0).randn(8, frames).astype(np.float32)
    mel_path = tmp_path / "m0.npy"
    np.save(str(mel_path), mel)
    filelist = tmp_path / "mels.txt"
    filelist.write_text(str(mel_path))
    out = tmp_path / "wavs"
    r = run_cli(
        "waveglow_inference.py",
        ["-f", str(filelist), "-w", ckpts["wg"], "-o", str(out),
         "--config", ckpts["wg_cfg"], "-s", "0.6"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    sr, wav = wavfile.read(str(out / "m0_synthesis.wav"))
    assert sr == 22050
    assert wav.size == frames * TINY_WG["upsample_stride"]

    # long-form chunked path writes the same-length audio
    out2 = tmp_path / "wavs_chunked"
    r2 = run_cli(
        "waveglow_inference.py",
        ["-f", str(filelist), "-w", ckpts["wg"], "-o", str(out2),
         "--config", ckpts["wg_cfg"], "-s", "0.6",
         "--chunk_frames", "16", "--overlap_frames", "8"],
        cwd=str(tmp_path),
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    _, wav2 = wavfile.read(str(out2 / "m0_synthesis.wav"))
    assert wav2.size == frames * TINY_WG["upsample_stride"]

    # unfused reduced-precision serving (--is_fp16 analog,
    # waveglow/inference.py:78): bf16 params + bf16 mel, finite audio out
    out_bf16 = tmp_path / "wavs_bf16"
    rb = run_cli(
        "waveglow_inference.py",
        ["-f", str(filelist), "-w", ckpts["wg"], "-o", str(out_bf16),
         "--config", ckpts["wg_cfg"], "-s", "0.6", "--bf16"],
        cwd=str(tmp_path),
    )
    assert rb.returncode == 0, rb.stderr[-3000:]
    _, wavb = wavfile.read(str(out_bf16 / "m0_synthesis.wav"))
    assert wavb.size == frames * TINY_WG["upsample_stride"]
    assert np.isfinite(wavb).all()

    # fused-Pallas serving path (interpret mode in the CPU subprocess)
    out3 = tmp_path / "wavs_fused"
    r3 = run_cli(
        "waveglow_inference.py",
        ["-f", str(filelist), "-w", ckpts["wg"], "-o", str(out3),
         "--config", ckpts["wg_cfg"], "-s", "0.6", "--fused"],
        cwd=str(tmp_path),
    )
    assert r3.returncode == 0, r3.stderr[-3000:]
    _, wav3 = wavfile.read(str(out3 / "m0_synthesis.wav"))
    assert wav3.size == frames * TINY_WG["upsample_stride"]

    # int8-quantized fused serving path (interpret mode on CPU)
    out4 = tmp_path / "wavs_int8"
    r4 = run_cli(
        "waveglow_inference.py",
        ["-f", str(filelist), "-w", ckpts["wg"], "-o", str(out4),
         "--config", ckpts["wg_cfg"], "-s", "0.6", "--int8"],
        cwd=str(tmp_path),
    )
    assert r4.returncode == 0, r4.stderr[-3000:]
    _, wav4 = wavfile.read(str(out4 / "m0_synthesis.wav"))
    assert wav4.size == frames * TINY_WG["upsample_stride"]
    assert np.isfinite(wav4).all()


def test_convert_checkpoint_cli_end_to_end(tmp_path):
    """Real torch checkpoint -> convert_checkpoint.py CLI -> Orbax ->
    waveglow_inference.py CLI produces audio: the full cross-framework
    migration path (capability superset of waveglow/convert_model.py),
    using the reference's own WaveGlow class as the checkpoint source."""
    import importlib.util

    torch = pytest.importorskip("torch")
    glow_py = "/root/reference/waveglow/glow.py"
    if not os.path.exists(glow_py):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_glow_cli", glow_py)
    glow = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(glow)

    torch.manual_seed(0)
    wg_kw = dict(n_mel_channels=8, n_flows=2, n_group=4, n_early_every=4,
                 n_early_size=2)
    wn_kw = dict(n_layers=2, n_channels=16, kernel_size=3)
    twg = glow.WaveGlow(WN_config=dict(wn_kw), **wg_kw)
    pt = tmp_path / "ref_waveglow.pt"
    torch.save(twg.state_dict(), str(pt))

    # reference glow.py hardcodes the 1024/256 upsampler
    cfg_path = tmp_path / "wg.json"
    cfg_path.write_text(json.dumps({
        "data_config": {"sampling_rate": 22050, "hop_length": 256,
                        "segment_length": 4096},
        "waveglow_config": {**wg_kw, "upsample_kernel": 1024,
                            "upsample_stride": 256,
                            "WN_config": wn_kw},
    }))

    conv_dir = tmp_path / "converted"
    r = run_cli(
        "convert_checkpoint.py",
        ["--kind", "waveglow", "--torch_ckpt", str(pt),
         "--out_dir", str(conv_dir), "--config", str(cfg_path)],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "converted" in r.stdout

    frames = 24
    mel = np.random.RandomState(1).randn(8, frames).astype(np.float32)
    np.save(str(tmp_path / "mel.npy"), mel)
    (tmp_path / "mels.txt").write_text(str(tmp_path / "mel.npy"))
    out = tmp_path / "wavs"
    r2 = run_cli(
        "waveglow_inference.py",
        ["-f", str(tmp_path / "mels.txt"), "-w", str(conv_dir),
         "-o", str(out), "--config", str(cfg_path), "-s", "0.6"],
        cwd=str(tmp_path),
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    _, wav = wavfile.read(str(out / "mel_synthesis.wav"))
    assert wav.size == frames * 256 and np.isfinite(wav).all()


def test_inference_cli_multispeaker(ckpts, tmp_path):
    """--num_speakers/--speaker_id restore and drive a multi-speaker
    checkpoint end-to-end (the reference's 2-speaker inference demo,
    inference.py:51-87); different ids produce different wavs."""
    import jax
    import jax.numpy as jnp

    from text2speech_tpu.config import HParams
    from text2speech_tpu.models.tacotron2 import Tacotron2
    from text2speech_tpu.text import N_SYMBOLS
    from text2speech_tpu.train.checkpoint import CheckpointManager
    from text2speech_tpu.train.state import create_train_state

    hp = HParams(**TINY_HP)
    rng = jax.random.PRNGKey(1)
    taco = Tacotron2(hp, n_vocab=N_SYMBOLS, num_speakers=2)
    tvars = jax.jit(taco.init)(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.zeros((1, hp.n_mel_channels, 8)), jnp.asarray([8]),
        speaker_ids=jnp.zeros((1,), jnp.int32),
    )
    tdir = tmp_path / "taco_ms"
    CheckpointManager(str(tdir)).save(1, create_train_state(hp, tvars),
                                      wait=True)

    # the shared wg ckpt is raw random-init: WaveGlow's zero-init end
    # convs make its output MEL-INDEPENDENT, so speaker differences would
    # be invisible — perturb them (same trick as the synthesizer fixture)
    import optax

    from text2speech_tpu.config import WaveGlowConfig
    from text2speech_tpu.models.waveglow import WaveGlow
    from text2speech_tpu.train.state import TrainState

    cfg = WaveGlowConfig(**TINY_WG)
    wg = WaveGlow(cfg)
    frames = cfg.segment_length // cfg.hop_length + 1
    wvars = jax.jit(wg.init)(
        rng, jnp.zeros((1, cfg.n_mel_channels, frames)),
        jnp.zeros((1, cfg.segment_length)))
    prng = np.random.RandomState(2)
    wparams = jax.tree.map(
        lambda x: x + 0.01 * prng.randn(*x.shape).astype(np.float32),
        wvars["params"])
    tx = optax.adam(cfg.learning_rate)
    wdir = tmp_path / "wg_ms"
    CheckpointManager(str(wdir)).save(1, TrainState(
        step=jnp.zeros((), jnp.int32), params=wparams, batch_stats={},
        opt_state=tx.init(wparams), tx=tx), wait=True)

    wavs = {}
    for spk in (0, 1):
        out = tmp_path / f"ms_{spk}.wav"
        r = run_cli(
            "inference.py",
            ["--taco_checkpoint", str(tdir),
             "--waveglow_checkpoint", str(wdir),
             "--hparams", ckpts["hp"],
             "--waveglow_config", ckpts["wg_cfg"],
             "--num_speakers", "2", "--speaker_id", str(spk),
             "--text", "안녕하세요.", "--out", str(out)],
            cwd=str(tmp_path),
        )
        assert r.returncode == 0, r.stderr[-3000:]
        _, wavs[spk] = wavfile.read(str(out))
    n = min(wavs[0].size, wavs[1].size)
    assert n > 0 and not np.array_equal(wavs[0][:n], wavs[1][:n])


@pytest.mark.slow
def test_inference_cli_http(ckpts, tmp_path):
    """--serve_slots N --http_port P end-to-end in a subprocess: the CLI
    warms the serving programs before binding (first real request must
    not pay the compiles), serves a request, and shuts down cleanly."""
    import http.client
    import socket
    import subprocess
    import sys
    import time

    from tests.conftest import REPO_ROOT

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys, runpy; sys.argv = ['inference.py'] + %r;"
        "runpy.run_path(%r, run_name='__main__')"
        % ([
            "--taco_checkpoint", ckpts["taco"],
            "--waveglow_checkpoint", ckpts["wg"],
            "--hparams", ckpts["hp"],
            "--waveglow_config", ckpts["wg_cfg"],
            "--serve_slots", "2", "--stream_chunk_steps", "8",
            "--serve_max_text_len", "64",
            "--http_port", str(port),
        ], os.path.join(str(REPO_ROOT), "inference.py"))
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code], cwd=str(tmp_path),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={**os.environ, "PYTHONPATH": str(REPO_ROOT)},
    )
    try:
        deadline = time.time() + 300
        up = False
        while time.time() < deadline and proc.poll() is None:
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=5)
                conn.request("GET", "/healthz")
                if conn.getresponse().status == 200:
                    up = True
                    conn.close()
                    break
                conn.close()
            except OSError:
                time.sleep(1.0)
        assert up, f"server never came up; rc={proc.poll()}"

        import json as _json

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/synthesize",
                     body=_json.dumps({"text": "안녕하세요.", "seed": 3}))
        resp = conn.getresponse()
        body = resp.read()
        conn.close()
        assert resp.status == 200 and len(body) > 44   # header + audio
    finally:
        proc.terminate()
        try:
            out, _ = proc.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
    # the warmup ran before the port was bound
    assert "serving programs warmed" in out, out[-2000:]
