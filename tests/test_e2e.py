"""End-to-end pipeline test (SURVEY.md §4 item 5): synthetic wav corpus ->
preprocess (batched device DSP, .npz contract) -> dataset batches -> 2 jitted
train steps (loss decreases or at least stays finite) -> autoregressive
inference -> WaveGlow synthesis -> finite audio of the expected length.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text2speech_tpu.config import HParams, WaveGlowConfig
from text2speech_tpu.data.dataset import Batch, TextMelDataset
from text2speech_tpu.data.preprocess import (
    parse_transcript,
    preprocess_corpus,
    write_metadata,
)

HP = HParams(
    sample_rate=22050,
    trim_silence=False,           # keep synthetic lengths predictable
    batch_size=2,
    # tiny model dims for test speed
    embedding_size=32,
    enc_conv_num_layers=1,
    enc_conv_channels=32,
    attention_rnn_dim=32,
    decoder_rnn_dim=32,
    attention_dim=16,
    attention_location_n_filters=4,
    attention_location_kernel_size=11,
    prenet_dim=16,
    postnet_embedding_dim=16,
    postnet_n_convolutions=2,
    max_decoder_steps=30,
    checkpoint_interval=10 ** 9,
)

TEXTS = ["안녕하세요.", "이 것은 제작되고 있는 중입니다.", "존경하는 사람.", "오늘 날씨가 좋다."]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("kss")
    wav_dir = root / "1"
    wav_dir.mkdir()
    from scipy.io import wavfile

    rng = np.random.RandomState(0)
    lines = []
    for i, text in enumerate(TEXTS):
        n = 22050 // 2 + i * 3000
        t = np.arange(n) / 22050.0
        sig = 0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t) + 0.01 * rng.randn(n)
        wavfile.write(
            str(wav_dir / f"1_{i:04d}.wav"), 22050,
            (sig * 32767).astype(np.int16),
        )
        lines.append(f"1/1_{i:04d}.wav|{text}|{text}|3.5초")
    (root / "transcript.txt").write_text("\n".join(lines), encoding="utf-8")
    # val.txt for the dataset split
    (root / "val.txt").write_text(
        "\n".join(l for l in lines[:2]), encoding="utf-8"
    )
    return str(root)


def test_preprocess_contract(corpus, tmp_path):
    out_dir = str(tmp_path / "out")
    rows = parse_transcript(corpus)
    assert len(rows) == len(TEXTS)  # equal-word-count rows emit once

    meta = preprocess_corpus(HP, corpus, out_dir, device_batch=2, length_bucket=4096)
    assert len(meta) == len(TEXTS)
    write_metadata(meta, out_dir, HP)
    assert os.path.exists(os.path.join(out_dir, "train.txt"))

    # npz key contract (kss.py:149-158): EXACT key-set equality — no extras
    npz = np.load(os.path.join(out_dir, meta[0][6]), allow_pickle=True)
    assert set(npz.files) == {
        "audio", "mel", "linear", "time_steps", "mel_frames", "text",
        "tokens", "loss_coeff",
    }, sorted(npz.files)
    frames = int(npz["mel_frames"])
    assert npz["mel"].shape == (frames, HP.n_mel_channels)
    assert npz["linear"].shape == (frames, HP.n_freq)
    assert int(npz["time_steps"]) == frames * HP.hop_length
    assert len(npz["audio"]) == frames * HP.hop_length
    assert npz["tokens"][-1] == 1  # EOS appended


def test_preprocess_matches_single_utterance(corpus, tmp_path):
    """Batched center=False device path must equal the unbatched centered
    reference chain on each utterance (the bit-parity requirement)."""
    from text2speech_tpu.dsp.audio import load_wav, mel_and_linear_spectrogram

    out_dir = str(tmp_path / "out2")
    meta = preprocess_corpus(HP, corpus, out_dir, device_batch=4, length_bucket=1024)
    by_id = {m[6]: m for m in meta}

    rows = parse_transcript(corpus)
    for wav_path, text in rows[:2]:
        wav = load_wav(wav_path, HP.sample_rate)
        peak = np.abs(wav).max()
        wav = wav / peak * HP.rescaling_max
        mel_ref, lin_ref = mel_and_linear_spectrogram(jnp.asarray(wav[None]), HP)
        wav_id = os.path.splitext(os.path.basename(wav_path))[0]
        npz = np.load(os.path.join(out_dir, f"{wav_id}.npz"), allow_pickle=True)
        got_mel = npz["mel"].T
        want_mel = np.asarray(mel_ref)[0, :, : got_mel.shape[1]]
        assert np.abs(got_mel - want_mel).max() < 2e-3
        assert np.abs(got_mel - want_mel).mean() < 1e-3  # BASELINE north star
        got_lin = npz["linear"].T
        want_lin = np.asarray(lin_ref)[0, :, : got_lin.shape[1]]
        # dB-domain max error is log-amplified at near-zero bins; bound the
        # mean tightly and the max loosely.
        assert np.abs(got_lin - want_lin).mean() < 1e-3
        assert np.abs(got_lin - want_lin).max() < 0.5


def test_dataset_batches(corpus):
    ds = TextMelDataset([corpus], HP, "train", batch_size=2,
                        text_bucket=16, mel_bucket=32)
    batch = next(iter(ds.epoch(0)))
    assert batch.text.shape[0] == 2
    assert batch.text.shape[1] % 16 == 0
    assert batch.mel.shape[1] == HP.n_mel_channels
    assert batch.mel.shape[2] % 32 == 0
    # gate target: 1 from the last frame on (data_utils.py:146)
    for i in range(2):
        L = batch.output_lengths[i]
        assert batch.gate[i, L - 1] == 1.0 and (batch.gate[i, L - 1 :] == 1).all()
        assert (batch.gate[i, : L - 1] == 0).all()
    # text sorted longest-first
    assert batch.input_lengths[0] >= batch.input_lengths[1]


def test_two_train_steps_and_inference(corpus, tmp_path):
    from text2speech_tpu.models.tacotron2 import Tacotron2
    from text2speech_tpu.train.state import create_train_state
    from text2speech_tpu.train.tacotron import make_train_step
    from text2speech_tpu.text import N_SYMBOLS

    ds = TextMelDataset([corpus], HP, "train", batch_size=2,
                        text_bucket=16, mel_bucket=32)
    model = Tacotron2(HP, n_vocab=N_SYMBOLS)
    rng = jax.random.PRNGKey(0)
    batch = next(iter(ds.epoch(0)))
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.asarray(batch.text), jnp.asarray(batch.input_lengths),
        jnp.asarray(batch.mel), jnp.asarray(batch.output_lengths),
    )
    state = create_train_state(HP, variables)
    step_fn = jax.jit(make_train_step(model, HP))

    losses = []
    for i, batch in zip(range(2), ds.epoch(0)):
        state, metrics = step_fn(
            state, Batch(*map(jnp.asarray, batch)), jax.random.fold_in(rng, i)
        )
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 2

    # autoregressive inference produces finite mel + plausible lengths
    from text2speech_tpu.text import encode_batch

    ids, lengths = encode_batch(["안녕하세요."], pad_to=32)
    mel_out, mel_post, gate, align, out_len = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(ids), text_lengths=jnp.asarray(lengths),
        method=Tacotron2.inference, rngs={"dropout": rng},
    )
    assert np.isfinite(np.asarray(mel_post)).all()
    assert mel_post.shape == (1, HP.n_mel_channels, HP.max_decoder_steps)


def test_waveglow_synthesis_from_mel():
    cfg = WaveGlowConfig(
        n_mel_channels=HP.n_mel_channels, n_flows=4, n_group=8,
        n_early_every=2, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        upsample_kernel=64, upsample_stride=16,
    )
    from text2speech_tpu.models.waveglow import WaveGlow

    model = WaveGlow(cfg)
    mel = jnp.zeros((1, cfg.n_mel_channels, 12))
    variables = model.init(
        jax.random.PRNGKey(0), mel, jnp.zeros((1, 12 * cfg.upsample_stride))
    )
    audio = model.apply(
        variables, mel, jax.random.PRNGKey(1), 0.666, method=WaveGlow.infer
    )
    assert np.isfinite(np.asarray(audio)).all()
    assert audio.shape[1] > 0


def test_preprocess_mulaw_quantize_branch(corpus, tmp_path):
    """input_type='mulaw-quantize' writes int16 codes and trims mid-scale
    silence (kss.py:77-87 branch)."""
    hp = HP.replace(input_type="mulaw-quantize", quantize_channels=256,
                    silence_threshold=2)
    out_dir = str(tmp_path / "mq")
    meta = preprocess_corpus(hp, corpus, out_dir, device_batch=2,
                             length_bucket=4096)
    assert meta
    npz = np.load(os.path.join(out_dir, meta[0][6]), allow_pickle=True)
    audio = npz["audio"]
    assert audio.dtype == np.int16
    assert audio.min() >= 0 and audio.max() <= 255


def test_preprocess_mulaw_branch(corpus, tmp_path):
    hp = HP.replace(input_type="mulaw")
    out_dir = str(tmp_path / "ml")
    meta = preprocess_corpus(hp, corpus, out_dir, device_batch=2,
                             length_bucket=4096)
    npz = np.load(os.path.join(out_dir, meta[0][6]), allow_pickle=True)
    audio = npz["audio"]
    assert audio.dtype == np.float32
    assert np.abs(audio).max() <= 1.0 + 1e-6


def test_dataset_path_filter_and_holdout(corpus, tmp_path):
    """The wired reference flags: missing-wav rows are dropped unless
    --skip_path_filter, and --num_test_per_speaker holds out a validation
    split when the corpus ships no val.txt."""
    import shutil

    root = tmp_path / "kss2"
    shutil.copytree(corpus, root)
    with open(root / "transcript.txt", "a", encoding="utf-8") as f:
        f.write("\n1/missing.wav|없는 파일|없는 파일|1.0초")

    ds = TextMelDataset([str(root)], HP, "train", batch_size=2)
    assert len(ds.items) == len(TEXTS)          # missing row filtered out

    ds_skip = TextMelDataset([str(root)], HP, "train", batch_size=2,
                             skip_path_filter=True)
    assert len(ds_skip.items) == len(TEXTS) + 1  # filter skipped

    val = ds.hold_out_per_speaker(2)
    assert val is not None
    assert len(val.items) == 2 and len(ds.items) == len(TEXTS) - 2
    assert not set(map(tuple, val.items)) & set(map(tuple, ds.items))
    # too-aggressive holdout that can't fill a train batch -> refused
    assert ds.hold_out_per_speaker(len(ds.items)) is None

    # n > a speaker's row count clamps to the whole speaker — with the old
    # negative-start slice (ADVICE r2), n_items+3 silently kept one stray
    # training row and "succeeded"; clamped, everything is held out and the
    # empty training split is refused.
    ds2 = TextMelDataset([str(root)], HP, "train", batch_size=1)
    assert ds2.hold_out_per_speaker(len(ds2.items) + 3) is None


def test_dataset_batched_mel_matches_per_utterance(corpus):
    """Every VALID frame of the batched device mel equals the per-utterance
    centered STFT — including the last ~n_fft/(2*hop) frames, which must
    read the utterance's own reflect padding, not batch zero-padding
    (r4 review finding; the reference's TacotronSTFT is per-utterance)."""
    ds = TextMelDataset([corpus], HP, "train", batch_size=4,
                        text_bucket=16, mel_bucket=32)
    batch = ds.make_batch(ds.items[:4])     # mixed lengths in one batch
    loaded = [ds._load_one(it) for it in ds.items[:4]]
    loaded.sort(key=lambda x: -len(x[1]))   # make_batch's collate order
    for i, (w, _t, _s) in enumerate(loaded):
        L = int(batch.output_lengths[i])
        ref = np.asarray(ds.frontend.mel_spectrogram(
            jnp.asarray(np.clip(w, -1, 1)[None])))[0]
        np.testing.assert_allclose(
            batch.mel[i, :, :L], ref[:, :L], atol=2e-4,
            err_msg=f"row {i} (len {len(w)})")


def test_preprocess_duplicate_text_rows_get_distinct_npz(corpus, tmp_path):
    """A transcript row whose two text columns differ in word count emits
    TWO items for one wav (kss.py:31-41); their npz files must not
    collide (colliding concurrent np.savez can corrupt the zip)."""
    import shutil

    root = tmp_path / "dup"
    shutil.copytree(corpus, root)
    lines = (root / "transcript.txt").read_text(encoding="utf-8").splitlines()
    # make row 0's two columns differ in word count
    sp = lines[0].split("|")
    lines[0] = "|".join([sp[0], sp[1], sp[1] + " 하나 더", sp[3]])
    (root / "transcript.txt").write_text("\n".join(lines), encoding="utf-8")

    out = tmp_path / "pp_dup"
    meta = preprocess_corpus(HP, str(root), str(out), device_batch=4)
    npz_names = [m[6] for m in meta]
    assert len(npz_names) == len(TEXTS) + 1       # one extra row
    assert len(set(npz_names)) == len(npz_names)  # all distinct
    for n in npz_names:
        with np.load(str(out / n), allow_pickle=True) as z:
            assert int(z["mel_frames"]) > 0       # every file intact


def test_vocoder_dataset_crops_deterministic_and_resumable(corpus):
    """Segment crops are a pure function of (seed, epoch, step, row):
    identical across runs despite the 8-thread IO pool, and an epoch
    resumed at step k reproduces the uninterrupted run's batches
    (r4 review finding: a SHARED RandomState made crops depend on thread
    scheduling and on how many draws preceded the resume point)."""
    import glob as _glob

    from text2speech_tpu.data.mel2samp import Mel2Samp

    wavs = sorted(_glob.glob(os.path.join(corpus, "1", "*.wav")))
    cfg = WaveGlowConfig(
        n_mel_channels=HP.n_mel_channels, n_flows=2, n_group=4,
        n_early_every=4, wn_n_layers=2, wn_n_channels=16,
        sampling_rate=22050, batch_size=2, segment_length=2048,
        filter_length=HP.filter_length, hop_length=HP.hop_length,
        win_length=HP.win_length,
    )
    mk = lambda: Mel2Samp(wavs, cfg, shuffle_seed=7, io_workers=8)
    a = [b.audio for b in mk().epoch(0)]
    b = [b.audio for b in mk().epoch(0)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    resumed = [b.audio for b in mk().epoch(0, start_step=1)]
    assert len(resumed) == len(a) - 1
    for x, y in zip(a[1:], resumed):
        np.testing.assert_array_equal(x, y)
