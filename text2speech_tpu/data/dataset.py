"""Tacotron training data pipeline.

Capability match for ``TextMelLoader``/``TextMelCollate``
(``/root/reference/utils/data_utils.py:46-150``): multi-corpus transcript
lists (directory index = speaker id), on-the-fly wav->log-mel, text->IDs,
zero-padding, stop-token (gate) targets set to 1 from each utterance's last
frame on.

TPU-first differences from the torch DataLoader design:

* mel extraction is **batched on device** — one jitted ``MelFrontend`` call
  per batch instead of per-utterance CPU STFTs in worker processes;
* batches are padded to **bucketed shapes** (text to multiples of
  ``text_bucket``, mel frames to ``mel_bucket``) so jit compile counts stay
  bounded (SURVEY.md §7.3 shape-polymorphism hard part);
* batch order is deterministic from an epoch seed (preemption-safe resume:
  the iterator state is (epoch, step)).

Known divergence: the reference divides librosa's already-normalized [-1, 1]
float output by ``max_wav_value`` again (``utils/data_utils.py:82``), pushing
every sample below the mel log-clamp floor — an upstream scaling bug (NVIDIA's
original read int16-scale wavs).  We feed the frontend [-1, 1] audio, the
behavior the architecture was designed for.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HParams
from ..dsp.audio import load_wav
from ..dsp.mel import MelFrontend
from ..text import text_to_sequence


class Batch(NamedTuple):
    """Mirrors the reference collate output tuple
    (``utils/data_utils.py:149-150``)."""

    text: np.ndarray            # [B, T_in] int32
    input_lengths: np.ndarray   # [B] int32
    mel: np.ndarray             # [B, n_mel, T_out] float32
    gate: np.ndarray            # [B, T_out] float32
    speaker_id: np.ndarray      # [B] int32
    output_lengths: np.ndarray  # [B] int32


def load_manifest(data_dirs: Sequence[str], split: str = "train"):
    """Read ``transcript.txt`` (train) / ``val.txt`` (val) rows
    ``wav|text|...`` per corpus dir; corpus index becomes the speaker id
    (``utils/data_utils.py:23-36``)."""
    fname = "transcript.txt" if split == "train" else "val.txt"
    items: list[tuple[str, str, int]] = []
    for speaker, d in enumerate(data_dirs):
        with open(os.path.join(d, fname), encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("|")
                if len(parts) < 2:
                    continue
                items.append((os.path.join(d, parts[0]), parts[1], speaker))
    return items


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@dataclass
class TextMelDataset:
    """Batched text+mel producer."""

    data_dirs: Sequence[str]
    hp: HParams
    split: str = "train"
    batch_size: int | None = None
    text_bucket: int = 32
    mel_bucket: int = 64
    shuffle_seed: int = 1234
    io_workers: int = 8
    skip_path_filter: bool = False

    def __post_init__(self):
        self.items = load_manifest(self.data_dirs, self.split)
        if not self.skip_path_filter:
            # Drop manifest rows whose wav is missing on disk (the reference
            # feeder's path filtering; --skip_path_filter skips the stat calls
            # on corpora known to be complete).
            kept = [it for it in self.items if os.path.exists(it[0])]
            if len(kept) < len(self.items):
                from ..utils import infolog

                infolog.log(
                    f"path filter: dropped {len(self.items) - len(kept)} "
                    f"manifest rows with missing wavs"
                )
            self.items = kept
        self.batch_size = self.batch_size or self.hp.batch_size
        self.frontend = MelFrontend.from_hparams(self.hp)
        # center=False + host per-utterance reflect pre-pad: the last
        # ~n_fft/(2*hop) valid frames of each row must read the UTTERANCE'S
        # reflected samples, not batch zero-padding (the reference's
        # TacotronSTFT is per-utterance center=True; preprocess.py already
        # does this — r4 review finding)
        self._mel_fn = jax.jit(
            lambda y: self.frontend.mel_spectrogram(y, center=False))
        self._pool = ThreadPoolExecutor(self.io_workers)

    def hold_out_per_speaker(self, n: int) -> "TextMelDataset | None":
        """Remove the last ``n`` manifest rows of every speaker from this
        dataset and return them as a validation dataset (used when a corpus
        ships no ``val.txt`` — the reference's ``num_test_per_speaker``
        held-out split).  Returns None if the remainder could not fill one
        training batch."""
        import copy

        by_speaker: dict[int, list] = {}
        for it in self.items:
            by_speaker.setdefault(it[2], []).append(it)
        held, kept = [], []
        for speaker in sorted(by_speaker):
            rows = by_speaker[speaker]
            k = min(n, len(rows))
            held.extend(rows[len(rows) - k :])
            kept.extend(rows[: len(rows) - k])
        if not held or len(kept) < self.batch_size:
            return None
        val = copy.copy(self)
        val.items = held
        val.split = "val"
        self.items = kept
        return val

    def __len__(self) -> int:
        return len(self.items) // self.batch_size

    def _load_one(self, item):
        path, text, speaker = item
        wav = load_wav(path, self.hp.sample_rate)
        ids = text_to_sequence(text)
        return wav, ids, speaker

    def sample_batch(self) -> Batch:
        """A tiny batch for model init (shape discovery only)."""
        return self.make_batch(self.items[:2])

    def make_batch(self, items) -> Batch:
        """Assemble one padded batch; device-side batched mel extraction."""
        hp = self.hp
        loaded = list(self._pool.map(self._load_one, items))
        # sort by text length, longest first (reference collate semantics)
        loaded.sort(key=lambda x: -len(x[1]))

        wavs = [w for w, _, _ in loaded]                 # already in [-1, 1]
        txts = [t for _, t, _ in loaded]
        speakers = np.asarray([s for _, _, s in loaded], np.int32)

        in_lengths = np.asarray([len(t) for t in txts], np.int32)
        T_in = _round_up(int(in_lengths.max()), self.text_bucket)
        text = np.zeros((len(txts), T_in), np.int32)
        for i, t in enumerate(txts):
            text[i, : len(t)] = t

        n_samples = np.asarray([len(w) for w in wavs], np.int64)
        out_lengths = (1 + n_samples // hp.hop_length).astype(np.int32)
        step = hp.n_frames_per_step
        # bucket must stay divisible by n_frames_per_step (the reference
        # collate's max_target_len % step == 0 contract) — lcm, not max
        T_out = _round_up(int(out_lengths.max()),
                          int(np.lcm(self.mel_bucket, step)))
        pad = hp.filter_length // 2
        # width fits every row's reflect-padded signal and yields >= T_out
        # frames under center=False framing
        wav_pad = (T_out - 1) * hp.hop_length + hp.filter_length \
            + hp.hop_length
        wav_batch = np.zeros((len(wavs), wav_pad), np.float32)
        for i, w in enumerate(wavs):
            w = np.clip(w, -1.0, 1.0)
            wav_batch[i, : len(w) + 2 * pad] = np.pad(w, pad, mode="reflect")

        mel = np.asarray(self._mel_fn(jnp.asarray(wav_batch)))  # [B, n_mel, T]
        mel = mel[:, :, :T_out]
        # zero the padded frames (device mel of zero-padded audio is log(1e-5),
        # the reference pads the mel itself with zeros)
        frame_idx = np.arange(T_out)[None, :]
        valid = frame_idx < out_lengths[:, None]
        mel = np.where(valid[:, None, :], mel, 0.0).astype(np.float32)

        gate = np.zeros((len(wavs), T_out), np.float32)
        for i, L in enumerate(out_lengths):
            gate[i, L - 1 :] = 1.0

        return Batch(text, in_lengths, mel, gate, speakers, out_lengths)

    def epoch(self, epoch_idx: int, start_step: int = 0) -> Iterator[Batch]:
        """Deterministic shuffled epoch; resumable from ``start_step``."""
        order = np.random.RandomState(self.shuffle_seed + epoch_idx).permutation(
            len(self.items)
        )
        B = self.batch_size
        for step in range(start_step, len(self)):
            idx = order[step * B : (step + 1) * B]
            yield self.make_batch([self.items[i] for i in idx])
