"""End-to-end synthesis: text -> mel (Tacotron-2 autoregressive) -> waveform
(WaveGlow reverse flow) -> PCM16 wav.

Rebuild of ``/root/reference/inference.py``: same pipeline, but both stages
are jitted and batched — the decoder is a fixed-trip scan and WaveGlow infer
has no sequential time dependency, so a whole batch of sentences synthesizes
in two device calls.  bf16 is used where safe (the reference's fp16-with-fp32
convinv dance, ``inference.py:59-75``, becomes the model's built-in fp32
islands).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .config import HParams, WaveGlowConfig
from .data.dataset import Batch  # noqa: F401  (re-export convenience)
from .dsp.audio import save_wav
from .models.denoiser import make_denoiser
from .models.tacotron2 import Tacotron2
from .models.waveglow import WaveGlow
from .text import N_SYMBOLS, encode_batch


@dataclass
class Synthesizer:
    hp: HParams
    taco: Tacotron2
    taco_variables: dict
    wg_cfg: WaveGlowConfig
    waveglow: WaveGlow
    wg_variables: dict
    use_denoiser: bool = True
    use_fused_vocoder: bool = False   # fused-Pallas serving path (TPU)

    def __post_init__(self):
        # Params are jit ARGUMENTS, never closure captures — captured arrays
        # are baked into the HLO as constants, ballooning compile time (XLA
        # constant-folds e.g. the weight-norm reductions over full tensors)
        # and forcing a recompile per checkpoint.
        taco, wg = self.taco, self.waveglow

        def mel_fn(variables, text_ids, text_lengths, rng, max_steps):
            return taco.apply(
                variables,
                text_ids,
                text_lengths=text_lengths,
                max_steps=max_steps,
                method=Tacotron2.inference,
                rngs={"dropout": rng},
            )

        if self.use_fused_vocoder:
            from .models.waveglow_fused import infer_fused

            wg_cfg = self.wg_cfg

            def audio_fn(variables, mel, rng, sigma):
                return infer_fused(variables["params"], wg_cfg, mel, rng, sigma)
        else:

            def audio_fn(variables, mel, rng, sigma):
                return wg.apply(
                    variables, mel, rng, sigma, method=WaveGlow.infer
                )

        from .models.chunked import infer_long

        use_fused = self.use_fused_vocoder

        def audio_long_fn(variables, mel, noise, sigma, chunk, ov):
            return infer_long(
                wg, variables, mel, None, sigma, chunk, ov, noise=noise,
                fused=use_fused,
            )

        self._infer_mel = jax.jit(mel_fn, static_argnames=("max_steps",))
        self._infer_audio = jax.jit(audio_fn)
        self._infer_audio_long = jax.jit(
            audio_long_fn, static_argnames=("chunk", "ov")
        )
        if self.use_denoiser:
            _, self._denoise = make_denoiser(self.waveglow, self.wg_variables)
        else:
            self._denoise = None

    # --- public API --------------------------------------------------------

    def text_to_mel(self, texts, seed: int = 0, max_steps: int | None = None,
                    with_align: bool = False):
        """list[str] -> (mel_post [B, n_mel, T], out_lengths [B]).

        ``with_align=True`` additionally returns the attention alignment
        [B, T_dec, T_enc] for synthesis-time diagnostics (the reference
        renders it per utterance, ``inference.py:88-90``)."""
        ids, lengths = encode_batch(texts)
        rng = jax.random.PRNGKey(seed)
        _, mel_post, _, align, out_lengths = self._infer_mel(
            self.taco_variables, jnp.asarray(ids), jnp.asarray(lengths), rng,
            max_steps=max_steps,
        )
        if with_align:
            return mel_post, out_lengths, align
        return mel_post, out_lengths

    def mel_to_audio(self, mel, sigma: float = 0.666, seed: int = 0,
                     denoiser_strength: float = 0.0):
        audio = self._infer_audio(
            self.wg_variables, mel, jax.random.PRNGKey(seed + 1), sigma
        )
        if denoiser_strength > 0 and self._denoise is not None:
            audio = self._denoise(audio, denoiser_strength)
        return audio

    def mel_to_audio_long(
        self,
        mel,
        sigma: float = 0.666,
        seed: int = 0,
        denoiser_strength: float = 0.0,
        chunk_frames: int = 256,
        overlap_frames: int | None = None,
    ):
        """Frame-axis chunked vocoding for arbitrarily long mels
        (:mod:`.models.chunked`): bounded per-window activation memory, all
        windows in one batched device call."""
        from .models.chunked import draw_noise

        gpf = self.wg_cfg.upsample_stride // self.wg_cfg.n_group
        noise = draw_noise(
            self.wg_cfg,
            jax.random.PRNGKey(seed + 1),
            mel.shape[0],
            mel.shape[2] * gpf,
        )
        audio = self._infer_audio_long(
            self.wg_variables, mel, noise, sigma,
            chunk=chunk_frames, ov=overlap_frames,
        )
        if denoiser_strength > 0 and self._denoise is not None:
            audio = self._denoise(audio, denoiser_strength)
        return audio

    def synthesize_long(
        self,
        texts,
        sigma: float = 0.666,
        seed: int = 0,
        denoiser_strength: float = 0.0,
        max_steps: int | None = None,
        chunk_frames: int = 256,
        overlap_frames: int | None = None,
    ):
        """Like :meth:`synthesize` but vocodes through the chunked long-form
        path — use for utterances whose mels exceed comfortable single-pass
        activation memory."""
        mel_post, out_lengths = self.text_to_mel(texts, seed, max_steps)
        T = int(np.max(np.asarray(out_lengths)))
        audio = self.mel_to_audio_long(
            mel_post[:, :, :T], sigma, seed, denoiser_strength,
            chunk_frames, overlap_frames,
        )
        audio = np.asarray(audio)
        hop = self.wg_cfg.hop_length
        return [
            audio[i, : int(out_lengths[i]) * hop]
            for i in range(audio.shape[0])
        ]

    def synthesize(
        self,
        texts,
        sigma: float = 0.666,
        seed: int = 0,
        denoiser_strength: float = 0.0,
        max_steps: int | None = None,
    ):
        """list[str] -> list of float32 waveforms (trimmed to true lengths)."""
        mel_post, out_lengths = self.text_to_mel(texts, seed, max_steps)
        # trim batch to the longest real utterance to bound vocoder work
        T = int(np.max(np.asarray(out_lengths)))
        audio = self.mel_to_audio(
            mel_post[:, :, :T], sigma, seed, denoiser_strength
        )
        audio = np.asarray(audio)
        hop = self.wg_cfg.hop_length
        return [
            audio[i, : int(out_lengths[i]) * hop]
            for i in range(audio.shape[0])
        ]

    def synthesize_stream(
        self,
        text: str,
        sigma: float = 0.666,
        seed: int = 0,
        denoiser_strength: float = 0.0,
        max_batch: int = 8,
        max_steps: int | None = None,
    ):
        """Incremental synthesis of long-form text: split into sentences
        (the normalizer's punkt-equivalent splitter), synthesize
        ``max_batch`` sentences per device call, and yield
        ``(sentence, waveform)`` pairs in reading order as each batch
        completes — first audio is ready after one batch instead of after
        the whole document."""
        from .text import split_sentences

        sentences = split_sentences(text)
        for i in range(0, len(sentences), max_batch):
            chunk = sentences[i : i + max_batch]
            wavs = self.synthesize(
                chunk, sigma=sigma, seed=seed,
                denoiser_strength=denoiser_strength, max_steps=max_steps,
            )
            for sent, wav in zip(chunk, wavs):
                yield sent, wav

    def synthesize_to_files(self, texts, paths, sample_rate=None, **kw):
        sr = sample_rate or self.wg_cfg.sampling_rate
        for wav, path in zip(self.synthesize(texts, **kw), paths):
            save_wav(wav, path, sr)


def load_synthesizer(
    hp: HParams,
    taco_ckpt_dir: str,
    wg_cfg: WaveGlowConfig,
    wg_ckpt_dir: str | None,
    use_denoiser: bool = True,
) -> Synthesizer:
    """Restore both models from Orbax checkpoints and build a Synthesizer.

    ``wg_ckpt_dir=None`` leaves the vocoder at random init (for mel-only /
    Griffin-Lim use of :meth:`Synthesizer.text_to_mel`)."""
    import jax.numpy as jnp

    from .train.checkpoint import CheckpointManager
    from .train.state import TrainState, create_train_state

    taco = Tacotron2(hp, n_vocab=N_SYMBOLS)
    rng = jax.random.PRNGKey(0)
    tvars = jax.jit(taco.init)(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32),
        jnp.asarray([8]),
        jnp.zeros((1, hp.n_mel_channels, 8)),
        jnp.asarray([8]),
    )
    tstate = create_train_state(hp, tvars)
    tstate, _ = CheckpointManager(taco_ckpt_dir).restore(tstate)

    wg = WaveGlow(wg_cfg)
    frames = wg_cfg.segment_length // wg_cfg.hop_length + 1
    wvars = jax.jit(wg.init)(
        rng,
        jnp.zeros((1, wg_cfg.n_mel_channels, frames)),
        jnp.zeros((1, wg_cfg.segment_length)),
    )
    import optax

    wstate = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=wvars["params"],
        batch_stats={},
        opt_state=optax.adam(wg_cfg.learning_rate).init(wvars["params"]),
        tx=optax.adam(wg_cfg.learning_rate),
    )
    if wg_ckpt_dir is not None:
        wstate, _ = CheckpointManager(wg_ckpt_dir).restore(wstate)

    return Synthesizer(
        hp=hp,
        taco=taco,
        taco_variables={
            "params": tstate.params,
            "batch_stats": tstate.batch_stats,
        },
        wg_cfg=wg_cfg,
        waveglow=wg,
        wg_variables={"params": wstate.params},
        use_denoiser=use_denoiser,
    )
