"""Full-chain tensor(+data)-parallel serving: text -> mel -> waveform.

Composes the two TP endpoints over ONE mesh — the complete serving story
for a pod slice:

* encoder + postnet: replicated jits (tiny conv/biLSTM stacks — well under
  1 ms of replicated work; sharding them would add collectives for
  nothing);
* autoregressive decode: :class:`~.tp_tacotron.TPTacotronDecoder` —
  column-sharded LSTM kernels split the 36 MB/step weight-streaming floor
  over the 'model' axis (2 all_gathers/step on ICI);
* vocoder: :class:`~.tp.TPWaveGlowServer` — Megatron column/row-sharded WN
  stacks through the fused streaming Pallas kernels (1 psum/layer).

Everything is built and placed ONCE; the decode loop reuses one compiled
chunk program (the chunked decode is the same carry/key discipline as
``Synthesizer.text_to_mel_stream``, so the mel it produces is the
single-device mel to fp tolerance).  ``int8=True`` switches BOTH the
decoder LSTMs and the vocoder WN layers to the int8 serving kernels.

Reference scaled: the single-GPU ``inference.py:80-95`` synthesis app.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import HParams, WaveGlowConfig
from ..models.tacotron2 import Tacotron2
from ..text import encode_batch
from .tp import MODEL_AXIS, TPWaveGlowServer
from .tp_tacotron import TPTacotronDecoder


@dataclasses.dataclass
class TPSynthesizer:
    hp: HParams
    taco: Tacotron2
    taco_variables: dict
    wg_cfg: WaveGlowConfig
    waveglow: object
    wg_variables: dict
    mesh: Mesh
    data_axis: str | None = "data"
    model_axis: str = MODEL_AXIS
    int8: bool = False
    chunk_steps: int = 64
    # both stages' matmul/kernel dtype; jnp.bfloat16 = the tuned serving
    # configuration on real TPUs (the single-device measured numbers),
    # fp32 default keeps the CPU-mesh equality tests exact
    compute_dtype: object = jnp.float32

    def __post_init__(self):
        taco, hp, mesh = self.taco, self.hp, self.mesh
        from ..models.tacotron_serve import extract_decoder_params

        # normalize like the sub-endpoints do (tp.py / tp_tacotron.py), or
        # a model-only mesh with the default data_axis="data" KeyErrors in
        # _endpoints on the first synthesis call
        if self.data_axis is not None and (
                self.data_axis not in mesh.axis_names):
            self.data_axis = None

        rep = NamedSharding(mesh, P())
        # replicated copy of the acoustic-model weights for the small
        # replicated stages (encoder, postnet, memory projection = the
        # decoder's attention submodule, rng derivation).  The decoder's
        # LSTM/projection kernels (~36 MB full-size) are PRUNED first:
        # the decoder endpoint holds its own column-sharded copy, and
        # replicating them too doubled the decoder's HBM per chip
        # (r4 review finding); flax only resolves params a method uses.
        params = dict(self.taco_variables["params"])
        if "decoder" in params and "attention" in params["decoder"]:
            params["decoder"] = {"attention": params["decoder"]["attention"]}
        rep_tree = {**dict(self.taco_variables), "params": params}
        self._taco_vars = jax.device_put(rep_tree, rep)

        self._dp = extract_decoder_params(self.taco_variables, hp)
        # endpoint instances are keyed by (data axis used, int8 decode)
        # and built lazily: batches the data axis can't split (B=1
        # streaming on a data x model mesh) get model-only variants, and
        # int8 decode engages per batch size by measured benefit
        self._decoders: dict = {}
        self._vocoders: dict = {}
        self._denoise_biases: dict = {}

        from ..models.tacotron_serve import replicated_endpoints

        (self._encode, self._pmem, self._derive_rng,
         self._postnet) = replicated_endpoints(taco)

    def _endpoints(self, B: int):
        """(decoder, vocoder) able to shard a batch of ``B``: data-sharded
        when the data axis divides ``B``, else model-only (weights sharded
        over 'model' only — the B=1 streaming case on a data x model
        mesh).  With ``int8=True`` the vocoder is always int8 (a win at
        every size) but the DECODER follows measured benefit: below the
        crossover batch the bf16 kernels serve (int8 decode is a
        wash-to-loss there and adds recurrent-path quantization noise —
        driver record r3; ``models.tacotron_serve.int8_decode_worthwhile``)."""
        from ..models.tacotron_serve import int8_decode_worthwhile

        nd = self.mesh.shape[self.data_axis] if self.data_axis else 1
        da = self.data_axis if (nd <= 1 or B % nd == 0) else None
        int8_dec = self.int8 and int8_decode_worthwhile(B)
        dkey = (da, int8_dec)
        if dkey not in self._decoders:
            self._decoders[dkey] = TPTacotronDecoder(
                self._dp, self.hp, self.mesh, data_axis=da,
                model_axis=self.model_axis, int8=int8_dec,
                dtype=self.compute_dtype,
            )
        if da not in self._vocoders:
            self._vocoders[da] = TPWaveGlowServer(
                self.waveglow, self.wg_variables, self.mesh,
                data_axis=da, model_axis=self.model_axis,
                fused=True, int8=self.int8,
                compute_dtype=self.compute_dtype,
            )
        return self._decoders[dkey], self._vocoders[da]

    def _speaker_array(self, speaker_id, B: int):
        """Voice-selection knob -> [B] int32 or None (shared validation:
        ``tacotron_serve.speaker_ids_array``)."""
        from ..models.tacotron_serve import speaker_ids_array

        ids = speaker_ids_array(speaker_id, B, self.taco.num_speakers)
        return None if ids is None else jnp.asarray(ids)

    def denoise_bias(self, denoiser_kwargs: dict | None = None):
        """Bias spectrum for a denoiser configuration, computed once per
        config and cached BY CONFIG (the streaming path and make_server_tp
        may use different STFT configs concurrently — a single shared
        attribute would let one clobber the other's).  Returns the cache
        key; read the live value through ``self._denoise_biases[key]`` (a
        future live-swap path updates the dict entries)."""
        from ..models.denoiser import make_denoiser

        kw = denoiser_kwargs or {}
        key = tuple(sorted(kw.items()))
        if key not in self._denoise_biases:
            bias, _ = make_denoiser(self.waveglow, self.wg_variables, **kw)
            self._denoise_biases[key] = bias
        return key

    def _mel_stream(self, texts, seed: int, max_steps: int | None,
                    chunk_steps: int | None = None, speaker_id=None):
        """Build the chunked-decode generator for ``texts`` through the TP
        decoder (shared engine :func:`~..infer.chunked_mel_stream`).
        Returns ``(generator, requested, B)``."""
        from ..infer import chunked_mel_stream

        hp = self.hp
        texts = [texts] if isinstance(texts, str) else texts
        ids_np, lengths_np = encode_batch(texts)
        ids, lengths = jnp.asarray(ids_np), jnp.asarray(lengths_np)
        memory = self._encode(
            self._taco_vars, ids, lengths,
            self._speaker_array(speaker_id, ids.shape[0]))
        pmem = self._pmem(self._taco_vars, memory)
        B = memory.shape[0]
        decoder, _ = self._endpoints(B)

        state = decoder.initial_state(memory)
        frame = jnp.zeros((B, hp.n_mel_channels), jnp.float32)
        finished = jnp.zeros((B,), bool)

        requested = max_steps or hp.max_decoder_steps
        cs = chunk_steps or self.chunk_steps
        limit = -(-requested // cs) * cs
        base = self._derive_rng(self._taco_vars, jax.random.PRNGKey(seed))
        all_rngs = jax.random.split(base, limit)

        def decode_fn(carry, sr):
            carry, mel_c, _, _, active = decoder(
                memory, pmem, *carry, sr, lengths
            )
            return carry, mel_c, active

        gen = chunked_mel_stream(
            hp, (state, frame, finished), decode_fn,
            lambda win: self._postnet(self._taco_vars, win),
            requested, cs, all_rngs,
        )
        return gen, requested, B

    def text_to_mel_stream(self, texts, chunk_steps: int | None = None,
                           seed: int = 0, max_steps: int | None = None,
                           speaker_id=None):
        """Incremental TP text -> mel: yields ``(mel_post_chunk,
        out_lengths_so_far, final)`` as the sharded decoder advances —
        the TP analog of ``Synthesizer.text_to_mel_stream``."""
        gen, _, _ = self._mel_stream(texts, seed, max_steps, chunk_steps,
                                     speaker_id)
        yield from gen

    def synthesize_incremental(self, text: str, sigma: float = 0.666,
                               seed: int = 0, chunk_steps: int | None = None,
                               max_steps: int | None = None,
                               denoiser_strength: float = 0.0,
                               denoiser_kwargs: dict | None = None,
                               speaker_id: int | None = None):
        """Stream ONE utterance's audio through the TP chain: TP chunked
        decode feeding receptive-field TP vocoder windows over
        position-consistent noise (:func:`~..infer.
        incremental_vocode_stream`) — first audio after ~one decode chunk,
        with BOTH stages' per-step work divided over the 'model' axis.
        This is the latency configuration TP decode exists for: the
        36 MB/step weight stream and the WN stacks are each split p ways
        on the critical path to first audio.

        ``denoiser_strength > 0`` streams bias-subtracted audio like the
        single-device twin (windowed denoise over the emitted stream,
        ``< n_fft`` added latency; bias precomputed lazily once per
        ``denoiser_kwargs`` and reused)."""
        from ..infer import incremental_vocode_stream

        cs = chunk_steps or self.chunk_steps
        gen, _, _ = self._mel_stream(text, seed, max_steps, cs, speaker_id)
        _, vocoder = self._endpoints(1)         # B=1 windows
        audio = incremental_vocode_stream(
            self.wg_cfg, gen,
            lambda mel, nz, sg: np.asarray(vocoder(mel, None, sg, noise=nz)),
            sigma, seed, cs,
        )
        if denoiser_strength > 0:
            from ..models.denoiser import (cached_stream_denoiser,
                                           denoise_stream,
                                           denoiser_stft_params)

            kw = denoiser_kwargs or {}
            bkey = self.denoise_bias(kw)     # bias cached by config alone
            den = cached_stream_denoiser(
                self, (bkey, cs),
                lambda: self._denoise_biases[bkey],
                denoiser_stft_params(**kw),
                cs, self.wg_cfg.upsample_stride)
            audio = denoise_stream(audio, den, denoiser_strength)
        yield from audio

    def synthesize_incremental_batch(self, texts, sigma: float = 0.666,
                                     seed: int = 0,
                                     chunk_steps: int | None = None,
                                     max_steps: int | None = None,
                                     speaker_id=None):
        """N concurrent streams through the TP chain, yielding
        ``(row, chunk)`` pairs (:func:`~..infer.
        incremental_vocode_stream_batch`): one lockstep TP decode drives
        every row with the 36 MB/step weight stream split over the 'model'
        axis, and each emission round is one batched TP vocoder call on
        the stacked per-row windows — concurrent-session serving with both
        stages mesh-split."""
        from ..infer import incremental_vocode_stream_batch

        cs = chunk_steps or self.chunk_steps
        gen, _, B = self._mel_stream(texts, seed, max_steps, cs, speaker_id)
        _, vocoder = self._endpoints(B)
        # the engine's vocode_exact path (a row shorter than one window)
        # issues BATCH-1 calls, which a data-sharded vocoder can't split —
        # dispatch those to the model-only endpoint (same trick as
        # server.make_server_tp's vocode_exact_fn)
        _, vocoder1 = self._endpoints(1)

        def _vocode(mel, nz, sg):
            v = vocoder1 if mel.shape[0] == 1 else vocoder
            return np.asarray(v(mel, None, sg, noise=nz))

        yield from incremental_vocode_stream_batch(
            self.wg_cfg, gen, _vocode, sigma, seed, cs,
        )

    def text_to_mel(self, texts, seed: int = 0,
                    max_steps: int | None = None, speaker_id=None):
        """list[str] -> (mel_post [B, n_mel, requested], out_lengths [B]).

        Drives the shared chunked-decode engine
        (:func:`~..infer.chunked_mel_stream`) through the TP decoder —
        early exit once every gate fired (plus the engine's postnet-context
        tail), then zero-masks frames past each row's stop and zero-pads to
        ``requested`` frames, exactly reproducing the batch path's
        ``mask_outputs`` contract: the result equals single-device
        ``Synthesizer.text_to_mel`` element-for-element."""
        gen, requested, B = self._mel_stream(texts, seed, max_steps,
                                             speaker_id=speaker_id)
        chunks: list = []
        out_len = np.zeros((B,), np.int64)
        for post_c, out_len, _final in gen:
            chunks.append(post_c)

        mel_post = np.concatenate(chunks, axis=-1)
        if mel_post.shape[-1] < requested:      # early gate exit
            mel_post = np.pad(
                mel_post,
                ((0, 0), (0, 0), (0, requested - mel_post.shape[-1])),
            )
        valid = np.arange(requested)[None, :] < out_len[:, None]
        mel_post = jnp.asarray(
            np.where(valid[:, None, :], mel_post, 0.0)
        )
        return mel_post, jnp.asarray(out_len)

    def mel_to_audio(self, mel, sigma: float = 0.666, seed: int = 0):
        _, vocoder = self._endpoints(mel.shape[0])
        return vocoder(mel, jax.random.PRNGKey(seed + 1), sigma)

    def synthesize(self, texts, sigma: float = 0.666, seed: int = 0,
                   max_steps: int | None = None, speaker_id=None):
        """list[str] -> list of float32 waveforms trimmed to true lengths
        (= ``Synthesizer.synthesize`` semantics, pod-sharded)."""
        mel_post, out_lengths = self.text_to_mel(texts, seed, max_steps,
                                                 speaker_id=speaker_id)
        T = int(np.max(np.asarray(out_lengths))) or 1
        audio = np.asarray(
            self.mel_to_audio(mel_post[:, :, :T], sigma, seed)
        )
        # samples per mel frame actually emitted by the vocoder (see
        # Synthesizer.synthesize — hop_length only matches on full-size cfgs)
        hop = self.wg_cfg.upsample_stride
        return [
            audio[i, : int(out_lengths[i]) * hop]
            for i in range(audio.shape[0])
        ]
