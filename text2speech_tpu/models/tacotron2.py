"""Tacotron-2 acoustic model, TPU-native.

Rebuilds the architecture of ``/root/reference/tacotron/tacotron.py`` (char
embedding -> conv+BiLSTM encoder -> location-sensitive-attention LSTM decoder
-> conv postnet) as pure-functional flax modules:

* the reference's per-frame Python ``while`` loops (teacher-forced ``forward``
  at ``tacotron.py:395-429``, autoregressive ``inference`` at ``:431-466``)
  become single ``lax.scan``s over a fused step function;
* inference runs a fixed ``max_decoder_steps`` scan with stop-token masking
  (``sigmoid(gate) > threshold``, ``tacotron.py:455-459``) instead of a
  data-dependent ``break`` — identical outputs through ``parse_output``-style
  masking (``tacotron.py:67-76``);
* cuDNN LSTMs are fused-matmul scans (:mod:`..ops.lstm`), convs are XLA
  ``lax.conv_general_dilated`` (MXU), prenet dropout stays always-on
  (``tacotron/modules.py:21``) via explicit PRNG threading.

Shapes follow the torch layout: mels are [B, n_mel, T].
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import HParams
from ..ops.lstm import BiLSTM, LSTMCell


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] -> bool [B, max_len]; True inside the valid region
    (``utils/data_utils.py:11-15`` equivalent, device-agnostic)."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


class Conv1d(nn.Module):
    """1-D convolution over [B, T, C] with 'SAME'-style explicit padding —
    the ConvNorm replacement (``utils/layers.py:21-39``); Xavier-uniform init."""

    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    param_dtype: Any = jnp.float32
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.dilation * (self.kernel_size - 1) // 2
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
            use_bias=self.use_bias,
            kernel_init=nn.initializers.xavier_uniform(),
            param_dtype=self.param_dtype,
            dtype=self.dtype,
        )(x)


class Prenet(nn.Module):
    """Two ReLU+dropout layers; dropout is ON in both train and eval
    (reference ``tacotron/modules.py:11-22`` passes training=True always)."""

    sizes: tuple[int, ...] = (256, 256)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, dropout_rng: jax.Array) -> jnp.ndarray:
        # dropout_rng is either ONE key (shape [2]; batch rows share the
        # per-step key, draws span the whole [B, ...] activation — the batch
        # decode semantics) or PER-ROW keys (shape [B, 2]; each row's mask
        # derives only from its own key, making a row's dropout stream
        # independent of batch size and slot — what the continuous-batching
        # server needs so a session's output doesn't depend on when it
        # joined the batch)
        per_row = dropout_rng.ndim == 2
        for i, size in enumerate(self.sizes):
            x = nn.Dense(size, use_bias=False, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
            if per_row:
                splits = jax.vmap(jax.random.split)(dropout_rng)  # [B, 2, 2]
                dropout_rng, sub = splits[:, 0], splits[:, 1]
                keep = jax.vmap(
                    lambda k: jax.random.bernoulli(k, 0.5, x.shape[1:])
                )(sub)
            else:
                dropout_rng, sub = jax.random.split(dropout_rng)
                keep = jax.random.bernoulli(sub, 0.5, x.shape)
            x = jnp.where(keep, x / 0.5, 0.0)
        return x


class Encoder(nn.Module):
    """3x [conv512 k5 + BN + ReLU + dropout0.5] -> BiLSTM(256+256)
    (reference ``tacotron/tacotron.py:167-220``)."""

    hp: HParams
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        embedded: jnp.ndarray,          # [B, T, embed]
        lengths: jnp.ndarray | None,    # [B] or None (inference)
        train: bool = False,
    ) -> jnp.ndarray:
        hp = self.hp
        x = embedded
        for i in range(hp.enc_conv_num_layers):
            x = Conv1d(hp.enc_conv_channels, hp.enc_conv_kernel_size,
                       dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(rate=hp.dropout_prob, deterministic=not train)(x)
        return BiLSTM(
            hp.enc_conv_channels // 2, dtype=self.dtype, name="bilstm"
        )(x, lengths)


class Postnet(nn.Module):
    """5 convs 80->512->...->80, k=5, tanh on all but last, BN + dropout
    (reference ``tacotron/modules.py:94-137``)."""

    hp: HParams
    dtype: Any = None

    @nn.compact
    def __call__(self, mel: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # mel: [B, n_mel, T] -> channel-last for conv
        hp = self.hp
        x = mel.transpose(0, 2, 1)
        n = hp.postnet_n_convolutions
        for i in range(n):
            feats = hp.n_mel_channels if i == n - 1 else hp.postnet_embedding_dim
            x = Conv1d(feats, hp.postnet_kernel_size, dtype=self.dtype,
                       name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name=f"bn{i}",
            )(x)
            if i != n - 1:
                x = jnp.tanh(x)
            x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        return x.transpose(0, 2, 1)


class LocationAttention(nn.Module):
    """Location-sensitive additive attention
    (reference ``tacotron/tacotron.py:91-166``).

    Memory terms (``W_m @ memory``) are precomputed once per utterance by the
    caller; per-step work is two small matmuls + a k=31 conv over the
    attention-weight history.
    """

    hp: HParams
    dtype: Any = None

    def setup(self):
        hp = self.hp
        self.query_layer = nn.Dense(
            hp.attention_dim, use_bias=False, dtype=self.dtype, name="query"
        )
        self.memory_layer = nn.Dense(
            hp.attention_dim, use_bias=False, dtype=self.dtype, name="memory"
        )
        self.v = nn.Dense(1, use_bias=False, dtype=self.dtype, name="v")
        self.location_conv = Conv1d(
            hp.attention_location_n_filters,
            hp.attention_location_kernel_size,
            use_bias=False,
            dtype=self.dtype,
            name="loc_conv",
        )
        self.location_dense = nn.Dense(
            hp.attention_dim, use_bias=False, dtype=self.dtype, name="loc_dense"
        )

    def process_memory(self, memory: jnp.ndarray) -> jnp.ndarray:
        return self.memory_layer(memory)

    def __call__(
        self,
        query: jnp.ndarray,             # [B, attention_rnn_dim]
        memory: jnp.ndarray,            # [B, T_in, enc]
        processed_memory: jnp.ndarray,  # [B, T_in, attention_dim]
        attention_weights_cat: jnp.ndarray,  # [B, T_in, 2] (prev, cum)
        mask: jnp.ndarray | None,       # bool [B, T_in], True = valid
    ):
        processed_query = self.query_layer(query)[:, None, :]
        processed_loc = self.location_dense(self.location_conv(attention_weights_cat))
        energies = self.v(
            jnp.tanh(processed_query + processed_loc + processed_memory)
        )[..., 0].astype(jnp.float32)
        if mask is not None:
            energies = jnp.where(mask, energies, -jnp.inf)
        weights = jax.nn.softmax(energies, axis=1).astype(memory.dtype)
        context = jnp.einsum(
            "bt,bte->be", weights, memory, preferred_element_type=jnp.float32
        ).astype(memory.dtype)
        return context, weights


class DecoderState(NamedTuple):
    attention_h: jnp.ndarray
    attention_c: jnp.ndarray
    decoder_h: jnp.ndarray
    decoder_c: jnp.ndarray
    attention_weights: jnp.ndarray
    attention_weights_cum: jnp.ndarray
    attention_context: jnp.ndarray


class Decoder(nn.Module):
    """Autoregressive mel decoder; one step =
    prenet -> attention LSTM -> location attention -> decoder LSTM -> proj
    (reference ``tacotron/tacotron.py:355-393``), scanned over time.
    """

    hp: HParams
    dtype: Any = None
    remat: bool = False   # rematerialize each teacher-forced scan step in
                          # backward: stores only the [B, ~1k] carry per step
                          # instead of every attention/LSTM intermediate —
                          # lifts the train-batch HBM ceiling (b32 -> b64+ at
                          # reference size) on the weight-streaming-bound
                          # decoder, where batch is near-free

    def setup(self):
        hp = self.hp
        self.prenet = Prenet((hp.prenet_dim, hp.prenet_dim), dtype=self.dtype,
                             name="prenet")
        self.attention_rnn = LSTMCell(hp.attention_rnn_dim, dtype=self.dtype,
                                      name="attention_rnn")
        self.attention = LocationAttention(hp, dtype=self.dtype, name="attention")
        self.decoder_rnn = LSTMCell(hp.decoder_rnn_dim, dtype=self.dtype,
                                    name="decoder_rnn")
        self.mel_proj = nn.Dense(
            hp.n_mel_channels * hp.n_frames_per_step, dtype=self.dtype,
            name="mel_proj",
        )
        self.gate_proj = nn.Dense(1, dtype=self.dtype, name="gate_proj")

    def initial_state(self, memory: jnp.ndarray) -> DecoderState:
        hp = self.hp
        B, T_in, _ = memory.shape
        z = lambda d: jnp.zeros((B, d), memory.dtype)
        return DecoderState(
            attention_h=z(hp.attention_rnn_dim),
            attention_c=z(hp.attention_rnn_dim),
            decoder_h=z(hp.decoder_rnn_dim),
            decoder_c=z(hp.decoder_rnn_dim),
            attention_weights=jnp.zeros((B, T_in), memory.dtype),
            attention_weights_cum=jnp.zeros((B, T_in), memory.dtype),
            attention_context=z(hp.enc_conv_channels),
        )

    def step(
        self,
        state: DecoderState,
        prenet_out: jnp.ndarray,        # [B, prenet_dim]
        memory: jnp.ndarray,
        processed_memory: jnp.ndarray,
        mask: jnp.ndarray | None,
        dropout_rng: jax.Array,
        train: bool,
    ):
        hp = self.hp
        rng_att, rng_dec = jax.random.split(dropout_rng)

        cell_input = jnp.concatenate([prenet_out, state.attention_context], -1)
        (att_h, att_c), _ = self.attention_rnn(
            (state.attention_h, state.attention_c), cell_input
        )
        if train and hp.p_attention_dropout > 0:
            keep = jax.random.bernoulli(rng_att, 1 - hp.p_attention_dropout, att_h.shape)
            att_h = jnp.where(keep, att_h / (1 - hp.p_attention_dropout), 0.0)

        weights_cat = jnp.stack(
            [state.attention_weights, state.attention_weights_cum], axis=-1
        )
        context, weights = self.attention(
            att_h, memory, processed_memory, weights_cat, mask
        )
        weights_cum = state.attention_weights_cum + weights

        dec_input = jnp.concatenate([att_h, context], -1)
        (dec_h, dec_c), _ = self.decoder_rnn(
            (state.decoder_h, state.decoder_c), dec_input
        )
        if train and hp.p_decoder_dropout > 0:
            keep = jax.random.bernoulli(rng_dec, 1 - hp.p_decoder_dropout, dec_h.shape)
            dec_h = jnp.where(keep, dec_h / (1 - hp.p_decoder_dropout), 0.0)

        proj_input = jnp.concatenate([dec_h, context], -1)
        mel_frame = self.mel_proj(proj_input)
        gate = self.gate_proj(proj_input)[..., 0]

        new_state = DecoderState(
            att_h, att_c, dec_h, dec_c, weights, weights_cum, context
        )
        return new_state, (mel_frame, gate, weights)

    def teacher_forced(
        self,
        memory: jnp.ndarray,            # [B, T_in, enc]
        mels: jnp.ndarray,              # [B, n_mel, T_out]
        memory_lengths: jnp.ndarray,    # [B]
        dropout_rng: jax.Array,
        train: bool = True,
    ):
        """All-steps decode with ground-truth inputs; prenet over every frame
        is one batched matmul, recurrence is one ``lax.scan``."""
        B, n_mel, T_out = mels.shape
        mask = sequence_mask(memory_lengths, memory.shape[1])
        processed_memory = self.attention.process_memory(memory)

        go = jnp.zeros((B, 1, n_mel), mels.dtype)
        frames_in = jnp.concatenate([go, mels.transpose(0, 2, 1)[:, :-1]], axis=1)
        rng_pre, rng_steps = jax.random.split(dropout_rng)
        prenet_out = self.prenet(frames_in, rng_pre)    # [B, T_out, prenet]

        state0 = self.initial_state(memory)
        step_rngs = jax.random.split(rng_steps, T_out)

        def body(state, inputs):
            pre_t, rng_t = inputs
            return self.step(
                state, pre_t, memory, processed_memory, mask, rng_t, train
            )

        if self.remat and not self.is_initializing():
            # Params/memory are closure captures (differentiated-through by
            # jax.checkpoint); the body only READS existing params, so no
            # flax lifting is needed.  prevent_cse=False: the body lives
            # under lax.scan, where CSE across steps cannot occur.
            body = jax.checkpoint(body, prevent_cse=False)

        if self.is_initializing():
            # Create all step parameters eagerly; the scan body below then only
            # applies existing params (flax cannot create vars inside lax.scan).
            self.step(
                state0, prenet_out[:, 0], memory, processed_memory, mask,
                step_rngs[0], train,
            )

        _, (mel_out, gate_out, align) = jax.lax.scan(
            body, state0, (prenet_out.transpose(1, 0, 2), step_rngs)
        )
        # outputs: [T_out, B, .] -> torch layout
        mel_out = mel_out.transpose(1, 2, 0)            # [B, n_mel, T_out]
        gate_out = gate_out.transpose(1, 0)             # [B, T_out]
        align = align.transpose(1, 0, 2)                # [B, T_out, T_in]
        return mel_out, gate_out, align

    def autoregressive(
        self,
        memory: jnp.ndarray,
        dropout_rng: jax.Array,
        memory_lengths: jnp.ndarray | None = None,
        max_steps: int | None = None,
    ):
        """Fixed-trip scan to ``max_decoder_steps`` with stop-token masking.

        Returns (mel [B, n_mel, T], gate [B, T], align [B, T, T_in],
        out_lengths [B]) where out_lengths counts frames up to and including
        the stop frame (reference ``tacotron.py:447-461`` break semantics).
        """
        hp = self.hp
        T = hp.max_decoder_steps if max_steps is None else max_steps
        B, T_in, _ = memory.shape
        mask = (
            sequence_mask(memory_lengths, T_in)
            if memory_lengths is not None
            else None
        )
        processed_memory = self.attention.process_memory(memory)
        state0 = self.initial_state(memory)
        frame0 = jnp.zeros((B, hp.n_mel_channels), memory.dtype)
        finished0 = jnp.zeros((B,), bool)

        def body(carry, rng_t):
            state, frame, finished = carry
            rng_pre, rng_step = jax.random.split(rng_t)
            pre = self.prenet(frame, rng_pre)
            state, (mel_frame, gate, weights) = self.step(
                state, pre, memory, processed_memory, mask, rng_step, False
            )
            stop_now = jax.nn.sigmoid(gate) > hp.gate_threshold
            # was this frame produced before stopping? (stop frame included)
            active = ~finished
            finished = finished | stop_now
            return (state, mel_frame, finished), (mel_frame, gate, weights, active)

        rngs = jax.random.split(dropout_rng, T)
        if self.is_initializing():
            body((state0, frame0, finished0), rngs[0])
        _, (mel_out, gate_out, align, active) = jax.lax.scan(
            body, (state0, frame0, finished0), rngs
        )
        mel_out = mel_out.transpose(1, 2, 0)
        gate_out = gate_out.transpose(1, 0)
        align = align.transpose(1, 0, 2)
        active = active.transpose(1, 0)                 # [B, T]
        out_lengths = active.sum(axis=1).astype(jnp.int32)
        return mel_out, gate_out, align, out_lengths


class Tacotron2(nn.Module):
    """Top-level module (reference ``Tacotron``, ``tacotron/tacotron.py:14-89``)."""

    hp: HParams
    n_vocab: int = 80
    num_speakers: int = 1
    compute_dtype: Any = None   # e.g. jnp.bfloat16 for MXU-native inference
    decoder_remat: bool = False  # see Decoder.remat

    def setup(self):
        hp = self.hp
        # Uniform[-val, val] with val = sqrt(3)*sqrt(2/(n_vocab+embed))
        # (reference tacotron.py:22-25).
        std = float(np.sqrt(2.0 / (self.n_vocab + hp.embedding_size)))
        val = float(np.sqrt(3.0)) * std

        def _uniform_sym(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -val, val)

        self.embedding = nn.Embed(
            self.n_vocab,
            hp.embedding_size,
            embedding_init=_uniform_sym,
            name="embedding",
        )
        self.speaker_embedding = nn.Embed(
            self.num_speakers, hp.speaker_embedding_size, name="speaker_embedding"
        )
        # Speaker projection into the encoder space.  The reference builds
        # this scaffolding (speaker_embed_table + Linear+Softsign + Linear,
        # tacotron.py:27-29) but never wires it into forward; here it is
        # functional whenever num_speakers > 1 and speaker_ids are given.
        self.speaker_proj = nn.Dense(hp.enc_conv_channels, name="speaker_proj")
        self.encoder = Encoder(hp, dtype=self.compute_dtype, name="encoder")
        self.decoder = Decoder(hp, dtype=self.compute_dtype,
                               remat=self.decoder_remat, name="decoder")
        self.postnet = Postnet(hp, dtype=self.compute_dtype, name="postnet")

    def embed(self, text_ids: jnp.ndarray) -> jnp.ndarray:
        e = self.embedding(text_ids)
        return e.astype(self.compute_dtype) if self.compute_dtype else e

    def _condition_on_speaker(
        self, encoder_out: jnp.ndarray, speaker_ids: jnp.ndarray | None
    ) -> jnp.ndarray:
        """Additive speaker conditioning on the encoder memory
        (softsign(embed) -> Dense, broadcast over time)."""
        if speaker_ids is None or self.num_speakers <= 1:
            return encoder_out
        s = self.speaker_embedding(speaker_ids)
        s = nn.soft_sign(s)
        return encoder_out + self.speaker_proj(s)[:, None, :]

    def __call__(
        self,
        text_ids: jnp.ndarray,          # [B, T_in] int32
        text_lengths: jnp.ndarray,      # [B]
        mels: jnp.ndarray,              # [B, n_mel, T_out]
        output_lengths: jnp.ndarray,    # [B]
        speaker_ids: jnp.ndarray | None = None,
        train: bool = True,
    ):
        """Teacher-forced forward (reference ``forward``, ``tacotron.py:36-49``),
        with parse_output masking (``:67-76``) folded in."""
        hp = self.hp
        embedded = self.embed(text_ids)
        encoder_out = self.encoder(embedded, text_lengths, train=train)
        encoder_out = self._condition_on_speaker(encoder_out, speaker_ids)
        rng = self.make_rng("dropout")
        mel_out, gate_out, align = self.decoder.teacher_forced(
            encoder_out, mels, text_lengths, rng, train=train
        )
        mel_post = mel_out + self.postnet(mel_out, train=train)
        mel_out, mel_post, gate_out, align = (
            mel_out.astype(jnp.float32), mel_post.astype(jnp.float32),
            gate_out.astype(jnp.float32), align.astype(jnp.float32),
        )

        if hp.mask_padding:
            mel_out, mel_post, gate_out = mask_outputs(
                mel_out, mel_post, gate_out, output_lengths
            )
        return mel_out, mel_post, gate_out, align

    def encode(
        self,
        text_ids: jnp.ndarray,
        speaker_ids: jnp.ndarray | None = None,
        text_lengths: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Text -> encoder memory [B, T_in, enc] (the inference prefix of
        ``tacotron.py:51-58``), exposed separately for incremental decoding."""
        embedded = self.embed(text_ids)
        encoder_out = self.encoder(embedded, text_lengths, train=False)
        return self._condition_on_speaker(encoder_out, speaker_ids)

    def derive_rng(self):
        """The dropout key :meth:`inference` derives via ``make_rng`` from
        the caller-provided seed — exposed so incremental decoding can
        reproduce the batch path's prenet-dropout stream bitwise (split this
        into ``max_steps`` keys and feed slices to :meth:`decode_chunk`)."""
        return self.make_rng("dropout")

    def decode_chunk(
        self,
        memory: jnp.ndarray,            # [B, T_in, enc]
        state: DecoderState,
        frame: jnp.ndarray,             # [B, n_mel] last emitted frame
        finished: jnp.ndarray,          # [B] bool
        step_rngs: jnp.ndarray,         # [n_steps] PRNG keys
        text_lengths: jnp.ndarray | None = None,
    ):
        """``n_steps`` autoregressive decoder steps from an explicit carry —
        the streaming unit of :meth:`inference`.  Returns
        ``((state, frame, finished), mel [B, n_mel, n], gate, align, active)``
        where ``active[b, t]`` marks frames produced at or before row b's
        stop frame.  The carry crosses jit boundaries as a pytree, so a
        host-side loop over chunks is re-trace-free at fixed ``n_steps``;
        first-audio latency becomes one chunk instead of the full
        ``max_decoder_steps`` scan (reference break-loop:
        ``tacotron.py:447-461``).  Feeding consecutive slices of
        ``jax.random.split(derive_rng-result, T)`` makes the chunked decode
        bitwise-identical to one :meth:`inference` scan.

        ``step_rngs`` may instead be PER-ROW keys ``[n_steps, B]``
        (array shape ``[n_steps, B, 2]``): each row's prenet-dropout draws
        then derive only from its own key stream, so a row's decode is
        independent of batch size and of the other rows — the contract the
        continuous-batching server (:mod:`..server`) relies on to admit
        sessions into arbitrary slots mid-flight."""
        hp = self.hp
        B, T_in, _ = memory.shape
        mask = (
            sequence_mask(text_lengths, T_in)
            if text_lengths is not None
            else None
        )
        processed_memory = self.decoder.attention.process_memory(memory)

        def body(carry, rng_t):
            state, frame, finished = carry
            if rng_t.ndim == 2:          # per-row keys [B, 2]
                splits = jax.vmap(jax.random.split)(rng_t)
                rng_pre, rng_step = splits[:, 0], splits[:, 1][0]
            else:
                rng_pre, rng_step = jax.random.split(rng_t)
            pre = self.decoder.prenet(frame, rng_pre)
            state, (mel_frame, gate, weights) = self.decoder.step(
                state, pre, memory, processed_memory, mask, rng_step, False
            )
            stop_now = jax.nn.sigmoid(gate) > hp.gate_threshold
            active = ~finished
            finished = finished | stop_now
            return (state, mel_frame, finished), (mel_frame, gate, weights,
                                                  active)

        carry, (mel, gate, align, active) = jax.lax.scan(
            body, (state, frame, finished), step_rngs
        )
        return (
            carry,
            mel.transpose(1, 2, 0).astype(jnp.float32),
            gate.transpose(1, 0).astype(jnp.float32),
            align.transpose(1, 0, 2).astype(jnp.float32),
            active.transpose(1, 0),
        )

    def postnet_residual(self, mel: jnp.ndarray) -> jnp.ndarray:
        """Postnet residual for a mel window [B, n_mel, T] — exposed for
        windowed incremental application (one-sided receptive field =
        ``(postnet_kernel_size // 2) * postnet_n_convolutions`` frames)."""
        return self.postnet(mel.astype(
            self.compute_dtype if self.compute_dtype else mel.dtype
        ), train=False).astype(jnp.float32)

    def inference(
        self,
        text_ids: jnp.ndarray,
        speaker_ids: jnp.ndarray | None = None,
        text_lengths: jnp.ndarray | None = None,
        max_steps: int | None = None,
    ):
        """Autoregressive synthesis (reference ``inference``, ``tacotron.py:51-65``)."""
        embedded = self.embed(text_ids)
        encoder_out = self.encoder(embedded, text_lengths, train=False)
        encoder_out = self._condition_on_speaker(encoder_out, speaker_ids)
        rng = self.make_rng("dropout")
        mel_out, gate_out, align, out_lengths = self.decoder.autoregressive(
            encoder_out, rng, memory_lengths=text_lengths, max_steps=max_steps
        )
        mel_post = mel_out + self.postnet(mel_out, train=False)
        mel_out, mel_post, gate_out, align = (
            mel_out.astype(jnp.float32), mel_post.astype(jnp.float32),
            gate_out.astype(jnp.float32), align.astype(jnp.float32),
        )
        mel_out, mel_post, gate_out = mask_outputs(
            mel_out, mel_post, gate_out, out_lengths
        )
        return mel_out, mel_post, gate_out, align, out_lengths


def mask_outputs(mel_out, mel_post, gate_out, output_lengths):
    """Zero mels and pin gate energies to 1e3 beyond each utterance's length
    (reference ``parse_output``, ``tacotron.py:67-76``)."""
    T = mel_out.shape[-1]
    valid = sequence_mask(output_lengths, T)            # [B, T]
    mel_mask = valid[:, None, :]
    mel_out = jnp.where(mel_mask, mel_out, 0.0)
    mel_post = jnp.where(mel_mask, mel_post, 0.0)
    gate_out = jnp.where(valid, gate_out, 1e3)
    return mel_out, mel_post, gate_out
