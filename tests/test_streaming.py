"""Incremental (streaming) synthesis: chunked decode must equal the batch
autoregressive scan bitwise (same carry, same per-step dropout keys), the
windowed postnet must equal the full-sequence postnet, and streamed audio
must equal a single-pass vocode of the final mel with the same noise stream.
This is the first-audio-latency path (VERDICT r2 weak #5): audio starts after
~chunk_steps decoder steps instead of the full max_decoder_steps scan.
Reference behavior being streamed: ``tacotron/tacotron.py:431-466`` (decoder
break loop) + ``inference.py:80-95`` (mel -> waveform).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_synthesizer import HP, WG, synthesizer  # noqa: F401 (fixture)


def test_mel_stream_matches_batch_inference(synthesizer):  # noqa: F811
    texts = ["안녕하세요.", "존경하는 사람"]
    chunk = 8
    limit = 24  # ceil(max_decoder_steps=20 / 8) * 8

    mel_ref, len_ref = synthesizer.text_to_mel(texts, seed=3, max_steps=limit)
    mel_ref, len_ref = np.asarray(mel_ref), np.asarray(len_ref)

    chunks, final_lens = [], None
    for mel_c, out_len, final in synthesizer.text_to_mel_stream(
        texts, chunk_steps=chunk, seed=3, max_steps=limit
    ):
        chunks.append(mel_c)
        final_lens = out_len
    mel_stream = np.concatenate(chunks, axis=-1)

    assert (final_lens == len_ref).all(), (final_lens, len_ref)
    # compare within each row's true length (the batch path masks beyond)
    for b in range(len(texts)):
        L = int(len_ref[b])
        np.testing.assert_allclose(
            mel_stream[b, :, :L], mel_ref[b, :, :L], atol=2e-5,
            err_msg=f"row {b}",
        )


def test_synthesize_incremental_matches_single_pass(synthesizer):  # noqa: F811
    """Streamed audio chunks, concatenated, equal one single-pass vocode of
    the final mel with the same position-consistent noise stream."""
    from text2speech_tpu.models.chunked import draw_noise
    from text2speech_tpu.models.waveglow import WaveGlow

    text = "안녕하세요. 존경하는 사람과 함께 갑니다."
    chunk, seed, sigma = 8, 5, 0.8
    hop = WG.upsample_stride
    gpf = hop // WG.n_group

    audio_chunks = list(synthesizer.synthesize_incremental(
        text, sigma=sigma, seed=seed, chunk_steps=chunk
    ))
    assert len(audio_chunks) >= 2, "stream should emit multiple chunks"
    streamed = np.concatenate(audio_chunks)

    # rebuild the mel + noise stream exactly as the generator drew them
    mel_parts, noise_parts, true_len, ci = [], None, None, 0
    key = jax.random.PRNGKey(seed + 1)
    for mel_c, out_len, final in synthesizer.text_to_mel_stream(
        text, chunk_steps=chunk, seed=seed
    ):
        mel_parts.append(mel_c)
        n_new = mel_c.shape[-1]
        nn = draw_noise(WG, jax.random.fold_in(key, ci), 1, n_new * gpf)
        ci += 1
        if noise_parts is None:
            noise_parts = [np.asarray(z) for z in nn]
        else:
            noise_parts = [
                np.concatenate([a, np.asarray(z)], axis=1)
                for a, z in zip(noise_parts, nn)
            ]
        true_len = int(out_len[0])
    mel_full = np.concatenate(mel_parts, axis=-1)[:, :, :true_len]
    noise_full = tuple(
        jnp.asarray(z[:, : true_len * gpf]) for z in noise_parts
    )

    model = synthesizer.waveglow
    ref = model.apply(
        synthesizer.wg_variables, jnp.asarray(mel_full), None, sigma,
        noise=noise_full, method=WaveGlow.infer,
    )
    ref = np.asarray(ref)[0]
    assert streamed.shape == ref.shape == (true_len * hop,)
    np.testing.assert_allclose(streamed, ref, atol=3e-4)


def test_incremental_deterministic(synthesizer):  # noqa: F811
    a = np.concatenate(list(synthesizer.synthesize_incremental(
        "안녕하세요.", seed=9, chunk_steps=8
    )))
    b = np.concatenate(list(synthesizer.synthesize_incremental(
        "안녕하세요.", seed=9, chunk_steps=8
    )))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all() and a.size > 0


def test_mel_stream_early_gate_matches_batch(synthesizer):  # noqa: F811
    """Early-stop regime (gate biased to fire at step ~1): the stream's
    final emission must keep decoding a postnet receptive field of REAL
    context past the last stop frame — the batch path's postnet sees
    decoded frames there, not conv padding (r3 code-review finding).
    Valid frames (< out_len) must match the batch path exactly."""
    import dataclasses

    s = synthesizer
    tv = jax.tree.map(lambda x: x, s.taco_variables)
    tv["params"]["decoder"]["gate_proj"]["bias"] = (
        tv["params"]["decoder"]["gate_proj"]["bias"] + 10.0
    )
    sb = dataclasses.replace(s, taco_variables=tv)

    texts = ["안녕하세요.", "네."]
    mel_ref, len_ref = sb.text_to_mel(texts, seed=3)
    assert (np.asarray(len_ref) < sb.hp.max_decoder_steps).all()

    chunks, final_lens = [], None
    for mel_c, out_len, final in sb.text_to_mel_stream(
        texts, chunk_steps=4, seed=3
    ):
        chunks.append(mel_c)
        final_lens = out_len
    got = np.concatenate(chunks, axis=-1)
    np.testing.assert_array_equal(final_lens, np.asarray(len_ref))
    for i in range(len(texts)):
        n = int(final_lens[i])
        np.testing.assert_allclose(
            got[i, :, :n], np.asarray(mel_ref)[i, :, :n], atol=2e-5
        )


def _rebuild_stream_noise(synthesizer, texts, chunk, seed):
    """Re-derive the batch engine's exact noise stream + final mel/lengths
    by replaying the deterministic mel stream with the same key discipline."""
    from text2speech_tpu.models.chunked import draw_noise

    gpf = WG.upsample_stride // WG.n_group
    key = jax.random.PRNGKey(seed + 1)
    mel_parts, noise_parts, lens, ci = [], None, None, 0
    for mel_c, out_len, _final in synthesizer.text_to_mel_stream(
        texts, chunk_steps=chunk, seed=seed
    ):
        mel_parts.append(mel_c)
        nn = draw_noise(
            WG, jax.random.fold_in(key, ci), len(texts),
            mel_c.shape[-1] * gpf,
        )
        ci += 1
        noise_parts = (
            [np.asarray(z) for z in nn] if noise_parts is None
            else [np.concatenate([a, np.asarray(z)], axis=1)
                  for a, z in zip(noise_parts, nn)]
        )
        lens = out_len
    mel_full = np.concatenate(mel_parts, axis=-1)
    F = mel_full.shape[-1]
    return mel_full, noise_parts, np.minimum(np.asarray(lens), F)


def _assert_batch_rows_match_single_pass(synthesizer, texts, chunk, seed,
                                         sigma):
    from text2speech_tpu.models.waveglow import WaveGlow

    hop = WG.upsample_stride
    gpf = hop // WG.n_group

    per_row = {r: [] for r in range(len(texts))}
    for r, ch in synthesizer.synthesize_incremental_batch(
        texts, sigma=sigma, seed=seed, chunk_steps=chunk
    ):
        per_row[r].append(ch)

    mel_full, noise_parts, tls = _rebuild_stream_noise(
        synthesizer, texts, chunk, seed
    )
    for r in range(len(texts)):
        tl = int(tls[r])
        ref = synthesizer.waveglow.apply(
            synthesizer.wg_variables,
            jnp.asarray(mel_full[r : r + 1, :, :tl]), None, sigma,
            noise=tuple(
                jnp.asarray(z[r : r + 1, : tl * gpf]) for z in noise_parts
            ),
            method=WaveGlow.infer,
        )
        got = np.concatenate(per_row[r])
        assert got.shape == (tl * hop,), (r, got.shape, tl)
        np.testing.assert_allclose(
            got, np.asarray(ref)[0], atol=3e-4, err_msg=f"row {r}"
        )


def test_synthesize_incremental_batch_matches_single_pass(synthesizer):  # noqa: F811
    """N concurrent streams through ONE lockstep decode + batched window
    vocode calls: each row's chunk concatenation equals a single-pass
    vocode of that row's final mel with its slice of the batch noise."""
    _assert_batch_rows_match_single_pass(
        synthesizer,
        ["안녕하세요. 존경하는 사람과 함께.", "반갑습니다 여러분."],
        chunk=8, seed=5, sigma=0.8,
    )


def test_synthesize_incremental_batch_early_gate_rows_flush(synthesizer):  # noqa: F811
    """Early-stop regime: rows stop at different lengths; a finished row
    must flush as soon as its real frames clear the stream (not wait for
    the slowest row), stay garbage-free past its own stop, and still equal
    its single-pass vocode."""
    import dataclasses

    s = synthesizer
    tv = jax.tree.map(lambda x: x, s.taco_variables)
    tv["params"]["decoder"]["gate_proj"]["bias"] = (
        tv["params"]["decoder"]["gate_proj"]["bias"] + 10.0
    )
    sb = dataclasses.replace(s, taco_variables=tv)
    texts = ["안녕하세요. 존경하는 사람.", "네."]
    _, _, tls = _rebuild_stream_noise(sb, texts, 4, 3)
    assert (tls < sb.hp.max_decoder_steps).any(), "early regime not hit"
    _assert_batch_rows_match_single_pass(sb, texts, chunk=4, seed=3,
                                         sigma=0.8)


def test_incremental_vocode_engine_excludes_post_stop_garbage():
    """Engine-contract unit test (r3 code-review): once the gate has
    fired, the decode TAIL chunks (postnet context) carry post-stop
    garbage mel — the vocoder windows must neither emit those frames nor
    let them into the receptive-field context.  A toy linear vocoder with
    a known receptive field makes any leak exact: emitted audio must equal
    a single-pass toy vocode of the TRUE mel with the same noise."""
    import jax

    from text2speech_tpu.infer import incremental_vocode_stream
    from text2speech_tpu.models.chunked import (
        draw_noise,
        receptive_overlap_frames,
    )
    from tests.test_synthesizer import WG as cfg

    hop = cfg.upsample_stride
    gpf = hop // cfg.n_group
    ov = receptive_overlap_frames(cfg)
    r = min(ov, 2)                      # toy receptive field, frames
    n_mel = cfg.n_mel_channels
    cs = 4
    true_len = 18                       # gate fires mid-stream
    requested = 40
    seed = 5
    GARBAGE = 1e3

    rng = np.random.RandomState(0)
    mel_true = rng.randn(1, n_mel, requested).astype(np.float32)
    mel_full = mel_true.copy()
    mel_full[:, :, true_len:] = GARBAGE  # post-stop frames are garbage

    def toy_vocode(mel, noise, sigma):
        mel = np.asarray(mel, np.float32)
        B, M, F = mel.shape
        pad = np.pad(mel, ((0, 0), (0, 0), (r, r)))
        sm = np.stack(
            [pad[:, :, i : i + F] for i in range(2 * r + 1)], 0
        ).mean(axis=(0, 2))                                  # [B, F]
        audio = np.repeat(sm, hop, axis=-1)                  # [B, F*hop]
        n0 = np.asarray(noise[0], np.float32).mean(-1)       # [B, F*gpf]
        audio = audio + sigma * np.repeat(n0, cfg.n_group, axis=-1)
        return audio

    def mel_stream():
        # chunked_mel_stream contract: out_len freezes at the gate, final
        # arrives only after the decode tail; chunks past the stop carry
        # garbage values
        limit = requested
        total = 0
        while total < limit:
            chunk = mel_full[:, :, total : total + cs]
            total += cs
            out_len = np.asarray([min(total, true_len)], np.int64)
            final = total >= true_len + 2 * cs or total >= limit
            yield chunk, out_len, final
            if final:
                return

    got = np.concatenate(
        list(incremental_vocode_stream(
            cfg, mel_stream(), toy_vocode, 0.8, seed, cs
        )),
        axis=-1,
    )

    # reference: single-pass toy vocode of the TRUE frames with the SAME
    # per-chunk noise stream the engine draws
    key = jax.random.PRNGKey(seed + 1)
    parts = None
    ci = 0
    total = 0
    while total < true_len + 2 * cs and total < requested:
        nz = draw_noise(cfg, jax.random.fold_in(key, ci), 1, cs * gpf)
        ci += 1
        parts = (
            [np.asarray(z) for z in nz] if parts is None
            else [np.concatenate([a, np.asarray(z)], axis=1)
                  for a, z in zip(parts, nz)]
        )
        total += cs
    ref = toy_vocode(
        mel_true[:, :, :true_len],
        tuple(p[:, : true_len * gpf] for p in parts),
        0.8,
    )[0]

    assert got.shape == ref.shape, (got.shape, ref.shape)
    assert np.abs(got).max() < GARBAGE / 10  # no garbage leaked at all
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_batch_vocode_engine_staggered_gates_toy():
    """Batch-engine contract with a toy linear vocoder: three rows whose
    gates fire at different steps (one short row below a window width, one
    mid-stream, one never).  Each row's audio must equal a single-pass toy
    vocode of its TRUE frames with its slice of the batch noise stream, no
    post-stop garbage may leak, and an early-finished row must flush
    before later-finishing rows complete (no waiting on the slowest)."""
    import jax

    from text2speech_tpu.infer import incremental_vocode_stream_batch
    from text2speech_tpu.models.chunked import (
        draw_noise,
        receptive_overlap_frames,
    )
    from tests.test_synthesizer import WG as cfg

    hop = cfg.upsample_stride
    gpf = hop // cfg.n_group
    ov = receptive_overlap_frames(cfg)
    r = min(ov, 2)
    n_mel = cfg.n_mel_channels
    cs = 4
    requested = 40
    seed = 7
    GARBAGE = 1e3
    B = 3
    true_lens = [18, 7, requested]      # mid-stream / short / never fires

    rng = np.random.RandomState(1)
    mel_true = rng.randn(B, n_mel, requested).astype(np.float32)
    mel_full = mel_true.copy()
    for b, tl in enumerate(true_lens):
        mel_full[b, :, tl:] = GARBAGE

    def toy_vocode(mel, noise, sigma):
        mel = np.asarray(mel, np.float32)
        _, _, F = mel.shape
        pad = np.pad(mel, ((0, 0), (0, 0), (r, r)))
        sm = np.stack(
            [pad[:, :, i : i + F] for i in range(2 * r + 1)], 0
        ).mean(axis=(0, 2))
        audio = np.repeat(sm, hop, axis=-1)
        n0 = np.asarray(noise[0], np.float32).mean(-1)
        return audio + sigma * np.repeat(n0, cfg.n_group, axis=-1)

    def mel_stream():
        total = 0
        while total < requested:
            chunk = mel_full[:, :, total : total + cs]
            total += cs
            out_len = np.asarray(
                [min(total, tl) for tl in true_lens], np.int64
            )
            yield chunk, out_len, total >= requested

    emissions = list(incremental_vocode_stream_batch(
        cfg, mel_stream(), toy_vocode, 0.8, seed, cs
    ))
    last_idx = {
        b: max(i for i, (rr, _) in enumerate(emissions) if rr == b)
        for b in range(B)
    }
    # row 1 (short, gate at 7) flushes long before rows 0 and 2 finish
    assert last_idx[1] < last_idx[0] < last_idx[2], last_idx

    # rebuild the engine's batch noise stream
    key = jax.random.PRNGKey(seed + 1)
    parts, ci, total = None, 0, 0
    while total < requested:
        nz = draw_noise(cfg, jax.random.fold_in(key, ci), B, cs * gpf)
        ci += 1
        parts = (
            [np.asarray(z) for z in nz] if parts is None
            else [np.concatenate([a, np.asarray(z)], axis=1)
                  for a, z in zip(parts, nz)]
        )
        total += cs

    for b, tl in enumerate(true_lens):
        got = np.concatenate(
            [ch for rr, ch in emissions if rr == b], axis=-1
        )
        ref = toy_vocode(
            mel_true[b : b + 1, :, :tl],
            tuple(p[b : b + 1, : tl * gpf] for p in parts),
            0.8,
        )[0]
        assert got.shape == ref.shape, (b, got.shape, ref.shape)
        assert np.abs(got).max() < GARBAGE / 10, b
        np.testing.assert_allclose(got, ref, atol=1e-4, err_msg=f"row {b}")


@pytest.mark.parametrize("masked", [False, True])
def test_flush_band_rows_use_exact_pass(masked):
    """Regression (r3 review, execution-confirmed): a row whose true
    length lands in [cs+ov, cs+2ov) emits ONE mid-stream window and then
    flushes shorter than a full window.  The flush must run the
    exact-length pass (suffix-sliced), not a fixed-width window whose
    in-tensor zero tail corrupts the last ~ov frames — zero mel+noise are
    real frames to the flows, not conv padding.  Perturbed (trained-like)
    params; zero-init end convs would make the couplings identity and
    hide the leak.

    ``masked=True`` routes the flush through the engine's masked-length
    pass (``vocode_masked_fn``, the Synthesizer's default on the plain
    path): same audio across the whole band through ONE fixed-width
    program instead of one exact-shape compile per distinct length."""
    from text2speech_tpu.config import WaveGlowConfig
    from text2speech_tpu.infer import incremental_vocode_stream
    from text2speech_tpu.models.chunked import (draw_noise,
                                                receptive_overlap_frames)
    from text2speech_tpu.models.waveglow import WaveGlow

    WGS = WaveGlowConfig(
        n_mel_channels=8, n_flows=2, n_group=4, n_early_every=4,
        wn_n_layers=2, wn_n_channels=16, upsample_kernel=64,
        upsample_stride=16,
    )
    ov = receptive_overlap_frames(WGS)
    cs = 8
    W = cs + 2 * ov
    hop = WGS.upsample_stride
    gpf = hop // WGS.n_group

    wg = WaveGlow(WGS)
    variables = jax.jit(wg.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, WGS.n_mel_channels, 24)),
        jnp.zeros((1, 24 * WGS.upsample_stride)),
    )
    leaves, treedef = jax.tree.flatten(variables)
    kp = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    variables = jax.tree.unflatten(treedef, [
        l + 0.1 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, kp)
    ])

    def vocode_fn(mel, noise, sigma):
        return np.asarray(wg.apply(
            variables, mel, None, sigma, noise=noise,
            method=WaveGlow.infer))

    masked_prog = jax.jit(lambda v, mel, nz, sg, t: wg.apply(
        v, mel, None, sg, noise=nz, length=t, method=WaveGlow.infer))
    masked_widths: list[int] = []

    def vocode_masked_fn(mel, nz, sg, t):
        masked_widths.append(int(mel.shape[-1]))
        return masked_prog(variables, mel, nz, sg, t)

    def run(true_len, requested=24, seed=5, sigma=0.8):
        rs = np.random.RandomState(1)
        mel_true = rs.randn(1, WGS.n_mel_channels, requested).astype(
            np.float32)

        def mel_stream():
            total = 0
            while total < requested:
                chunk = mel_true[:, :, total : total + cs]
                total += cs
                yield (chunk, np.asarray([min(total, true_len)], np.int64),
                       total >= requested)

        got = np.concatenate(list(incremental_vocode_stream(
            WGS, mel_stream(), vocode_fn, sigma, seed, cs,
            vocode_masked_fn=vocode_masked_fn if masked else None,
        )), axis=-1)

        # single-pass reference with the engine's own noise stream
        key = jax.random.PRNGKey(seed + 1)
        parts, ci, total = None, 0, 0
        while total < requested:
            nz = draw_noise(WGS, jax.random.fold_in(key, ci), 1, cs * gpf)
            ci += 1
            parts = ([np.asarray(z) for z in nz] if parts is None else
                     [np.concatenate([a, np.asarray(z)], axis=1)
                      for a, z in zip(parts, nz)])
            total += cs
        ref = vocode_fn(
            jnp.asarray(mel_true[:, :, :true_len]),
            tuple(jnp.asarray(p[:, : true_len * gpf]) for p in parts),
            sigma)[0]
        assert got.shape == ref.shape, (true_len, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, atol=1e-5,
                                   err_msg=f"tl={true_len}")

    # the whole suspect band (mid-stream emission + short flush), the
    # boundary, and the window-path control
    for tl in range(cs + ov, W + 1):
        run(tl)
    run(W + 3)
    if masked:
        # every band length rode the SAME fixed-width masked program:
        # one compile instead of one per distinct short length
        assert masked_widths and set(masked_widths) == {W}, masked_widths
        from tests.conftest import assert_one_program
        assert_one_program(masked_prog, what="the masked exact-pass program")


def test_first_window_fast_path_widths_and_equality():
    """First-audio fast path: an all-first emission round vocodes at width
    cs+ov (a window pinned at the utterance start emits [0, cs) whose
    receptive field ends at cs+ov — the trailing ov frames of the fixed
    cs+2ov window are pure zero-fill compute); mid-stream rounds stay at
    cs+2ov; emitted audio is unchanged (equals a single-pass toy vocode
    of each row with its slice of the batch noise stream)."""
    import jax

    from text2speech_tpu.infer import incremental_vocode_stream_batch
    from text2speech_tpu.models.chunked import (
        draw_noise,
        receptive_overlap_frames,
    )
    from tests.test_synthesizer import WG as cfg

    hop = cfg.upsample_stride
    gpf = hop // cfg.n_group
    ov = receptive_overlap_frames(cfg)
    r = min(ov, 2)
    n_mel = cfg.n_mel_channels
    cs = 4
    requested = 40
    seed = 11
    B = 2

    rng = np.random.RandomState(2)
    mel = rng.randn(B, n_mel, requested).astype(np.float32)
    widths: list[int] = []

    def toy_vocode(m, noise, sigma):
        m = np.asarray(m, np.float32)
        widths.append(m.shape[-1])
        _, _, F = m.shape
        pad = np.pad(m, ((0, 0), (0, 0), (r, r)))
        sm = np.stack(
            [pad[:, :, i : i + F] for i in range(2 * r + 1)], 0
        ).mean(axis=(0, 2))
        audio = np.repeat(sm, hop, axis=-1)
        n0 = np.asarray(noise[0], np.float32).mean(-1)
        return audio + sigma * np.repeat(n0, cfg.n_group, axis=-1)

    def mel_stream():
        total = 0
        while total < requested:
            chunk = mel[:, :, total : total + cs]
            total += cs
            out_len = np.asarray([requested] * B, np.int64)
            yield chunk, out_len, total >= requested

    emissions = list(incremental_vocode_stream_batch(
        cfg, mel_stream(), toy_vocode, 0.8, seed, cs
    ))

    # the first vocode call is the all-first round at the shrunk width;
    # every other windowed call is full width (long rows never take the
    # exact-length pass, so {cs+ov, cs+2ov} are the only widths)
    assert widths[0] == cs + ov, widths
    assert set(widths[1:]) == {cs + 2 * ov}, widths

    key = jax.random.PRNGKey(seed + 1)
    parts, ci, total = None, 0, 0
    while total < requested:
        nz = draw_noise(cfg, jax.random.fold_in(key, ci), B, cs * gpf)
        ci += 1
        parts = (
            [np.asarray(z) for z in nz] if parts is None
            else [np.concatenate([a, np.asarray(z)], axis=1)
                  for a, z in zip(parts, nz)]
        )
        total += cs

    for b in range(B):
        got = np.concatenate(
            [ch for rr, ch in emissions if rr == b], axis=-1
        )
        ref = toy_vocode(
            mel[b : b + 1],
            tuple(p[b : b + 1] for p in parts),
            0.8,
        )[0]
        assert got.shape == ref.shape, (b, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, atol=1e-4, err_msg=f"row {b}")
