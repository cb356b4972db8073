"""utils/quality.py — the corpus drill's ``--assert_quality`` metrics
(the quantitative form of the reference's alignment-plot eyeball,
``train.py:236-246``).  Calibration facts the gate's default thresholds
rely on: a perfect diagonal scores (mass 1, corr 1), diffuse attention
scores (≈(2*band+1)/tokens, ≈0), and on a constant frames-per-token corpus
the generic linear map reduces exactly to ``t // frames_per_token``
(``tests/test_alignment.py``'s calibrated ground truth)."""

import numpy as np

from text2speech_tpu.utils.quality import (
    alignment_diagonality,
    mel_fidelity,
)


def test_diagonality_perfect_and_uniform():
    B, T, K = 2, 24, 12          # 2 frames/token
    in_len = np.full(B, K, np.int32)
    out_len = np.full(B, T, np.int32)

    diag = np.zeros((B, T, K), np.float32)
    for t in range(T):
        diag[:, t, t * K // T] = 1.0
    mass, corr = alignment_diagonality(diag, in_len, out_len)
    assert mass == 1.0 and corr > 0.99

    uni = np.full((B, T, K), 1.0 / K, np.float32)
    mass_u, corr_u = alignment_diagonality(uni, in_len, out_len)
    # chance level: (2*band+1)/K, slightly less where the +-1 band clips
    # at the token-axis edges
    assert 2.0 / K < mass_u <= 3.0 / K + 1e-6, mass_u
    assert abs(corr_u) < 1e-6                 # constant expected position


def test_diagonality_reduces_to_frames_per_token_ground_truth():
    """With out_len = in_len * FPT the linear map floor(t*K/T) == t // FPT,
    so the generic metric scores the synthetic tone corpus identically to
    the calibrated per-token ground truth."""
    rng = np.random.RandomState(0)
    FPT, K = 2, 10
    T = FPT * K
    a = rng.rand(1, T, K).astype(np.float32) ** 4    # peaky random
    a /= a.sum(-1, keepdims=True)
    mass, _ = alignment_diagonality(
        a, np.array([K], np.int32), np.array([T], np.int32))
    # re-derive with the explicit t // FPT ground truth
    t = np.arange(T)
    j = np.arange(K)[None, :]
    band = np.abs(j - (t // FPT)[:, None]) <= 1
    expect = float((a[0] * band).sum(-1).mean())
    assert abs(mass - expect) < 1e-6


def test_diagonality_band_widens():
    """band=K covers every token -> mass 1 regardless of the map."""
    rng = np.random.RandomState(1)
    a = rng.rand(1, 8, 5).astype(np.float32)
    a /= a.sum(-1, keepdims=True)
    mass, _ = alignment_diagonality(
        a, np.array([5], np.int32), np.array([8], np.int32), band=5)
    assert abs(mass - 1.0) < 1e-6


def test_mel_fidelity_identity_and_noise():
    rng = np.random.RandomState(2)
    B, C, T = 2, 8, 30
    mel = rng.randn(B, C, T).astype(np.float32)
    lengths = np.array([T, T - 5], np.int32)

    corr, match = mel_fidelity(mel, mel, lengths)
    assert corr > 0.999 and match == 1.0

    other = rng.randn(B, C, T).astype(np.float32)
    corr_n, match_n = mel_fidelity(other, mel, lengths)
    assert abs(corr_n) < 0.2
    assert match_n < 0.7       # chance-ish for +-1 of argmax over 8 channels

    # affine rescaling of either side changes nothing (standardized)
    corr_a, match_a = mel_fidelity(3.5 * mel - 2.0, mel, lengths)
    assert corr_a > 0.999 and match_a == 1.0
