"""Long-utterance chunked synthesis (docs/SCALING.md §Long-utterance):
frame-axis windowed WaveGlow inference must reproduce single-pass
``WaveGlow.infer`` when fed the same full-utterance noise — exactly at the
utterance boundaries (identical conv zero-padding) and to float tolerance on
the interior once the overlap exceeds the dilated stacks' receptive field.
Scales ``/root/reference/waveglow/glow.py:251-292`` which has no long-form
path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text2speech_tpu.config import WaveGlowConfig
from text2speech_tpu.models.chunked import draw_noise, infer_long, noise_schedule
from text2speech_tpu.models.waveglow import WaveGlow

# Receptive-field accounting for the overlap choice: each WN stack
# (3 layers, k=3, dilations 1/2/4) reaches 2*(1+2+4) = 14 grouped steps per
# side; 6 stacked flows contaminate <= 84 grouped steps in from a chunk edge,
# plus 3 frames of upsampler support.  gpf = stride/n_group = 2 groups/frame,
# so overlap_frames=64 (128 grouped steps) clears it with margin.
CFG = WaveGlowConfig(
    n_mel_channels=16,
    n_flows=6,
    n_group=8,
    n_early_every=2,
    n_early_size=2,
    wn_n_layers=3,
    wn_n_channels=32,
    wn_kernel_size=3,
    upsample_kernel=64,
    upsample_stride=16,
    segment_length=1024,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = WaveGlow(CFG)
    spect = jnp.zeros((1, CFG.n_mel_channels, 20))
    audio = jnp.zeros((1, 20 * CFG.upsample_stride))
    variables = model.init(jax.random.PRNGKey(0), spect, audio)
    # perturb ALL params (esp. the zero-init end convs): with wn_out == 0
    # the equivalence assertions here are blind to the entire WN/cond/
    # window logic they exist to verify (r3 code-review finding)
    rng = np.random.RandomState(1)
    variables = {"params": jax.tree.map(
        lambda x: x + 0.01 * rng.randn(*x.shape).astype(np.float32),
        variables["params"],
    )}
    return model, variables


def test_noise_schedule():
    # 6 flows, early at k=2,4 -> initial(4ch) + two 2ch injections
    assert noise_schedule(CFG) == [4, 2, 2]
    assert noise_schedule(WaveGlowConfig()) == [4, 2, 2]


def test_chunked_matches_single_pass(model_and_vars):
    model, variables = model_and_vars
    frames = 200
    rng = np.random.RandomState(0)
    spect = jnp.asarray(
        rng.randn(2, CFG.n_mel_channels, frames).astype(np.float32)
    )
    gpf = CFG.upsample_stride // CFG.n_group
    noise = draw_noise(CFG, jax.random.PRNGKey(7), 2, frames * gpf)

    ref = model.apply(
        variables, spect, None, 0.9, noise=noise, method=WaveGlow.infer
    )
    out = infer_long(
        model, variables, spect, None, sigma=0.9,
        chunk_frames=32, overlap_frames=64, noise=noise,
    )
    assert out.shape == ref.shape == (2, frames * CFG.upsample_stride)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=0
    )
    # boundary windows are pinned to the utterance edges: bitwise-equal math
    hop = CFG.upsample_stride
    np.testing.assert_allclose(
        np.asarray(out[:, : 8 * hop]), np.asarray(ref[:, : 8 * hop]),
        atol=1e-6, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(out[:, -8 * hop :]), np.asarray(ref[:, -8 * hop :]),
        atol=1e-6, rtol=0,
    )


def test_short_utterance_falls_back_to_single_pass(model_and_vars):
    model, variables = model_and_vars
    frames = 40  # < chunk + 2*overlap
    rng = np.random.RandomState(1)
    spect = jnp.asarray(
        rng.randn(1, CFG.n_mel_channels, frames).astype(np.float32)
    )
    gpf = CFG.upsample_stride // CFG.n_group
    noise = draw_noise(CFG, jax.random.PRNGKey(3), 1, frames * gpf)
    ref = model.apply(
        variables, spect, None, 1.0, noise=noise, method=WaveGlow.infer
    )
    out = infer_long(
        model, variables, spect, None,
        chunk_frames=32, overlap_frames=16, noise=noise,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_chunked_deterministic_from_key(model_and_vars):
    model, variables = model_and_vars
    frames = 200
    rng = np.random.RandomState(2)
    spect = jnp.asarray(
        rng.randn(1, CFG.n_mel_channels, frames).astype(np.float32)
    )
    a = infer_long(
        model, variables, spect, jax.random.PRNGKey(5),
        chunk_frames=64, overlap_frames=32,
    )
    b = infer_long(
        model, variables, spect, jax.random.PRNGKey(5),
        chunk_frames=64, overlap_frames=32,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_fused_matches_fused_single_pass(model_and_vars, monkeypatch):
    """Chunked long-form synthesis through the fused-Pallas serving path
    (interpret mode on CPU) equals single-pass infer_fused with the same
    full-utterance noise — the production long-form configuration.  The
    fused vocoder is pinned to fp32 on both sides so the comparison is
    numerical, not bf16-fuzzy."""
    import functools

    from text2speech_tpu.models import waveglow_fused as wf

    model, variables = model_and_vars
    frames = 200
    rng = np.random.RandomState(3)
    spect = jnp.asarray(
        rng.randn(1, CFG.n_mel_channels, frames).astype(np.float32)
    )
    gpf = CFG.upsample_stride // CFG.n_group
    noise = draw_noise(CFG, jax.random.PRNGKey(11), 1, frames * gpf)

    ref = wf.infer_fused(
        variables["params"], CFG, spect, None, 0.9,
        compute_dtype=jnp.float32, noise=noise,
    )
    # infer_long's fused branch resolves wf.infer_fused at call time, so the
    # fp32 pin applies to every window call
    monkeypatch.setattr(
        wf, "infer_fused",
        functools.partial(wf.infer_fused, compute_dtype=jnp.float32),
    )
    out = infer_long(
        model, variables, spect, None, sigma=0.9,
        chunk_frames=48, overlap_frames=40, noise=noise, fused=True,
    )
    assert out.shape == ref.shape == (1, frames * CFG.upsample_stride)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-4, rtol=0
    )


def test_chunked_int8_matches_int8_single_pass(model_and_vars):
    """Chunked long-form synthesis through the int8 kernel path equals
    single-pass infer_fused_int8 with the same full-utterance noise: the
    per-row requantization at each layer store depends only on that row's
    receptive field, so the interior-equivalence argument carries over
    unchanged from the fused path."""
    from text2speech_tpu.models import waveglow_fused as wf

    model, variables = model_and_vars
    frames = 200
    rng = np.random.RandomState(3)
    spect = jnp.asarray(
        rng.randn(1, CFG.n_mel_channels, frames).astype(np.float32)
    )
    gpf = CFG.upsample_stride // CFG.n_group
    noise = draw_noise(CFG, jax.random.PRNGKey(11), 1, frames * gpf)
    qparams = wf.quantize_waveglow_int8(variables["params"], CFG)

    ref = wf.infer_fused_int8(qparams, CFG, spect, None, 0.9, noise=noise)
    out = infer_long(
        model, variables, spect, None, sigma=0.9,
        chunk_frames=48, overlap_frames=40, noise=noise,
        int8_params=qparams,
    )
    assert out.shape == ref.shape == (1, frames * CFG.upsample_stride)
    # bf16 coupling arithmetic differs per window at the edges; interiors
    # carry the same quantized values, so agreement is bf16-level
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=0.02, rtol=0
    )


def test_chunked_mesh_composes_with_fused_and_int8(model_and_vars):
    """The sequence-parallel window sharding composes with the Pallas
    serving paths: under ``mesh=...`` the fused/int8 windows run per-device
    inside shard_map (each device's kernels see an ordinary unsharded
    row-slice), and the result equals the unsharded chunked output of the
    same path.  Row-independent math makes this exact up to dtype noise."""
    from jax.sharding import Mesh

    from text2speech_tpu.models import waveglow_fused as wf

    model, variables = model_and_vars
    frames = 200
    rng = np.random.RandomState(3)
    spect = jnp.asarray(
        rng.randn(1, CFG.n_mel_channels, frames).astype(np.float32)
    )
    gpf = CFG.upsample_stride // CFG.n_group
    noise = draw_noise(CFG, jax.random.PRNGKey(11), 1, frames * gpf)
    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("data",))

    # fused x mesh (n_windows = ceil(200/48) = 5, pads to 8)
    kw = dict(
        sigma=0.9, chunk_frames=48, overlap_frames=40, noise=noise,
    )
    ref = infer_long(model, variables, spect, None, fused=True, **kw)
    out = infer_long(
        model, variables, spect, None, fused=True, mesh=mesh, **kw
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=0
    )

    # int8 x mesh: identical quantized window math per row -> tight
    qparams = wf.quantize_waveglow_int8(variables["params"], CFG)
    ref8 = infer_long(
        model, variables, spect, None, int8_params=qparams, **kw
    )
    out8 = infer_long(
        model, variables, spect, None, int8_params=qparams, mesh=mesh, **kw
    )
    assert out8.shape == ref8.shape
    np.testing.assert_allclose(
        np.asarray(out8), np.asarray(ref8), atol=1e-5, rtol=0
    )


def test_default_overlap_covers_receptive_field():
    """ADVICE r2: the default overlap must cover the flow stack's one-sided
    receptive field at ANY config size, so default-argument chunking keeps
    the interior-equivalence guarantee."""
    from text2speech_tpu.models.chunked import receptive_overlap_frames

    # test config: 6 flows x (k//2)*(2^3-1) = 7 grouped steps, gpf=2
    # -> ceil(42/2) = 21 frames, + upsample reach r-1 = 3 -> 24
    assert receptive_overlap_frames(CFG) == 24
    # reference config: 12 flows x 255 grouped steps, gpf = 256/8 = 32
    # -> ceil(3060/32) = 96 + 3 upsample frames = 99 (old fixed default: 16)
    ref_cfg = WaveGlowConfig()
    assert receptive_overlap_frames(ref_cfg) == 99


def test_default_overlap_matches_single_pass(model_and_vars):
    """infer_long with DEFAULT overlap equals single-pass inference — the
    guarantee the docstring makes for default arguments."""
    model, variables = model_and_vars
    frames = 150
    rng = np.random.RandomState(4)
    spect = jnp.asarray(
        rng.randn(1, CFG.n_mel_channels, frames).astype(np.float32)
    )
    gpf = CFG.upsample_stride // CFG.n_group
    noise = draw_noise(CFG, jax.random.PRNGKey(13), 1, frames * gpf)
    ref = model.apply(
        variables, spect, None, 0.9, noise=noise, method=WaveGlow.infer
    )
    out = infer_long(
        model, variables, spect, None, sigma=0.9,
        chunk_frames=32, noise=noise,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=0
    )


def test_chunked_windows_shard_over_mesh(model_and_vars):
    """Sequence parallelism for free (SURVEY.md §5 / docs/SCALING.md): the
    stacked window batch shards over a mesh's data axis — frame-axis
    parallelism across devices for one long utterance, including a window
    count the axis size doesn't divide (padded with a duplicate last
    window, discarded after).  Must equal the unsharded chunked result."""
    from jax.sharding import Mesh

    model, variables = model_and_vars
    frames = 200
    rng = np.random.RandomState(3)
    spect = jnp.asarray(
        rng.randn(1, CFG.n_mel_channels, frames).astype(np.float32)
    )
    gpf = CFG.upsample_stride // CFG.n_group
    noise = draw_noise(CFG, jax.random.PRNGKey(9), 1, frames * gpf)

    ref = infer_long(
        model, variables, spect, None, sigma=0.9,
        chunk_frames=32, overlap_frames=64, noise=noise,
    )
    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("data",))
    # n_windows = ceil(200/32) = 7, not divisible by 8 -> pad path
    out = infer_long(
        model, variables, spect, None, sigma=0.9,
        chunk_frames=32, overlap_frames=64, noise=noise, mesh=mesh,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=0
    )
