"""Parity oracle: run the REFERENCE'S OWN torch modules and assert the JAX
models reproduce their outputs from the converted ``state_dict()``.

This closes the loop that hand-built state dicts (tests/test_convert.py)
cannot: the reference's actual classes — ``tacotron/tacotron.py:14-89``
(Tacotron) and ``waveglow/glow.py:178-292`` (WaveGlow) — are imported and
executed on CPU, their real ``state_dict()`` is pushed through
:mod:`text2speech_tpu.convert`, and forward/inference outputs are compared
numerically.

Mechanics-only patches applied to run the 2019-era reference on modern
CPU torch (none change model semantics):

* ``utils.data_utils`` is stubbed (the model only needs ``to_gpu``; the real
  module imports librosa and the jamo/nltk text chain, absent here);
* ``get_mask_from_lengths`` (``tacotron/modules.py:280-284``) allocates with
  ``torch.cuda.LongTensor`` and returns a byte mask that modern
  ``masked_fill_`` rejects — replaced with the equivalent bool/CPU version;
* ``torch.cuda.FloatTensor`` in ``glow.py:infer`` (``:262-268``) is replaced
  by a recording CPU constructor, so the exact noise draws can be re-injected
  into the JAX ``infer``;
* dropout is made deterministic on BOTH sides (keep every unit, inverted
  scaling): torch ``F.dropout`` -> ``x/(1-p)`` when training, and
  ``jax.random.bernoulli`` -> all-True (the prenet keeps dropout on in eval
  by design, ``tacotron/modules.py:21``).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from text2speech_tpu.config import HParams, WaveGlowConfig
from text2speech_tpu.convert import tacotron_from_torch, waveglow_from_torch
from text2speech_tpu.models.tacotron2 import Tacotron2
from text2speech_tpu.models.waveglow import WaveGlow, fold_weightnorm

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

# Small-but-structurally-complete dims (every reference component active).
SMALL = dict(
    embedding_size=32,
    enc_conv_num_layers=2,
    enc_conv_kernel_size=5,
    enc_conv_channels=32,
    attention_rnn_dim=24,
    decoder_rnn_dim=20,
    attention_dim=16,
    attention_location_n_filters=4,
    attention_location_kernel_size=11,
    prenet_dim=16,
    postnet_embedding_dim=24,
    postnet_kernel_size=5,
    postnet_n_convolutions=3,
    n_mel_channels=10,
    n_frames_per_step=1,
    max_decoder_steps=40,
    gate_threshold=0.5,
    p_attention_dropout=0.1,
    p_decoder_dropout=0.1,
    mask_padding=True,
)


# --------------------------------------------------------------------------
# reference imports
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_tacotron():
    """Import the reference tacotron package (returns (module, hparams dict))."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "utils.data_utils" not in sys.modules:
        utils_pkg = types.ModuleType("utils")
        utils_pkg.__path__ = []
        du = types.ModuleType("utils.data_utils")
        du.to_gpu = lambda x: x
        utils_pkg.data_utils = du
        sys.modules["utils"] = utils_pkg
        sys.modules["utils.data_utils"] = du
    import hparams as ref_hparams   # /root/reference/hparams.py (plain dict)
    import tacotron.tacotron as rt  # /root/reference/tacotron/tacotron.py

    # bool/CPU version of tacotron/modules.py:280-284 (same semantics)
    rt.get_mask_from_lengths = lambda lengths: (
        torch.arange(int(lengths.max()))[None, :] < lengths[:, None]
    )
    ref_hparams.hparams.update(SMALL)
    return rt, ref_hparams.hparams


@pytest.fixture(scope="module")
def ref_glow():
    spec = importlib.util.spec_from_file_location(
        "ref_glow", os.path.join(REF, "waveglow", "glow.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _deterministic_dropout(monkeypatch):
    """Keep-every-unit dropout with inverted scaling, both frameworks."""
    monkeypatch.setattr(
        torch.nn.functional, "dropout",
        lambda input, p=0.5, training=False, inplace=False: (
            input / (1.0 - p) if (training and p > 0) else input
        ),
    )
    monkeypatch.setattr(
        jax.random, "bernoulli",
        lambda key, p=0.5, shape=None: jnp.ones(shape, bool),
    )


def _build_ref_tacotron(rt, hp_dict):
    torch.manual_seed(0)
    tmodel = rt.Tacotron(hp_dict, n_vocab=80).eval()
    # randomize BN running stats so eval-mode BN is a nontrivial map
    sd = tmodel.state_dict()
    g = torch.Generator().manual_seed(42)
    for k in list(sd):
        if k.endswith("running_mean"):
            sd[k] = torch.randn(sd[k].shape, generator=g) * 0.1
        elif k.endswith("running_var"):
            sd[k] = torch.rand(sd[k].shape, generator=g) + 0.5
    tmodel.load_state_dict(sd)
    return tmodel


def _jax_tacotron():
    hp = HParams(**SMALL)
    return Tacotron2(hp, n_vocab=80), hp


def _taco_inputs():
    rng = np.random.RandomState(1)
    B, T_in, T_out = 2, 11, 13
    text = rng.randint(3, 78, size=(B, T_in)).astype(np.int64)
    text[1, 8:] = 0                      # pad region of the short row
    lengths = np.array([11, 8], np.int64)  # descending (pack_padded_sequence)
    mels = rng.randn(B, SMALL["n_mel_channels"], T_out).astype(np.float32)
    out_lengths = np.array([13, 9], np.int64)
    return text, lengths, mels, out_lengths


# --------------------------------------------------------------------------
# Tacotron
# --------------------------------------------------------------------------

def test_tacotron_teacher_forced_parity(ref_tacotron, monkeypatch):
    """Full teacher-forced forward (``tacotron.py:36-49`` incl. parse_output
    masking) through the reference's own modules == ours, same weights."""
    rt, hp_dict = ref_tacotron
    _deterministic_dropout(monkeypatch)
    tmodel = _build_ref_tacotron(rt, hp_dict)
    text, lengths, mels, out_lengths = _taco_inputs()

    with torch.no_grad():
        mel_t, post_t, gate_t, align_t = tmodel((
            torch.from_numpy(text), torch.from_numpy(lengths),
            torch.from_numpy(mels), text.shape[1],
            torch.zeros(2, dtype=torch.long), torch.from_numpy(out_lengths),
        ))

    model, hp = _jax_tacotron()
    params, stats = tacotron_from_torch(tmodel.state_dict(), hp)
    mel_j, post_j, gate_j, align_j = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(text, jnp.int32), jnp.asarray(lengths, jnp.int32),
        jnp.asarray(mels), jnp.asarray(out_lengths, jnp.int32),
        train=False, rngs={"dropout": jax.random.PRNGKey(0)},
    )

    np.testing.assert_allclose(np.asarray(mel_j), mel_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(post_j), post_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gate_j), gate_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(align_j), align_t.numpy(), atol=1e-4)


def test_tacotron_encoder_parity(ref_tacotron, monkeypatch):
    """Encoder (``tacotron.py:167-209``) module-wise, inside valid lengths."""
    rt, hp_dict = ref_tacotron
    _deterministic_dropout(monkeypatch)
    tmodel = _build_ref_tacotron(rt, hp_dict)
    text, lengths, _, _ = _taco_inputs()

    with torch.no_grad():
        embedded = tmodel.embedding(torch.from_numpy(text)).transpose(1, 2)
        enc_t = tmodel.encoder(embedded, torch.from_numpy(lengths)).numpy()

    model, hp = _jax_tacotron()
    params, stats = tacotron_from_torch(tmodel.state_dict(), hp)
    enc_j = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(text, jnp.int32), jnp.asarray(lengths, jnp.int32),
        method=lambda m, t, l: m.encoder(m.embed(t), l, train=False),
    )
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(enc_j)[b, :L], enc_t[b, :L], atol=1e-4
        )


def test_tacotron_postnet_parity(ref_tacotron, monkeypatch):
    """Postnet (``tacotron/modules.py:94-137``) module-wise."""
    rt, hp_dict = ref_tacotron
    _deterministic_dropout(monkeypatch)
    tmodel = _build_ref_tacotron(rt, hp_dict)
    x = np.random.RandomState(2).randn(2, SMALL["n_mel_channels"], 9).astype(
        np.float32
    )
    with torch.no_grad():
        post_t = tmodel.postnet(torch.from_numpy(x)).numpy()

    model, hp = _jax_tacotron()
    params, stats = tacotron_from_torch(tmodel.state_dict(), hp)
    post_j = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x),
        method=lambda m, v: m.postnet(v, train=False),
    )
    np.testing.assert_allclose(np.asarray(post_j), post_t, atol=1e-4)


def test_tacotron_autoregressive_parity(ref_tacotron, monkeypatch):
    """Autoregressive inference (``tacotron.py:51-65`` + decoder ``:431-466``):
    same stop decision, same frames, with deterministic dropout."""
    rt, hp_dict = ref_tacotron
    _deterministic_dropout(monkeypatch)
    tmodel = _build_ref_tacotron(rt, hp_dict)
    text, _, _, _ = _taco_inputs()
    text1 = text[:1]

    with torch.no_grad():
        mel_t, post_t, gate_t, align_t = tmodel.inference(
            torch.from_numpy(text1), None
        )
    T_ref = mel_t.shape[2]

    model, hp = _jax_tacotron()
    params, stats = tacotron_from_torch(tmodel.state_dict(), hp)
    mel_j, post_j, gate_j, align_j, out_len = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(text1, jnp.int32),
        rngs={"dropout": jax.random.PRNGKey(0)},
        method=Tacotron2.inference,
    )
    assert int(out_len[0]) == T_ref  # identical stop decision
    np.testing.assert_allclose(
        np.asarray(mel_j)[..., :T_ref], mel_t.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(post_j)[..., :T_ref], post_t.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(align_j)[:, :T_ref], align_t.numpy(), atol=1e-4
    )


# --------------------------------------------------------------------------
# WaveGlow
# --------------------------------------------------------------------------

WG_SMALL = dict(
    n_mel_channels=6, n_flows=6, n_group=8, n_early_every=2, n_early_size=2,
)
WG_WN = dict(n_layers=2, n_channels=16, kernel_size=3)


def _build_ref_waveglow(glow):
    torch.manual_seed(0)
    twg = glow.WaveGlow(WN_config=dict(WG_WN), **WG_SMALL)
    g = torch.Generator().manual_seed(3)
    for wn in twg.WN:
        # reference zero-inits the end conv (glow.py:127-131); randomize so
        # the coupling (and its logdet term) is nontrivial
        wn.end.weight.data = torch.randn(wn.end.weight.shape, generator=g) * 0.1
        wn.end.bias.data = torch.randn(wn.end.bias.shape, generator=g) * 0.1
    for ci in twg.convinv:
        # perturb off orthonormal so log|det W| != 0
        ci.conv.weight.data += torch.randn(ci.conv.weight.shape, generator=g) * 0.05
    return twg


def _jax_wg_cfg():
    return WaveGlowConfig(
        wn_n_layers=WG_WN["n_layers"], wn_n_channels=WG_WN["n_channels"],
        wn_kernel_size=WG_WN["kernel_size"],
        upsample_kernel=1024, upsample_stride=256,  # glow.py:262 hardcodes these
        **WG_SMALL,
    )


def test_waveglow_forward_parity(ref_glow):
    """Training forward (``glow.py:207-249``): z, sum(log_s), sum(log_det_W)."""
    twg = _build_ref_waveglow(ref_glow)
    torch.manual_seed(1)
    mel = torch.randn(2, WG_SMALL["n_mel_channels"], 6)
    audio = torch.randn(2, 2048)
    with torch.no_grad():
        z_t, log_s_list, logdet_list = twg((mel, audio))
    log_s_t = float(sum(s.sum() for s in log_s_list))
    logdet_t = float(sum(logdet_list))

    cfg = _jax_wg_cfg()
    params = waveglow_from_torch(twg.state_dict(), cfg)
    model = WaveGlow(cfg)
    z_j, log_s_j, logdet_j = model.apply(
        {"params": params}, jnp.asarray(mel.numpy()), jnp.asarray(audio.numpy())
    )
    np.testing.assert_allclose(
        np.asarray(z_j).transpose(0, 2, 1), z_t.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(float(log_s_j), log_s_t, rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(float(logdet_j), logdet_t, rtol=1e-5, atol=1e-2)


def test_waveglow_infer_parity(ref_glow, monkeypatch):
    """Inference (``glow.py:251-292``) after remove_weightnorm, with the
    reference's exact noise draws re-injected into the JAX ``infer``."""
    glow = ref_glow
    twg = _build_ref_waveglow(glow)
    twg = glow.WaveGlow.remove_weightnorm(twg).eval()

    made = []

    def recording_cpu_tensor(*shape):
        t = torch.FloatTensor(*shape)
        made.append(t)
        return t

    monkeypatch.setattr(
        torch.cuda, "FloatTensor", recording_cpu_tensor, raising=False
    )
    torch.manual_seed(7)
    mel = torch.randn(2, WG_SMALL["n_mel_channels"], 6)
    with torch.no_grad():
        audio_t = twg.infer(mel, sigma=0.9)

    cfg = _jax_wg_cfg()
    params = waveglow_from_torch(twg.state_dict(), cfg)
    noise = tuple(np.asarray(t.numpy()).transpose(0, 2, 1) for t in made)
    audio_j = WaveGlow(cfg).apply(
        {"params": params}, jnp.asarray(mel.numpy()), None,
        sigma=0.9, noise=noise, method=WaveGlow.infer,
    )
    np.testing.assert_allclose(
        np.asarray(audio_j), audio_t.numpy(), atol=2e-4
    )


def test_waveglow_infer_fused_parity_sigma0(ref_glow, monkeypatch):
    """The fused Pallas serving path (models/waveglow_fused.py) against the
    reference's own ``infer`` at sigma=0 (noise-free => deterministic)."""
    from text2speech_tpu.models.waveglow_fused import infer_fused

    glow = ref_glow
    twg = _build_ref_waveglow(glow)
    twg = glow.WaveGlow.remove_weightnorm(twg).eval()
    monkeypatch.setattr(
        torch.cuda, "FloatTensor",
        lambda *shape: torch.FloatTensor(*shape), raising=False,
    )
    torch.manual_seed(9)
    mel = torch.randn(1, WG_SMALL["n_mel_channels"], 6)
    with torch.no_grad():
        audio_t = twg.infer(mel, sigma=0.0).numpy()

    cfg = _jax_wg_cfg()
    params = fold_weightnorm(
        jax.tree.map(jnp.asarray, waveglow_from_torch(twg.state_dict(), cfg))
    )
    audio_f = infer_fused(
        params, cfg, jnp.asarray(mel.numpy()), jax.random.PRNGKey(0),
        sigma=0.0, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(audio_f), audio_t, atol=1e-3)


def test_convert_checkpoint_cli_tacotron(ref_tacotron, tmp_path):
    """The reference's Tacotron checkpoint format ({'iteration','state_dict',
    'optimizer','learning_rate'}, train.py:69-75) built from the reference's
    OWN model converts through the convert_checkpoint.py CLI into a loadable
    Orbax checkpoint."""
    from tests.test_cli import run_cli

    rt, hp_dict = ref_tacotron
    tmodel = _build_ref_tacotron(rt, hp_dict)
    pt = tmp_path / "checkpoint_7000"
    torch.save(
        {"iteration": 7000, "state_dict": tmodel.state_dict(),
         "optimizer": {}, "learning_rate": 1e-3},
        str(pt),
    )
    hp = HParams(**SMALL)
    hp_path = tmp_path / "hp.json"
    hp.save(str(hp_path))

    out = tmp_path / "converted"
    r = run_cli(
        "convert_checkpoint.py",
        ["--kind", "tacotron", "--torch_ckpt", str(pt),
         "--out_dir", str(out), "--hparams", str(hp_path)],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "converted" in r.stdout

    # restore through the framework's own manager: params load and run
    from text2speech_tpu.train.checkpoint import CheckpointManager
    from text2speech_tpu.train.state import create_train_state

    model = Tacotron2(hp, n_vocab=80)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.zeros((1, hp.n_mel_channels, 8)), jnp.asarray([8]),
    )
    state = create_train_state(hp, variables)
    state, step = CheckpointManager(str(out)).restore(state)
    assert step == 0  # CLI saves at step 0 (fresh fine-tune start)
    ref_emb = tmodel.embedding.weight.detach().numpy()
    got_emb = np.asarray(jax.tree.leaves(
        {k: v for k, v in state.params.items() if "embed" in k.lower()}
    )[0])
    np.testing.assert_allclose(got_emb, ref_emb, atol=1e-6)
