"""Training-infrastructure tests: DP sharding equivalence on the virtual
8-device mesh (SURVEY.md §4 item 4), Orbax checkpoint round-trip, the Noam
schedule vs the reference formula, ValueWindow, and the npz data feeder.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from text2speech_tpu.config import HParams
from text2speech_tpu.data.dataset import Batch
from text2speech_tpu.models.tacotron2 import Tacotron2
from text2speech_tpu.text import N_SYMBOLS
from text2speech_tpu.train.state import create_train_state, noam_schedule
from text2speech_tpu.train.tacotron import make_train_step
from text2speech_tpu.utils.run_dirs import ValueWindow

TINY = HParams(
    embedding_size=16,
    enc_conv_num_layers=1,
    enc_conv_channels=16,
    attention_rnn_dim=16,
    decoder_rnn_dim=16,
    attention_dim=8,
    attention_location_n_filters=4,
    attention_location_kernel_size=7,
    prenet_dim=8,
    n_mel_channels=8,
    postnet_embedding_dim=8,
    postnet_n_convolutions=2,
)


def _batch(B=8, T_in=12, T_out=16):
    rng = np.random.RandomState(0)
    return Batch(
        text=(rng.randint(2, 70, (B, T_in))).astype(np.int32),
        input_lengths=np.full((B,), T_in, np.int32),
        mel=rng.randn(B, TINY.n_mel_channels, T_out).astype(np.float32),
        gate=np.zeros((B, T_out), np.float32),
        speaker_id=np.zeros((B,), np.int32),
        output_lengths=np.full((B,), T_out, np.int32),
    )


@pytest.fixture(scope="module")
def model_state():
    model = Tacotron2(TINY, n_vocab=N_SYMBOLS)
    b = _batch()
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.asarray(b.text), jnp.asarray(b.input_lengths),
        jnp.asarray(b.mel), jnp.asarray(b.output_lengths),
    )
    return model, create_train_state(TINY, variables)


def test_dp_matches_single_device(model_state):
    """The same global batch must give (nearly) the same loss and updated
    params whether run on 1 device or sharded over 8 — the property the
    reference could not test without GPUs (SURVEY.md §4)."""
    model, state = model_state
    step_fn = jax.jit(make_train_step(model, TINY))
    b = _batch()
    rng = jax.random.PRNGKey(7)

    jb = Batch(*map(jnp.asarray, b))
    state1, metrics1 = step_fn(state, jb, rng)

    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("data",))
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    state_s = jax.tree.map(lambda x: jax.device_put(x, rep), state)
    batch_s = Batch(*[jax.device_put(np.asarray(x), dp) for x in b])
    state8, metrics8 = step_fn(state_s, batch_s, rng)

    assert float(metrics1["loss"]) == pytest.approx(
        float(metrics8["loss"]), rel=1e-5
    )
    diffs = jax.tree.map(
        lambda a, c: float(jnp.max(jnp.abs(a - c))), state1.params, state8.params
    )
    assert max(jax.tree.leaves(diffs)) < 1e-5


def test_decoder_remat_matches_plain(model_state):
    """decoder_remat=True (jax.checkpoint around the teacher-forced scan
    body) must change HBM use only: same loss, same gradients, same updated
    params as the plain scan for the same dropout rng."""
    model, state = model_state
    remat_model = Tacotron2(TINY, n_vocab=N_SYMBOLS, decoder_remat=True)
    b = Batch(*map(jnp.asarray, _batch()))
    rng = jax.random.PRNGKey(11)

    state1, metrics1 = jax.jit(make_train_step(model, TINY))(state, b, rng)
    state2, metrics2 = jax.jit(make_train_step(remat_model, TINY))(state, b, rng)

    assert float(metrics1["loss"]) == pytest.approx(
        float(metrics2["loss"]), rel=1e-6
    )
    diffs = jax.tree.map(
        lambda a, c: float(jnp.max(jnp.abs(a - c))), state1.params, state2.params
    )
    assert max(jax.tree.leaves(diffs)) < 1e-6


def test_tacotron_grad_accum_matches_manual(model_state):
    """grad_accum=2 must equal the hand-rolled reference: per-microbatch
    grads at the same params averaged, batch stats threaded sequentially,
    one optimizer update."""
    from text2speech_tpu.models.losses import tacotron2_loss

    model, state = model_state
    b = Batch(*map(jnp.asarray, _batch()))
    rng = jax.random.PRNGKey(3)

    state_acc, metrics_acc = jax.jit(
        make_train_step(model, TINY, grad_accum=2)
    )(state, b, rng)

    # manual two-microbatch reference (independent of the implementation)
    def loss_fn(params, bs, mb, r):
        (mel_out, mel_post, gate_out, _), mut = model.apply(
            {"params": params, "batch_stats": bs},
            mb.text, mb.input_lengths, mb.mel, mb.output_lengths,
            speaker_ids=mb.speaker_id, train=True,
            rngs={"dropout": r}, mutable=["batch_stats"],
        )
        loss, _ = tacotron2_loss(mel_out, mel_post, gate_out, mb.mel, mb.gate)
        return loss, mut["batch_stats"]

    # microbatch_split is STRIDED (microbatch i = rows i::grad_accum) so
    # DP-sharded batches keep every microbatch on every device
    halves = [jax.tree.map(lambda x: x[0::2], b),
              jax.tree.map(lambda x: x[1::2], b)]
    rngs = jax.random.split(rng, 2)
    bs = state.batch_stats
    grads = None
    for mb, r in zip(halves, rngs):
        (_, bs), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
            state.params, bs, mb, r
        )
        grads = g if grads is None else jax.tree.map(jnp.add, grads, g)
    grads = jax.tree.map(lambda g: g / 2, grads)
    state_ref = state.apply_gradients(grads, new_batch_stats=bs)

    diffs = jax.tree.map(
        lambda a, c: float(jnp.max(jnp.abs(a - c))),
        state_acc.params, state_ref.params,
    )
    assert max(jax.tree.leaves(diffs)) < 1e-6


def test_bf16_train_step_tracks_f32(model_state):
    """bf16 compute (f32 params, f32 loss accumulation) must produce a
    finite loss close to the f32 step's — the numeric sanity gate for the
    --bf16 training flag."""
    model, state = model_state
    bf16_model = Tacotron2(TINY, n_vocab=N_SYMBOLS,
                           compute_dtype=jnp.bfloat16)
    b = Batch(*map(jnp.asarray, _batch()))
    rng = jax.random.PRNGKey(5)
    _, m32 = jax.jit(make_train_step(model, TINY))(state, b, rng)
    s16, m16 = jax.jit(make_train_step(bf16_model, TINY))(state, b, rng)
    assert np.isfinite(float(m16["loss"]))
    assert float(m16["loss"]) == pytest.approx(float(m32["loss"]), rel=0.05)
    # params must stay f32 (bf16 is compute-only)
    assert all(
        l.dtype == jnp.float32 for l in jax.tree.leaves(s16.params)
    )


def test_waveglow_grad_accum_matches_full_batch():
    """For WaveGlow (no batch norm) the accumulated step is mathematically
    the full-batch step: same loss, same updated params."""
    import optax

    from text2speech_tpu.config import WaveGlowConfig
    from text2speech_tpu.data.mel2samp import VocoderBatch
    from text2speech_tpu.models.waveglow import WaveGlow
    from text2speech_tpu.train.state import TrainState
    from text2speech_tpu.train.waveglow import make_wg_train_step

    cfg = WaveGlowConfig(
        n_mel_channels=8, n_flows=2, n_group=4, n_early_every=4,
        wn_n_layers=2, wn_n_channels=16, upsample_kernel=32,
        upsample_stride=8, segment_length=512, learning_rate=1e-3,
    )
    model = WaveGlow(cfg)
    rng_np = np.random.RandomState(0)
    frames = cfg.segment_length // cfg.upsample_stride
    batch = VocoderBatch(
        mel=jnp.asarray(rng_np.randn(4, cfg.n_mel_channels, frames), jnp.float32),
        audio=jnp.asarray(0.1 * rng_np.randn(4, cfg.segment_length), jnp.float32),
    )
    variables = model.init(jax.random.PRNGKey(0), batch.mel, batch.audio)
    tx = optax.adam(cfg.learning_rate)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats={}, opt_state=tx.init(variables["params"]), tx=tx,
    )

    s1, m1 = jax.jit(make_wg_train_step(model, cfg.sigma))(state, batch)
    s2, m2 = jax.jit(make_wg_train_step(model, cfg.sigma, grad_accum=2))(
        state, batch
    )
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    diffs = jax.tree.map(
        lambda a, c: float(jnp.max(jnp.abs(a - c))), s1.params, s2.params
    )
    assert max(jax.tree.leaves(diffs)) < 1e-6


def test_checkpoint_roundtrip(model_state, tmp_path):
    from text2speech_tpu.train.checkpoint import CheckpointManager

    model, state = model_state
    step_fn = jax.jit(make_train_step(model, TINY))
    b = Batch(*map(jnp.asarray, _batch()))
    state, _ = step_fn(state, b, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, wait=True)
    assert mgr.latest_step() == 1

    model2, fresh = model_state[0], create_train_state(
        TINY,
        {"params": jax.tree.map(jnp.zeros_like, state.params),
         "batch_stats": jax.tree.map(jnp.zeros_like, state.batch_stats)},
    )
    restored, step = mgr.restore(fresh)
    assert step == 1
    same = jax.tree.map(
        lambda a, c: bool(jnp.allclose(a, c)), restored.params, state.params
    )
    assert all(jax.tree.leaves(same))
    mgr.close()


def test_checkpoint_optimizer_layout_migration(model_state, tmp_path):
    """A checkpoint whose opt_state layout no longer matches the current
    optimizer chain fails with a pointed error, and
    ``restore(params_only=True)`` recovers the weights (fresh moments) —
    the migration path for optimizer changes like the r4 coupled-L2 fix."""
    import optax
    import pytest

    from text2speech_tpu.train.checkpoint import CheckpointManager
    from text2speech_tpu.train.state import TrainState

    _, state = model_state
    # save with a DIFFERENT optimizer layout (stands in for an old format)
    old_tx = optax.sgd(1e-3)
    old_state = TrainState(
        step=jnp.asarray(7, jnp.int32), params=state.params,
        batch_stats=state.batch_stats,
        opt_state=old_tx.init(state.params), tx=old_tx,
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt_mig"))
    mgr.save(7, old_state, wait=True)

    fresh = create_train_state(
        TINY,
        {"params": jax.tree.map(jnp.zeros_like, state.params),
         "batch_stats": state.batch_stats},
    )
    with pytest.raises(ValueError, match="params_only"):
        mgr.restore(fresh)
    restored, step = mgr.restore(fresh, params_only=True)
    assert step == 7
    same = jax.tree.map(
        lambda a, c: bool(jnp.allclose(a, c)), restored.params, state.params
    )
    assert all(jax.tree.leaves(same))
    # opt_state is the fresh template's (reinitialized), not the saved one
    assert jax.tree.structure(restored.opt_state) == jax.tree.structure(
        fresh.opt_state)

    # the untemplated escape hatch must still honor the template's
    # PLACEMENT: a mesh trainer's replicated template yields replicated
    # restored leaves (else the next donated step recompiles or raises a
    # sharding mismatch on multi-device resume)
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    repl = NamedSharding(mesh, P())
    sharded_fresh = fresh.replace(
        params=jax.device_put(fresh.params, repl))
    restored2, _ = mgr.restore(sharded_fresh, params_only=True)
    leaf = jax.tree.leaves(restored2.params)[0]
    assert leaf.sharding == repl, leaf.sharding

    # and a shape mismatch is a pointed error, not a silent device_put
    bad = fresh.replace(params=jax.tree.map(
        lambda x: jnp.zeros(x.shape + (2,), x.dtype), fresh.params))
    with pytest.raises(ValueError, match="shape"):
        mgr.restore(bad, params_only=True)
    mgr.close()


def test_noam_schedule_matches_reference_formula():
    sched = noam_schedule(1e-3, 4000)
    for step in [0, 100, 3999, 4000, 10000, 100000]:
        s = step + 1.0
        want = 1e-3 * 4000 ** 0.5 * min(s * 4000 ** -1.5, s ** -0.5)
        assert float(sched(jnp.asarray(step))) == pytest.approx(want, rel=1e-5)


def test_value_window():
    w = ValueWindow(3)
    for v in [1, 2, 3, 4]:
        w.append(v)
    assert w.count == 3
    assert w.average == pytest.approx(3.0)
    w.reset()
    assert w.count == 0


def test_npz_feeder(tmp_path):
    from text2speech_tpu.data.npz_dataset import NpzDataFeeder

    d = tmp_path / "corpus"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i, frames in enumerate([10, 50, 2000]):  # last exceeds max_n_frame
        np.savez(
            d / f"u{i}.npz",
            audio=np.zeros(frames * 256, np.float32),
            mel=rng.randn(frames, 8).astype(np.float32),
            linear=rng.randn(frames, 513).astype(np.float32),
            time_steps=frames * 256,
            mel_frames=frames,
            text="안녕",
            tokens=np.asarray([13, 21, 4, 27, 62, 1], np.int32),
            loss_coeff=1,
        )
    feeder = NpzDataFeeder(
        [str(d)], TINY, batch_size=2, max_n_frame=1000,
        text_bucket=8, mel_bucket=16,
    )
    assert sum(len(c) for c in feeder.corpus_files) == 2  # long one filtered
    batch = next(iter(feeder.epoch(0)))
    assert batch.mel.shape[1] == TINY.n_mel_channels
    assert batch.mel.shape[2] % 16 == 0
    assert batch.text.shape[1] % 8 == 0
    assert (batch.gate[0, batch.output_lengths[0] - 1 :] == 1).all()


def test_waveglow_config_from_reference_json(tmp_path):
    """The reference 4-block config.json format loads directly
    (waveglow/train.py:147-157 parsing contract)."""
    import json

    from text2speech_tpu.config import WaveGlowConfig

    blocks = {
        "train_config": {
            "epochs": 100000, "learning_rate": 1e-4, "sigma": 1.0,
            "iters_per_checkpoint": 2000, "batch_size": 3, "seed": 1234,
            "output_directory": "checkpoints", "checkpoint_path": "",
        },
        "data_config": {
            "training_files": "train_files.txt", "segment_length": 16000,
            "sampling_rate": 22050, "filter_length": 1024, "hop_length": 256,
            "win_length": 1024, "mel_fmin": 0.0, "mel_fmax": 8000.0,
        },
        "dist_config": {"dist_backend": "nccl", "dist_url": "tcp://localhost:54321"},
        "waveglow_config": {
            "n_mel_channels": 80, "n_flows": 12, "n_group": 8,
            "n_early_every": 4, "n_early_size": 2,
            "WN_config": {"n_layers": 8, "n_channels": 512, "kernel_size": 3},
        },
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(blocks))
    cfg = WaveGlowConfig.from_json(str(p))
    assert cfg.n_flows == 12 and cfg.wn_n_channels == 512
    assert cfg.segment_length == 16000 and cfg.batch_size == 3
    assert cfg.n_remaining_channels == 4


def test_hparams_legacy_aliases():
    from text2speech_tpu.config import HParams

    hp = HParams.from_dict({
        "fft_size": 2048, "hop_size": 512, "win_size": 2048,
        "num_mels": 96, "sample_rate": 22050, "rescaling_max": True,
    })
    assert hp.filter_length == 2048 and hp.hop_length == 512
    assert hp.n_mel_channels == 96
    assert hp.rescaling_max == 1.0
    assert hp.n_freq == 1025


def test_dp_batch_stats_match_single_device(model_state):
    """BatchNorm batch statistics computed from a sharded global batch must
    equal the single-device statistics (mean over a sharded axis is already
    global under jit — the 'sync BN' property, docs/SCALING.md)."""
    model, state = model_state
    step_fn = jax.jit(make_train_step(model, TINY))
    b = _batch()
    rng = jax.random.PRNGKey(11)

    state1, _ = step_fn(state, Batch(*map(jnp.asarray, b)), rng)

    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("data",))
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    state_s = jax.tree.map(lambda x: jax.device_put(x, rep), state)
    batch_s = Batch(*[jax.device_put(np.asarray(x), dp) for x in b])
    state8, _ = step_fn(state_s, batch_s, rng)

    diffs = jax.tree.map(
        lambda a, c: float(jnp.max(jnp.abs(a - c))),
        state1.batch_stats, state8.batch_stats,
    )
    assert max(jax.tree.leaves(diffs)) < 1e-5


def test_profiling_utils(tmp_path):
    from text2speech_tpu.utils.profiling import StepTimer, annotate, trace_capture

    timer = StepTimer()
    x = jnp.ones((64, 64))
    with timer.step() as t:
        with annotate("matmul"):
            y = (x @ x).sum()
        t.block_on(y)      # the step's OUTPUT (exists only inside the block)
    assert timer.last_host >= 0 and timer.last_device >= timer.last_host

    with trace_capture(str(tmp_path / "prof")):
        jax.block_until_ready(x @ x)
    # a trace directory with at least one artifact should exist
    import glob
    assert glob.glob(str(tmp_path / "prof" / "**"), recursive=True)


def test_initialize_distributed_trigger_logic(monkeypatch):
    """Weak-spot regression (parallel/mesh.py): tuning kwargs alone must NOT
    force multi-host init; coordinator env vars (with or without the JAX_
    prefix) and managed-environment markers must."""
    from text2speech_tpu.parallel import mesh as pmesh

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                "SLURM_JOB_NUM_NODES"):
        monkeypatch.delenv(var, raising=False)

    assert pmesh.initialize_distributed() is False
    assert pmesh.initialize_distributed(local_device_ids=[0]) is False
    assert calls == []

    assert pmesh.initialize_distributed(
        coordinator_address="h:1234", num_processes=2, process_id=0
    ) is True
    assert calls[-1]["coordinator_address"] == "h:1234"

    monkeypatch.setenv("COORDINATOR_ADDRESS", "other:99")
    assert pmesh.initialize_distributed() is True
    assert calls[-1]["coordinator_address"] == "other:99"
    monkeypatch.delenv("COORDINATOR_ADDRESS")

    monkeypatch.setenv("SLURM_JOB_NUM_NODES", "4")
    assert pmesh.initialize_distributed() is True
    assert calls[-1]["coordinator_address"] is None  # jax auto-detects
    monkeypatch.delenv("SLURM_JOB_NUM_NODES")

    # single-host rigs export TPU_WORKER_HOSTNAMES=localhost — NOT a pod
    n = len(calls)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert pmesh.initialize_distributed() is False and len(calls) == n
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1,host2,host3")
    assert pmesh.initialize_distributed() is True and len(calls) == n + 1


def test_initialize_distributed_two_process_integration(tmp_path):
    """Two real processes join one JAX distributed runtime through
    initialize_distributed (the actual jax.distributed.initialize path,
    reference waveglow/distributed.py:43-53) and a global jit computation
    sees BOTH processes' shards — the bring-up the trigger-logic unit test
    can't prove (VERDICT r2 item #9)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    child = tmp_path / "dist_child.py"
    child.write_text(
        """
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from text2speech_tpu.parallel.mesh import initialize_distributed

pid = int(sys.argv[1])
ok = initialize_distributed(
    coordinator_address="127.0.0.1:%d", num_processes=2, process_id=pid
)
assert ok, "initialize_distributed returned False with explicit coordinator"
assert jax.process_count() == 2, jax.process_count()
devs = jax.devices()
assert len(devs) == 2, devs

mesh = Mesh(np.asarray(devs), ("data",))
local = np.full((1, 4), float(pid + 1), np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (2, 4)
)
total = jax.jit(
    lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
)(arr)
# 4*1 (proc 0) + 4*2 (proc 1): the reduction crossed processes
print("DIST_RESULT", float(total), flush=True)
assert float(total) == 12.0
""" % port,
        encoding="utf-8",
    )

    import os as _os

    env = dict(_os.environ)
    env["PYTHONPATH"] = (
        "/root/repo" + _os.pathsep + env.get("PYTHONPATH", "")
    )
    # stray coordinator/device-count vars must not leak into the children
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(child), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
        assert "DIST_RESULT 12.0" in out, (out, err[-1500:])
