"""WaveGlow training loop (rebuild of ``/root/reference/waveglow/train.py:62-135``
plus all of ``waveglow/distributed.py``).

The reference's data parallelism — per-GPU process launcher, NCCL process
group, rank-0 param broadcast, bucketed backward-hook all-reduce
(``distributed.py:43-142``) — is replaced wholesale by a sharded jit: batch
over the ``'data'`` mesh axis, params replicated, gradient psum inserted by
XLA over ICI.  Loss "reduction for logging" (``train.py:119-122``) is just the
scalar the jitted step returns.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import WaveGlowConfig
from ..data.mel2samp import Mel2Samp, VocoderBatch, files_to_list
from ..data.prefetch import prefetch
from ..models.losses import waveglow_loss
from ..models.waveglow import WaveGlow
from ..parallel.mesh import make_data_mesh, replicate, shard_batch
from ..utils import infolog
from ..utils.logger import MetricsLogger
from .checkpoint import CheckpointManager
from .state import TrainState, check_grad_accum_mesh, microbatch_split

log = infolog.log


def make_wg_train_step(model: WaveGlow, sigma: float, grad_accum: int = 1):
    """One optimizer step.  ``grad_accum > 1`` splits the incoming batch into
    that many microbatches and accumulates their gradients under a
    ``lax.scan`` — activation memory is one microbatch's, and because the
    loss is a per-element mean over equal-sized microbatches the averaged
    gradients are mathematically identical to the full-batch step (pinned by
    ``tests/test_train_infra.py``).  Composes with ``remat=True`` to grow
    the effective batch arbitrarily past the HBM ceiling."""

    def loss_fn(params, mel, audio):
        z, log_s, log_det = model.apply({"params": params}, mel, audio)
        return waveglow_loss(z.transpose(0, 2, 1), log_s, log_det, sigma)

    def train_step(state: TrainState, batch: VocoderBatch):
        if grad_accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch.mel, batch.audio
            )
        else:
            B = batch.mel.shape[0]
            if B % grad_accum:
                raise ValueError(
                    f"batch {B} not divisible by grad_accum {grad_accum}"
                )
            mels = microbatch_split(batch.mel, grad_accum)
            audios = microbatch_split(batch.audio, grad_accum)

            def body(g_acc, mb_in):
                l, g = jax.value_and_grad(loss_fn)(state.params, *mb_in)
                return jax.tree.map(jnp.add, g_acc, g), l

            g0 = jax.tree.map(jnp.zeros_like, state.params)
            g_sum, losses = jax.lax.scan(body, g0, (mels, audios))
            grads = jax.tree.map(lambda g: g / grad_accum, g_sum)
            loss = losses.mean()
        state = state.apply_gradients(grads)
        return state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return train_step


class WaveGlowTrainer:
    def __init__(
        self,
        cfg: WaveGlowConfig,
        training_files: str,
        output_directory: str,
        mesh=None,
        remat: bool = False,
        grad_accum: int = 1,
        bf16: bool = False,
    ):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_data_mesh(cfg.batch_size)
        check_grad_accum_mesh(cfg.batch_size, grad_accum, self.mesh)
        self.dataset = Mel2Samp(
            files_to_list(training_files), cfg, shuffle_seed=cfg.seed
        )
        # remat=True rematerializes WN blocks in backward — same params and
        # gradients, ~12x less activation memory, measured zero throughput
        # cost (train_bench): use it to grow the per-chip batch ~2-4x.
        # bf16=True runs the WN/upsample matmuls and convs MXU-native with
        # f32 params and f32 loss accumulation — the configuration the
        # measured 599k samples/s / 59% MFU number uses (train_bench).  The
        # reference contemplates half-precision training only as warnings in
        # its all-reduce hooks (/root/reference/waveglow/distributed.py:96-120);
        # on TPU bf16 needs no loss scaling, so this is a plain dtype knob.
        self.model = WaveGlow(
            cfg, remat=remat,
            compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
        )

        rng = jax.random.PRNGKey(cfg.seed)
        frames = cfg.segment_length // cfg.hop_length + 1
        variables = jax.jit(self.model.init)(
            rng,
            jnp.zeros((1, cfg.n_mel_channels, frames)),
            jnp.zeros((1, cfg.segment_length)),
        )
        tx = optax.adam(cfg.learning_rate)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats={},
            opt_state=tx.init(variables["params"]),
            tx=tx,
        )
        self.state = replicate(state, self.mesh)
        self._train_step = jax.jit(
            make_wg_train_step(self.model, cfg.sigma, grad_accum=grad_accum),
            donate_argnums=(0,),
        )
        self.ckpt = CheckpointManager(output_directory)
        self.logger = MetricsLogger(f"{output_directory}/tb")

    def restore(self) -> int:
        self.state, step = self.ckpt.restore(self.state)
        if step:
            log(f"Resumed WaveGlow from step {step}")
        return step

    def fit(self, num_steps: int, log_every: int = 10):
        """Run training; on KeyboardInterrupt/preemption the current step is
        checkpointed before exit (reference train.py:118-120 behavior)."""
        try:
            self._fit(num_steps, log_every)
        except KeyboardInterrupt:
            step = int(self.state.step)
            log(f"interrupted at step {step}; saving checkpoint")
            self.ckpt.save(step, self.state, wait=True)
            raise

    def _fit(self, num_steps: int, log_every: int = 10):
        cfg = self.cfg
        if len(self.dataset) == 0:
            raise ValueError(
                f"dataset yields 0 batches "
                f"({len(self.dataset.training_files)} files < batch_size "
                f"{self.dataset.batch_size}) — the epoch loop would spin "
                "forever")
        step = int(self.state.step)
        epoch = step // max(1, len(self.dataset))
        while step < num_steps:
            start_step = step % max(1, len(self.dataset))
            for batch in prefetch(self.dataset.epoch(epoch, start_step)):
                t0 = time.perf_counter()
                dev = shard_batch(VocoderBatch(*map(np.asarray, batch)), self.mesh)
                self.state, metrics = self._train_step(self.state, dev)
                step += 1
                if step % log_every == 0:
                    # block on the loss BEFORE reading the clock — the jit
                    # dispatch returns immediately, so timing before the
                    # sync logs host-dispatch microseconds as "s/it"
                    loss = float(metrics["loss"])
                    dur = time.perf_counter() - t0
                    log(f"wg step {step} loss={loss:.5f} {dur:.2f}s/it")
                    self.logger.log_training(
                        metrics["loss"], metrics["grad_norm"],
                        cfg.learning_rate, dur, step,
                    )
                if step % cfg.iters_per_checkpoint == 0:
                    self.ckpt.save(step, self.state)
                if step >= num_steps:
                    break
            epoch += 1
        self.ckpt.save(step, self.state, wait=True)
