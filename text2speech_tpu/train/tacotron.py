"""Tacotron-2 training loop (rebuild of ``/root/reference/train.py:170-246``).

One jitted ``train_step`` under a data-parallel mesh: the batch axis is
sharded over ``'data'``, params are replicated, and XLA inserts the gradient
all-reduce over ICI — everything ``waveglow/distributed.py`` did by hand
disappears into shardings (SURVEY.md §2.4).  Determinism: the dropout PRNG is
``fold_in(seed, step)``; data order is a pure function of (seed, epoch).

Reference quirks intentionally fixed (SURVEY.md §7.1): gradient clipping is
applied *before* the update (reference clips after, ``train.py:225-229``);
training runs regardless of speaker count (reference only trains when
``multi_speaker > 1``, ``train.py:204``).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from ..config import HParams
from ..data.dataset import Batch, TextMelDataset
from ..data.prefetch import prefetch
from ..models.losses import tacotron2_loss
from ..models.tacotron2 import Tacotron2
from ..parallel.mesh import make_data_mesh, replicate, shard_batch
from ..utils import infolog
from ..utils.logger import MetricsLogger
from ..utils.run_dirs import ValueWindow
from .checkpoint import CheckpointManager
from .state import (TrainState, create_train_state, global_norm,
                    check_grad_accum_mesh, microbatch_split,
                    noam_schedule)

log = infolog.log


def make_train_step(model: Tacotron2, hp: HParams, grad_accum: int = 1):
    """One optimizer step.  ``grad_accum > 1`` splits the batch into that
    many microbatches scanned sequentially — gradients (computed at the same
    params) are averaged, BatchNorm batch stats thread through the scan carry
    (each microbatch normalizes by its own statistics, the standard
    grad-accumulation semantics), and one optimizer update is applied.
    Activation memory is one microbatch's; composes with ``decoder_remat``."""

    def loss_fn(params, batch_stats, mb: Batch, rng):
        (mel_out, mel_post, gate_out, align), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            mb.text,
            mb.input_lengths,
            mb.mel,
            mb.output_lengths,
            speaker_ids=mb.speaker_id,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        loss, metrics = tacotron2_loss(
            mel_out, mel_post, gate_out, mb.mel, mb.gate
        )
        return loss, (metrics, mutated["batch_stats"])

    def train_step(state: TrainState, batch: Batch, rng: jax.Array):
        if grad_accum == 1:
            (_, (metrics, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch, rng)
        else:
            B = batch.text.shape[0]
            if B % grad_accum:
                raise ValueError(
                    f"batch {B} not divisible by grad_accum {grad_accum}"
                )
            micro = jax.tree.map(
                lambda x: microbatch_split(x, grad_accum), batch
            )
            rngs = jax.random.split(rng, grad_accum)

            def body(carry, mb_in):
                g_acc, bs = carry
                mb_batch, rng_i = mb_in
                (_, (m, new_bs)), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, bs, mb_batch, rng_i)
                return (jax.tree.map(jnp.add, g_acc, g), new_bs), m

            g0 = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, new_bs), metrics_seq = jax.lax.scan(
                body, (g0, state.batch_stats), (micro, rngs)
            )
            grads = jax.tree.map(lambda g: g / grad_accum, g_sum)
            metrics = jax.tree.map(lambda m: m.mean(), metrics_seq)
        metrics = dict(metrics, grad_norm=global_norm(grads))
        state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return state, metrics

    return train_step


def make_eval_step(model: Tacotron2):
    def eval_step(state: TrainState, batch: Batch, rng: jax.Array):
        (mel_out, mel_post, gate_out, align) = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.text,
            batch.input_lengths,
            batch.mel,
            batch.output_lengths,
            speaker_ids=batch.speaker_id,
            train=False,
            rngs={"dropout": rng},
        )
        loss, metrics = tacotron2_loss(
            mel_out, mel_post, gate_out, batch.mel, batch.gate
        )
        return metrics, (mel_out, mel_post, gate_out, align)

    return eval_step


class TacotronTrainer:
    def __init__(
        self,
        hp: HParams,
        data_dirs,
        run_dir: str,
        checkpoint_dir: str | None = None,
        logger_dir: str | None = None,
        mesh=None,
        num_test_per_speaker: int = 0,
        skip_path_filter: bool = False,
        data_format: str = "auto",
        remat: bool = False,
        grad_accum: int = 1,
        bf16: bool = False,
    ):
        self.hp = hp
        self.run_dir = run_dir
        self.mesh = mesh if mesh is not None else make_data_mesh(hp.batch_size)
        check_grad_accum_mesh(hp.batch_size, grad_accum, self.mesh)
        # auto-detect preprocessed corpora: dirs of preprocess.py output
        # (*.npz) train through the npz feeder — the reference's
        # preprocess -> datafeeder_tacotron path; raw transcript corpora
        # compute mels on the fly
        if data_format == "auto":
            import glob as _glob

            data_format = (
                "npz"
                if data_dirs and _glob.glob(os.path.join(data_dirs[0], "*.npz"))
                else "wav"
            )
        if data_format == "npz":
            from ..data.npz_dataset import NpzDataFeeder

            self.dataset = NpzDataFeeder(
                data_dirs, hp, max_n_frame=hp.max_decoder_steps
            )
            self.valset = None
            log(f"training from preprocessed npz ({len(self.dataset)} batches/epoch)")
        else:
            self.dataset = TextMelDataset(
                data_dirs, hp, "train", skip_path_filter=skip_path_filter
            )
            try:
                self.valset = TextMelDataset(
                    data_dirs, hp, "val", skip_path_filter=skip_path_filter
                )
            except FileNotFoundError:
                self.valset = None
            if self.valset is None and num_test_per_speaker > 0:
                # no val.txt shipped: hold out N utterances per speaker from
                # the training manifest (--num_test_per_speaker semantics)
                self.valset = self.dataset.hold_out_per_speaker(
                    num_test_per_speaker
                )
                if self.valset is not None:
                    log(
                        f"held out {len(self.valset.items)} utterances "
                        f"({num_test_per_speaker}/speaker) for validation"
                    )

        from ..text import N_SYMBOLS

        # remat=True rematerializes each teacher-forced decoder step in
        # backward — same params and loss, ~T_out x less activation HBM,
        # lifting the batch ceiling (decode is weight-streaming-bound, so
        # the recompute is near-free).
        # bf16=True: MXU-native matmuls/convs with f32 params and f32 loss
        # accumulation (decode is weight-streaming-bound, so halving the
        # streamed bytes is the lever); no loss scaling needed on TPU.
        self.model = Tacotron2(
            hp, n_vocab=N_SYMBOLS, num_speakers=len(data_dirs),
            decoder_remat=remat,
            compute_dtype=jnp.bfloat16 if bf16 else None,
        )
        rng = jax.random.PRNGKey(hp.seed)
        sample = self.dataset.sample_batch()
        variables = jax.jit(self.model.init)(
            {"params": rng, "dropout": rng},
            jnp.asarray(sample.text),
            jnp.asarray(sample.input_lengths),
            jnp.asarray(sample.mel),
            jnp.asarray(sample.output_lengths),
            speaker_ids=jnp.asarray(sample.speaker_id),
        )
        state = create_train_state(
            hp, variables, noam_schedule(hp.learning_rate, hp.warmup_steps)
        )
        self.state = replicate(state, self.mesh)

        self._train_step = jax.jit(
            make_train_step(self.model, hp, grad_accum=grad_accum),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(make_eval_step(self.model))
        self.ckpt = CheckpointManager(checkpoint_dir or f"{run_dir}/checkpoints")
        self.logger = MetricsLogger(logger_dir or f"{run_dir}/tb")
        self.loss_window = ValueWindow(100)
        self.time_window = ValueWindow(100)

    def restore(self, checkpoint_file: str | None = None) -> int:
        """Resume from this run's checkpoint dir, or — when
        ``checkpoint_file`` names another run's checkpoint directory —
        warm-start weights/step from there (reference ``--checkpoint_file``)."""
        if checkpoint_file:
            src = CheckpointManager(checkpoint_file)
            self.state, step = src.restore(self.state)
            log(f"Warm-started from {checkpoint_file} at step {step}")
            return step
        self.state, step = self.ckpt.restore(self.state)
        if step:
            log(f"Resumed from checkpoint at step {step}")
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
        hp = self.hp
        if len(self.dataset) == 0:
            # wav datasets carry .items; the npz feeder carries per-corpus
            # file lists — count whichever this dataset has
            n_utts = (
                len(self.dataset.items)
                if hasattr(self.dataset, "items")
                else sum(len(c)
                         for c in getattr(self.dataset, "corpus_files", ()))
            )
            raise ValueError(
                f"dataset yields 0 batches ({n_utts} "
                f"usable utterances < batch_size {self.dataset.batch_size})"
                " — the epoch loop would spin forever")
        step = int(self.state.step)
        epoch = step // max(1, len(self.dataset))
        sched = noam_schedule(hp.learning_rate, hp.warmup_steps)
        base_rng = jax.random.PRNGKey(hp.seed)

        while step < num_steps:
            start_step = step % max(1, len(self.dataset))
            # overlap next-batch host assembly + device mel dispatch with
            # the running train step (reference: DataLoader workers)
            for batch in prefetch(self.dataset.epoch(epoch, start_step)):
                t0 = time.perf_counter()
                dev_batch = shard_batch(
                    Batch(*[np.asarray(x) for x in batch]), self.mesh
                )
                rng = jax.random.fold_in(base_rng, step)
                self.state, metrics = self._train_step(self.state, dev_batch, rng)
                loss = float(metrics["loss"])
                dur = time.perf_counter() - t0
                self.loss_window.append(loss)
                self.time_window.append(dur)
                step += 1

                if step % log_every == 0:
                    lr = float(sched(jnp.asarray(step)))
                    log(
                        f"step {step} loss={loss:.5f} avg={self.loss_window.average:.5f} "
                        f"grad_norm={float(metrics['grad_norm']):.3f} "
                        f"lr={lr:.2e} {self.time_window.average:.2f}s/it"
                    )
                    self.logger.log_training(
                        loss, metrics["grad_norm"], lr, dur, step
                    )
                if step % hp.checkpoint_interval == 0:
                    self.ckpt.save(step, self.state)
                    self.validate(step)
                if step >= num_steps:
                    break
            epoch += 1
        self.ckpt.save(step, self.state, wait=True)

    def validate(self, step: int):
        if self.valset is None or len(self.valset) == 0:
            return
        rng = jax.random.PRNGKey(0)
        losses = []
        last = None
        for batch in self.valset.epoch(0):
            dev_batch = shard_batch(Batch(*[np.asarray(x) for x in batch]), self.mesh)
            metrics, preds = self._eval_step(self.state, dev_batch, rng)
            losses.append(float(metrics["loss"]))
            last = (dev_batch, preds)
        if not losses:
            return
        val_loss = float(np.mean(losses))
        log(f"validation loss {val_loss:.6f}")
        dev_batch, preds = last
        self.logger.log_validation(
            val_loss,
            self.state.params,
            (dev_batch.mel, dev_batch.gate),
            preds,
            step,
        )
