"""Train state + optimization.

Optax replaces the reference's hand-rolled pieces: Noam warmup schedule
(``/root/reference/train.py:62-67``), Adam with betas/weight decay
(``train.py:188-189``), and global-norm clipping.  The reference clips AFTER
``optimizer.step()`` (``train.py:225-229``) so its clipping never affects the
update — here clipping is applied before the update, the intended behavior
(SURVEY.md §7.1 fix-not-reproduce list).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import HParams


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )


def noam_schedule(init_lr: float, warmup_steps: int = 4000):
    """lr(step) = init_lr * sqrt(warmup) * min((s+1)/warmup^1.5, 1/sqrt(s+1))
    (``train.py:62-67``)."""

    def fn(step):
        s = step.astype(jnp.float32) + 1.0 if hasattr(step, "astype") else float(step) + 1.0
        w = float(warmup_steps)
        return init_lr * w ** 0.5 * jnp.minimum(s * w ** -1.5, s ** -0.5)

    return fn


def make_optimizer(hp: HParams, schedule=None) -> optax.GradientTransformation:
    """Clip -> COUPLED-L2 Adam (the reference's ``torch.optim.Adam(...,
    weight_decay=hp.weight_decay)``, ``train.py:188-189``: the decay term
    joins the gradient BEFORE the Adam moments — ``add_decayed_weights``
    ahead of ``scale_by_adam``, not decoupled adamw, whose decay applies
    after normalization and diverges from the cited reference)."""
    if schedule is None:
        schedule = noam_schedule(hp.learning_rate, hp.warmup_steps)
    return optax.chain(
        optax.clip_by_global_norm(hp.grad_clip_norm),
        optax.add_decayed_weights(hp.weight_decay),
        optax.scale_by_adam(b1=hp.adam_beta1, b2=hp.adam_beta2),
        optax.scale_by_learning_rate(schedule),
    )


def create_train_state(hp: HParams, variables: dict, schedule=None) -> TrainState:
    tx = make_optimizer(hp, schedule)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def microbatch_split(x: jnp.ndarray, grad_accum: int) -> jnp.ndarray:
    """[B, ...] -> [grad_accum, B//grad_accum, ...] with a STRIDED row split:
    microbatch i holds rows ``i::grad_accum``.

    The stride matters under data parallelism: the global batch dim is
    sharded in contiguous row blocks over the 'data' axis, so a contiguous
    ``reshape(grad_accum, mb, ...)`` would pin each microbatch onto a device
    subset (resharding or idling every scan step).  The strided split gives
    every microbatch ``mb / data_axis`` rows on every device as long as
    ``(B // grad_accum) % data_axis == 0`` — asserted by the trainers."""
    B = x.shape[0]
    mb = B // grad_accum
    return x.reshape(mb, grad_accum, *x.shape[1:]).swapaxes(0, 1)


def check_grad_accum_mesh(batch_size: int, grad_accum: int, mesh) -> None:
    """Microbatches are a strided row split (:func:`microbatch_split`), so
    each spans every 'data'-axis device — but only when the microbatch size
    is itself divisible by the data-axis size.  Fail loudly at build time
    instead of silently resharding every scan step.  Shared by both
    trainers."""
    if grad_accum <= 1 or mesh is None:
        return
    data = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)
    mb = batch_size // grad_accum
    if batch_size % grad_accum or mb % data:
        raise ValueError(
            f"batch {batch_size} / grad_accum {grad_accum} = microbatch "
            f"{mb} must be divisible by the data-axis size {data}"
        )
