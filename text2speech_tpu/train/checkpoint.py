"""Orbax pytree checkpoints — replaces both reference formats (Tacotron's
state-dict pickle, ``/root/reference/train.py:69-75``, and WaveGlow's
whole-model pickle, ``waveglow/train.py:52-60``) with one code-free format:
{params, batch_stats, opt_state, step} + hparams JSON alongside.

Preemption-safe resume: checkpoints are atomic, keep-last-N, and restore
returns the exact step to continue from (the reference's
``convert_model.py``/``glow_old.py`` pickled-code migration machinery has no
reason to exist here).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _placed_like(template_leaf: Any, restored_leaf: Any) -> Any:
    """Give an untemplated-restore leaf the template leaf's dtype, shape
    check, and device placement (what StandardRestore(template) does)."""
    arr = np.asarray(restored_leaf)
    shape = getattr(template_leaf, "shape", None)
    if shape is not None and tuple(arr.shape) != tuple(shape):
        raise ValueError(
            f"checkpoint leaf shape {arr.shape} does not match the model's "
            f"{tuple(shape)} (params_only only skips the optimizer layout, "
            "not the model architecture)."
        )
    if isinstance(template_leaf, jax.Array):
        return jax.device_put(
            arr.astype(template_leaf.dtype), template_leaf.sharding)
    return arr.astype(template_leaf.dtype) if shape is not None else arr


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        tree = {
            "step": np.asarray(step),
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state: Any, step: int | None = None,
                params_only: bool = False) -> tuple[Any, int]:
        """Restore into the structure of ``state``; returns (state, step).

        ``params_only=True`` restores step/params/batch_stats and keeps
        ``state``'s freshly initialized opt_state — the escape hatch for
        checkpoints whose optimizer layout no longer matches the current
        :func:`..train.state.make_optimizer` chain (fine for inference and
        fine-tune-from-weights; optimizer moments restart from zero)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return state, 0
        if params_only:
            # The on-disk opt_state layout is by assumption unknown here, so
            # restore the tree exactly as saved (orbax rejects templates that
            # omit saved keys) and discard the optimizer leaves afterwards.
            # An untemplated restore yields host numpy — re-place each leaf
            # like the template's (dtype + sharding), otherwise a mesh
            # trainer's next donated step sees default single-device
            # placement and recompiles or raises a sharding mismatch.
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore())
            for name in ("params", "batch_stats"):
                want = jax.tree.structure(getattr(state, name))
                got = jax.tree.structure(restored[name])
                if want != got:
                    raise ValueError(
                        f"checkpoint at step {step} in {self.directory}: "
                        f"{name} tree does not match the model (params_only "
                        "only skips the optimizer layout, not the model "
                        "architecture)."
                    )
            return state.replace(
                step=jax.numpy.asarray(restored["step"]),
                params=jax.tree.map(
                    _placed_like, state.params, restored["params"]),
                batch_stats=jax.tree.map(
                    _placed_like, state.batch_stats, restored["batch_stats"]),
            ), int(restored["step"])
        template = {
            "step": np.asarray(0),
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        except Exception as e:
            raise ValueError(
                f"checkpoint at step {step} in {self.directory} does not "
                "match the restore template. If the params themselves "
                "match, the usual cause is an optimizer-layout change "
                "(the opt_state pytree structure is part of the format); "
                "restore(..., params_only=True) recovers the weights and "
                "reinitializes the optimizer."
            ) from e
        new_state = state.replace(
            step=jax.numpy.asarray(restored["step"]),
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        return new_state, int(restored["step"])

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
