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
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore())
            want = jax.tree.structure(state.params)
            got = jax.tree.structure(restored["params"])
            if want != got:
                raise ValueError(
                    f"checkpoint at step {step} in {self.directory}: params "
                    "tree does not match the model (params_only only skips "
                    "the optimizer layout, not the model architecture)."
                )
            return state.replace(
                step=jax.numpy.asarray(restored["step"]),
                params=restored["params"],
                batch_stats=restored["batch_stats"],
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
