"""Run-directory management (``/root/reference/utils/__init__.py:36-114``):
timestamped model dirs, hparams persistence + reload-on-resume, the
ValueWindow rolling average, and str2bool for CLIs."""

from __future__ import annotations

import os
from datetime import datetime

from ..config import HParams


class ValueWindow:
    """Rolling average over the last N values (``utils/__init__.py:13-33``)."""

    def __init__(self, window_size: int = 100):
        self._size = window_size
        self._values: list[float] = []

    def append(self, x: float) -> None:
        # slice AFTER appending: "[-(size-1):]" is "[-0:]" (the whole
        # list) at window_size=1, which never evicted
        self._values = (self._values + [float(x)])[-self._size:]

    @property
    def sum(self) -> float:
        return sum(self._values)

    @property
    def count(self) -> int:
        return len(self._values)

    @property
    def average(self) -> float:
        return self.sum / max(1, self.count)

    def reset(self) -> None:
        self._values = []


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("yes", "true", "t", "1")


def make_run_dir(base_dir: str, name: str | None = None) -> str:
    """``<base>/<name>_<YYYY-MM-DD_HH-MM-SS>`` (``utils/__init__.py:36-57``)."""
    stamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    run = f"{name}_{stamp}" if name else stamp
    path = os.path.join(base_dir, run)
    os.makedirs(path, exist_ok=True)
    return path


def save_hparams(run_dir: str, hp: HParams) -> None:
    """Persist ``params.json`` into the run dir (``utils/__init__.py:60-85``)."""
    hp.save(os.path.join(run_dir, "params.json"))


def load_hparams(run_dir: str) -> HParams:
    """Reload a previous run's hparams for resume
    (``utils/__init__.py:88-104``)."""
    return HParams.load(os.path.join(run_dir, "params.json"))
