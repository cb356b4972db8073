"""Observability + run management: infolog, TB metrics, plots, run dirs."""
from .run_dirs import ValueWindow, load_hparams, make_run_dir, save_hparams, str2bool  # noqa: F401
