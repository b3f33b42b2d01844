"""Evaluation: the best-checkpoint sweep protocol (retires the MATLAB scripts)."""
from .sweep import evaluate_png_dir, sweep_checkpoint_grid

__all__ = ["evaluate_png_dir", "sweep_checkpoint_grid"]
