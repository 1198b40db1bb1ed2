"""Training callbacks: best-weights keeping + early-stop wiring.

Reference: the in-memory best-weights registry and early-stopping rollback
(``odin/training/trainer.py:33-34,182-208`` and
``odin/networks/base_networks.py:542-544,782-785`` — the
nan_gradients_policy='restore' path reloads the last best weights at
`on_valid_end`).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from odin_tpu.training.core import TrainState
from odin_tpu.training.early_stopping import EarlyStopping

__all__ = ["BestWeights", "early_stopping_callback"]


class BestWeights:
  """`on_valid_end` hook: keep the best-validation-loss TrainState; restore
  it on demand (or automatically when the loss regresses by more than
  `restore_margin`)."""

  def __init__(self, metric: str = "loss", mode: str = "min",
               restore_margin: Optional[float] = None):
    self.metric = metric
    self.sign = 1.0 if mode == "min" else -1.0
    self.restore_margin = restore_margin
    self.best_value: float = np.inf
    self.best_state: Optional[TrainState] = None

  def __call__(self, trainer, state: TrainState, valid_metrics: Dict[str, float]):
    value = self.sign * float(valid_metrics.get(self.metric, np.inf))
    if value < self.best_value:
      self.best_value = value
      self.best_state = jax.device_get(state)
      return None
    if self.restore_margin is not None and self.best_state is not None and \
        value > self.best_value + self.restore_margin:
      # roll back to the best weights (the reference's 'restore' policy)
      return self.best_state.replace(step=state.step, rng=state.rng)
    return None

  def restore(self) -> Optional[TrainState]:
    return self.best_state


def early_stopping_callback(early_stopper: EarlyStopping,
                            metric: str = "loss",
                            best_weights: Optional[BestWeights] = None):
  """Wire an EarlyStopping criterion into Trainer's `on_valid_end`:
  terminates training on signal +1, keeps best weights on -1."""

  def hook(trainer, state, valid_metrics):
    signal = early_stopper.update(float(valid_metrics.get(metric, np.inf)))
    if best_weights is not None:
      out = best_weights(trainer, state, valid_metrics)
      if out is not None:
        return out
    if signal > 0:
      trainer.terminate()
    return None

  return hook


class Callback:
  """Minimal callback base (reference keras-style `Callback`): subclass
  and override the hooks; instances are also usable directly as
  `Trainer.fit(callbacks=[...])` entries via `__call__`."""

  def on_batch_end(self, trainer, state, metrics):
    return None

  def on_valid_end(self, trainer, state, valid_metrics):
    return None

  def __call__(self, trainer, state, valid_metrics):
    return self.on_valid_end(trainer, state, valid_metrics)
