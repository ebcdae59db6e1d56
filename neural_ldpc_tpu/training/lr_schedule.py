"""Step-decay learning-rate schedule (reference struct/LearningRate.py:1-27).

The reference decays the rate once every ``decay_steps`` __call__ invocations
(one call per epoch in the train driver, train/…:255-258) and returns the
PRE-decay value on the decaying call.  Stateful like the reference; for a pure
jit-friendly schedule use ``optax`` schedules directly.
"""

from __future__ import annotations


class LearningRate:
    def __init__(self, initial_lr: float, decay_rate: float = 0.0, decay_steps: int = 0):
        self.lr = initial_lr
        self.decay_rate = decay_rate
        self.decay_steps = decay_steps
        self._calls = 0

    def __call__(self) -> float:
        if self.decay_rate == 0 or self.decay_steps <= 0:
            return self.lr
        current = self.lr
        self._calls += 1
        if self._calls >= self.decay_steps:
            self.lr *= self.decay_rate
            self._calls = 0
        return current
