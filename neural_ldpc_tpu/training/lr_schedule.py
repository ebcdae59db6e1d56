"""Step-decay learning-rate schedule.

Semantics match the reference driver's epoch-wise schedule
(src/boosted_neural_ldpc_decoder/struct/LearningRate.py:1-27, called once per
epoch at train/train_BoostedNeuralLDPCDecoder.py:255-258): the rate decays by
``decay_rate`` once every ``decay_steps`` calls, and the decaying call still
returns the PRE-decay value.  Expressed here in closed form over a call
counter — ``value_at(k) = initial_lr * decay_rate**(k // decay_steps)`` —
which makes fast-forwarding a resumed run a counter assignment instead of a
replay loop, and lets ``clone()`` hand each ``Trainer.train`` invocation a
fresh schedule (a shared mutable instance would double-advance on
train-then-resume).  For a jit-friendly schedule use optax directly.
"""

from __future__ import annotations


class LearningRate:
    def __init__(self, initial_lr: float, decay_rate: float = 0.0, decay_steps: int = 0):
        self.initial_lr = initial_lr
        self.decay_rate = decay_rate
        self.decay_steps = decay_steps
        self.step = 0

    def value_at(self, step: int) -> float:
        if self.decay_rate == 0 or self.decay_steps <= 0:
            return self.initial_lr
        return self.initial_lr * self.decay_rate ** (step // self.decay_steps)

    @property
    def lr(self) -> float:
        """The value the next __call__ will return."""
        return self.value_at(self.step)

    def __call__(self) -> float:
        value = self.value_at(self.step)
        self.step += 1
        return value

    def clone(self) -> "LearningRate":
        """A pristine copy (step 0) with the same decay configuration."""
        return LearningRate(self.initial_lr, self.decay_rate, self.decay_steps)
