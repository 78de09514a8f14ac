"""Learning-rate schedules.

The reference decays linearly by `init_lr/every` per call with a floor at 0
(misc.py:164-172 `adjust_learning_rate`). Both an optax schedule (for fully
jitted training) and a step-imperative port are provided.
"""

from __future__ import annotations

import optax


def linear_decay_schedule(init_lr: float, every: int, start_step: int = 0):
    """optax schedule: lr(step) = max(init_lr − (step − start)·init_lr/every, 0)."""
    import jax.numpy as jnp

    lrd = init_lr / every

    def schedule(step):
        lr = init_lr - lrd * jnp.maximum(step - start_step, 0)
        return jnp.maximum(lr, 0.0)

    return schedule


def adjust_learning_rate(current_lr: float, init_lr: float, every: int) -> float:
    """Imperative equivalent of misc.adjust_learning_rate: one decay tick."""
    lr = current_lr - init_lr / every
    return max(lr, 0.0)


def make_adam(lr, beta1: float = 0.5, beta2: float = 0.999) -> optax.GradientTransformation:
    """Adam(lr=2e-4, β1=0.5) — the reference's optimiser defaults
    (demo.py:43-46 flags)."""
    return optax.adam(lr, b1=beta1, b2=beta2)
