"""Learning-rate schedules.

Exponential decay matching the reference updater
(`core/train/trainers/occnerf/lr_updaters/exp_decay.py:7-19`):
``lr = base * 0.1 ** (iter / (lrate_decay * 1000))``; parameter groups
named point_cloud / neural_point are exempt from decay.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..config import cfg

NO_DECAY_SUBSTRINGS = ("point_cloud", "neural_point")


def exp_decay_schedule(base_lr: float, lrate_decay: int | None = None,
                       decay: bool = True) -> Callable:
    """optax-style schedule: step -> learning rate."""
    if lrate_decay is None:
        lrate_decay = cfg.train.lrate_decay
    decay_steps = float(lrate_decay) * 1000.0

    def schedule(step):
        if not decay:
            return jnp.asarray(base_lr, jnp.float32)
        return base_lr * jnp.power(0.1, jnp.asarray(step, jnp.float32)
                                   / decay_steps)

    return schedule
