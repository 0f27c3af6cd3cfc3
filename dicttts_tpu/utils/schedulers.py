"""Learning-rate schedules as optax-compatible callables.

Parity with the reference (/root/reference/utils/common_schedulers.py):
- `rsqrt_schedule`: Noam-style lr * min(step/warmup, 1) *
  max(warmup, step)^-0.5 * hidden^-0.5, floored at 1e-7;
- `step_decay_schedule`: StepLR (lr * gamma^floor(step/step_size)) used by
  the discriminator optimizers (tasks/tts/ps_adv.py StepLR, dict_tts.yaml
  discriminator_scheduler_params).
"""

from __future__ import annotations

import jax.numpy as jnp


def rsqrt_schedule(lr: float, warmup_updates: int, hidden_size: int, floor: float = 1e-7):
    rsqrt_hidden = hidden_size**-0.5

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = jnp.minimum(step / warmup_updates, 1.0)
        rsqrt_decay = jnp.maximum(float(warmup_updates), step) ** -0.5
        return jnp.maximum(lr * warmup * rsqrt_decay * rsqrt_hidden, floor)

    return schedule


def step_decay_schedule(lr: float, step_size: int, gamma: float):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return lr * gamma ** jnp.floor(step / step_size)

    return schedule


def constant_schedule(lr: float):
    def schedule(step):
        return jnp.full_like(jnp.asarray(step, jnp.float32), lr)

    return schedule
