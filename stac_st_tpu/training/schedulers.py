"""Learning-rate schedules.

``WarmCoolDecayLRSchedule`` replicates the SpeechBrain schedule the reference
trains with (``transformer_multitask.yaml:264-269``; stepped per optimizer
step at ``train_multitask.py:337``): linear warmup → exponential decay
(``decay_factor ** (t/decay_every)``) → linear cooldown to zero over the last
``cooldown`` steps.

Schedules are plain objects with a jit-friendly ``value(step)`` method (pure
jnp math, usable inside the compiled train step via
``optax.inject_hyperparams``) plus the reference's stateful
``__call__(optimizer, step)`` shape for recipe compatibility.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["WarmCoolDecayLRSchedule", "NoamScheduler"]


class WarmCoolDecayLRSchedule:
    def __init__(
        self,
        lr: float,
        warmup: int,
        cooldown: int,
        total_steps: int,
        decay_factor: float = 0.75,
        decay_every: float = 100000,
    ):
        self.base_lr = float(lr)
        self.warmup = int(warmup)
        self.cooldown = int(cooldown)
        self.total_steps = int(total_steps)
        self.decay_factor = float(decay_factor)
        self.decay_every = float(decay_every)
        self.current_lr = 0.0

    def value(self, step):
        """LR at optimizer step ``step`` (1-based), as jnp scalar."""
        step = jnp.asarray(step, jnp.float32)
        warm = self.base_lr * step / max(self.warmup, 1)
        decay = self.base_lr * self.decay_factor ** (step / self.decay_every)
        cool_start = self.total_steps - self.cooldown
        lr_at_cool = self.base_lr * self.decay_factor ** (
            cool_start / self.decay_every
        )
        cool = (
            lr_at_cool
            * jnp.maximum(self.total_steps - step, 0.0)
            / max(self.cooldown, 1)
        )
        lr = jnp.where(
            step < self.warmup,
            warm,
            jnp.where(step < cool_start, decay, cool),
        )
        return jnp.maximum(lr, 0.0)

    def __call__(self, optimizer=None, num_updates: int = 0):
        """Reference-shaped stateful step; returns the new lr."""
        self.current_lr = float(self.value(num_updates))
        return self.current_lr

    # checkpointing hooks (the scheduler is a recoverable, yaml:276)
    def state_dict(self):
        return {"current_lr": self.current_lr}

    def load_state_dict(self, state):
        self.current_lr = state.get("current_lr", 0.0)


class NoamScheduler:
    """Inverse-sqrt warmup schedule (SpeechBrain NoamScheduler surface)."""

    def __init__(self, lr_initial: float, n_warmup_steps: int, model_size=None):
        self.lr_initial = float(lr_initial)
        self.n_warmup_steps = int(n_warmup_steps)
        self.current_lr = 0.0

    def value(self, step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        scale = self.n_warmup_steps ** 0.5 * jnp.minimum(
            step ** -0.5, step * self.n_warmup_steps ** -1.5
        )
        return self.lr_initial * scale

    def __call__(self, optimizer=None, num_updates: int = 0):
        self.current_lr = float(self.value(num_updates))
        return self.current_lr

    def state_dict(self):
        return {"current_lr": self.current_lr}

    def load_state_dict(self, state):
        self.current_lr = state.get("current_lr", 0.0)
