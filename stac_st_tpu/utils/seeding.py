"""Seeding helpers.

The reference YAML calls ``!apply:torch.manual_seed [seed]`` at load time
(``transformer_multitask.yaml:23``). Here that maps to recording the seed as
the root of the JAX PRNG key tree (functional randomness — keys are split
per-batch/per-op rather than relying on global state).
"""

from __future__ import annotations

import jax

_GLOBAL_SEED = 0


def manual_seed(seed: int) -> int:
    global _GLOBAL_SEED
    _GLOBAL_SEED = int(seed)
    return _GLOBAL_SEED


def get_seed() -> int:
    return _GLOBAL_SEED


def root_key() -> jax.Array:
    return jax.random.PRNGKey(_GLOBAL_SEED)
