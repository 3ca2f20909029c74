"""Activation functions (YAML-instantiable, jnp-native).

The reference selects activations by class from YAML
(``transformer_multitask.yaml:167`` uses ``!name:torch.nn.GELU``); the
registry maps those names here. Instances are callables over jnp arrays.
"""

from __future__ import annotations

import jax

__all__ = ["GELU", "ReLU", "LeakyReLU", "Swish"]


class GELU:
    def __call__(self, x):
        return jax.nn.gelu(x, approximate=False)


class ReLU:
    def __call__(self, x):
        return jax.nn.relu(x)


class LeakyReLU:
    def __init__(self, negative_slope: float = 0.01):
        self.negative_slope = negative_slope

    def __call__(self, x):
        return jax.nn.leaky_relu(x, self.negative_slope)


class Swish:
    def __call__(self, x):
        return jax.nn.silu(x)
