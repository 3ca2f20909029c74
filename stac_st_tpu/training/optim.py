"""Optimizer factories (YAML-facing, optax-backed).

The reference instantiates ``torch.optim.AdamW`` via ``!name:`` and the Brain
binds it to module parameters (``transformer_multitask.yaml:223-224``,
``train_multitask.py:656-662``). Here the same YAML entry produces an
:class:`OptimizerFactory`; the trainer turns it into an optax
GradientTransformation with an injectable learning rate so the compiled train
step can follow the schedule without recompilation.
"""

from __future__ import annotations

from typing import Optional

import optax

__all__ = ["AdamW", "Adam", "OptimizerFactory"]


class OptimizerFactory:
    def __init__(
        self,
        kind: str,
        lr: float = 1e-3,
        betas=(0.9, 0.999),
        eps: float = 1e-8,
        weight_decay: float = 0.01,
    ):
        self.kind = kind
        self.lr = float(lr)
        self.betas = tuple(betas)
        self.eps = float(eps)
        self.weight_decay = float(weight_decay)

    def make(
        self, max_grad_norm: Optional[float] = None
    ) -> optax.GradientTransformation:
        """Build the optax chain: clip -> adam(w) with injected lr."""
        if self.kind == "adamw":
            core = optax.inject_hyperparams(optax.adamw)(
                learning_rate=self.lr,
                b1=self.betas[0],
                b2=self.betas[1],
                eps=self.eps,
                weight_decay=self.weight_decay,
            )
        elif self.kind == "adam":
            core = optax.inject_hyperparams(optax.adam)(
                learning_rate=self.lr,
                b1=self.betas[0],
                b2=self.betas[1],
                eps=self.eps,
            )
        else:
            raise ValueError(f"unknown optimizer {self.kind!r}")
        if max_grad_norm:
            return optax.chain(optax.clip_by_global_norm(max_grad_norm), core)
        return core

    def __call__(self, params=None):  # reference shape: Adam(model.parameters())
        return self


def AdamW(lr: float = 1e-3, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.01) -> OptimizerFactory:
    return OptimizerFactory("adamw", lr, betas, eps, weight_decay)


def Adam(lr: float = 1e-3, betas=(0.9, 0.999), eps: float = 1e-8,
         weight_decay: float = 0.0) -> OptimizerFactory:
    return OptimizerFactory("adam", lr, betas, eps, weight_decay)
