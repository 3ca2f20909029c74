"""Sequence losses: label-smoothed NLL (and KL-div alias), masked reductions.

Replicates SpeechBrain loss semantics the reference trains with
(``transformer_multitask.yaml:260-262``, ``train_multitask.py:155-176``):

* per-token NLL over log-probabilities with a length mask derived from
  relative lengths;
* label smoothing as in SpeechBrain: ``ls * reg + (1-ls) * nll`` where
  ``reg = -sum(mean_vocab(logp) * mask) / sum(mask)`` (the reg term is
  normalized by token count even under batchmean — preserved quirk);
* reductions: ``mean`` (token mean), ``batchmean`` (sum / batch), ``batch``
  (per-utterance mean, unreduced).

All functions are pure jnp and safe under jit/grad.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["nll_loss", "kldiv_loss", "LogSoftmax", "length_mask"]


class LogSoftmax:
    """Callable matching ``torch.nn.LogSoftmax`` instantiation from YAML."""

    def __init__(self, dim: int = -1):
        self.dim = dim

    def __call__(self, x):
        x = x - jnp.max(x, axis=self.dim, keepdims=True)
        return x - jnp.log(jnp.sum(jnp.exp(x), axis=self.dim, keepdims=True))


def length_mask(rel_lengths, max_len: int):
    """(B,) relative lengths -> (B, max_len) float mask (round, ref-style).

    Mirrors the reference mask construction
    (``TransformerMultiTask.py:225-226``): absolute length is
    ``round(rel_len * max_len)``.
    """
    abs_len = jnp.round(jnp.asarray(rel_lengths) * max_len)
    idx = jnp.arange(max_len)[None, :]
    return (idx < abs_len[:, None]).astype(jnp.float32)


def _reduce(per_token, mask, reduction: str):
    total = jnp.sum(per_token * mask)
    if reduction == "mean":
        return total / jnp.maximum(jnp.sum(mask), 1.0)
    if reduction == "batchmean":
        return total / per_token.shape[0]
    if reduction == "batch":
        return jnp.sum(per_token * mask, axis=tuple(range(1, per_token.ndim))) / (
            jnp.maximum(jnp.sum(mask, axis=tuple(range(1, mask.ndim))), 1.0)
        )
    if reduction == "sum":
        return total
    raise ValueError(f"unknown reduction {reduction!r}")


def nll_loss(
    log_probabilities,
    targets,
    length=None,
    label_smoothing: float = 0.0,
    reduction: str = "mean",
):
    """Negative log-likelihood over (B, T, C) log-probs and (B, T) targets."""
    B, T, C = log_probabilities.shape
    targets = targets[..., :T].astype(jnp.int32)
    if length is not None:
        mask = length_mask(length, T)
    else:
        mask = jnp.ones((B, T), jnp.float32)

    picked = jnp.take_along_axis(
        log_probabilities, targets[..., None], axis=-1
    )[..., 0]
    nll = _reduce(-picked, mask, reduction)

    if label_smoothing > 0.0:
        reg = -jnp.sum(jnp.mean(log_probabilities, axis=-1) * mask) / (
            jnp.maximum(jnp.sum(mask), 1.0)
        )
        return label_smoothing * reg + (1.0 - label_smoothing) * nll
    return nll


def kldiv_loss(
    log_probabilities,
    targets,
    length=None,
    label_smoothing: float = 0.0,
    reduction: str = "mean",
    pad_idx: int = 0,
):
    """SpeechBrain exposes kldiv_loss as the label-smoothed NLL twin."""
    return nll_loss(
        log_probabilities,
        targets,
        length=length,
        label_smoothing=label_smoothing,
        reduction=reduction,
    )
