"""Global CMVN with epoch-gated running statistics (TPU-native redesign).

Replaces SpeechBrain's ``processing.features.InputNormalization`` with
``norm_type: global, update_until_epoch: 4``
(reference ``transformer_multitask.yaml:208-210``, applied at
``train_multitask.py:61``): a running average of *per-utterance* feature
means/stds is accumulated until epoch 4, then frozen; features are
normalized with the running stats. The stats are a checkpointed recoverable
(yaml:277) — here they live in :class:`CmvnState`, a pytree carried inside
the train state (so checkpoint/restore and cross-device ``psum`` are free).

TPU-native difference from the reference: the reference folds utterances one
by one (weight 1/(count+1)), which is exactly the arithmetic mean of all
per-utterance stats seen so far. We use that closed form — a batch update is
``(stat*count + sum_batch)/ (count+B)`` — which is order-independent,
vectorized, and psum-able across the data-parallel mesh.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["CmvnState", "InputNormalization", "cmvn_init", "cmvn_apply",
           "cmvn_update"]

_EPS = 1e-10


class CmvnState(NamedTuple):
    mean: jax.Array   # (D,)
    std: jax.Array    # (D,)
    count: jax.Array  # () float — number of utterances folded in


def cmvn_init(dim: int) -> CmvnState:
    return CmvnState(
        mean=jnp.zeros((dim,), jnp.float32),
        std=jnp.ones((dim,), jnp.float32),
        count=jnp.zeros((), jnp.float32),
    )


def _per_utt_stats(feats, rel_lengths):
    """Masked per-utterance mean/std over time. feats: (B, T, D)."""
    B, T, D = feats.shape
    abs_len = jnp.round(rel_lengths * T)
    mask = (jnp.arange(T)[None, :] < abs_len[:, None]).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)  # (B, 1)
    mean = jnp.sum(feats * mask[..., None], axis=1) / denom  # (B, D)
    var = (
        jnp.sum((feats - mean[:, None, :]) ** 2 * mask[..., None], axis=1)
        / denom
    )
    std = jnp.sqrt(jnp.maximum(var, _EPS))
    return mean, std


def cmvn_update(state: CmvnState, feats, rel_lengths,
                axis_name: str | None = None) -> CmvnState:
    """Fold a batch of utterances into the running stats (train, epoch<4)."""
    mean_b, std_b = _per_utt_stats(feats, rel_lengths)
    B = jnp.asarray(feats.shape[0], jnp.float32)
    sum_mean = jnp.sum(mean_b, axis=0)
    sum_std = jnp.sum(std_b, axis=0)
    if axis_name is not None:
        B = jax.lax.psum(B, axis_name)
        sum_mean = jax.lax.psum(sum_mean, axis_name)
        sum_std = jax.lax.psum(sum_std, axis_name)
    new_count = state.count + B
    new_mean = (state.mean * state.count + sum_mean) / new_count
    new_std = (state.std * state.count + sum_std) / new_count
    return CmvnState(new_mean, new_std, new_count)


def cmvn_apply(state: CmvnState, feats) -> jax.Array:
    """Normalize with the (possibly just-updated) global stats."""
    # With no stats yet (count==0) fall back to identity-safe defaults.
    std = jnp.maximum(state.std, _EPS)
    return (feats - state.mean[None, None, :]) / std[None, None, :]


class InputNormalization:
    """YAML-facing spec object (the functional state lives in CmvnState)."""

    def __init__(self, norm_type: str = "global", update_until_epoch: int = 4,
                 **unused):
        if norm_type != "global":
            raise NotImplementedError(
                "reference uses norm_type: global (yaml:209)"
            )
        self.norm_type = norm_type
        self.update_until_epoch = int(update_until_epoch)

    def init_state(self, dim: int) -> CmvnState:
        return cmvn_init(dim)

    def should_update(self, epoch: int) -> bool:
        # reference: stats update while epoch < update_until_epoch
        return epoch < self.update_until_epoch

    def __call__(self, feats, rel_lengths, state: CmvnState,
                 update: bool = False, axis_name: str | None = None):
        """Returns (normalized_feats, new_state)."""
        if update:
            state = cmvn_update(state, feats, rel_lengths, axis_name)
        return cmvn_apply(state, feats), state
