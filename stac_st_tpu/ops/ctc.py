"""CTC loss on relative-length batches (reference contract).

The reference computes CTC over the encoder's 25 Hz frame posteriors with
*relative* wav lengths and token sequences
(``transformer_multitask.yaml:256-258``, ``train_multitask.py:164-170``):
blank index 0, ``batchmean`` reduction (sum over batch / batch size).

Implementation: ``optax.ctc_loss`` (a lax.scan forward algorithm that
compiles to static shapes on TPU). ``log_softmax`` is idempotent, so the
reference's convention of passing log-probabilities is honored exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

__all__ = ["ctc_loss"]


def ctc_loss(
    log_probs,
    targets,
    input_lens,
    target_lens,
    blank_index: int = 0,
    reduction: str = "mean",
):
    """CTC loss.

    Args:
      log_probs: (B, T, C) log-probabilities (or logits — invariant).
      targets: (B, U) int token ids, zero-padded.
      input_lens: (B,) relative input lengths in [0, 1].
      target_lens: (B,) relative target lengths in [0, 1].
      blank_index: CTC blank id (reference uses 0, yaml:138).
      reduction: mean | batchmean | batch | sum (SpeechBrain semantics;
        ``mean`` divides each utterance loss by its target length first,
        like torch's ctc_loss reduction='mean').
    """
    B, T, _ = log_probs.shape
    U = targets.shape[1]
    abs_in = jnp.round(jnp.asarray(input_lens) * T).astype(jnp.int32)
    abs_tgt = jnp.round(jnp.asarray(target_lens) * U).astype(jnp.int32)

    t_idx = jnp.arange(T)[None, :]
    u_idx = jnp.arange(U)[None, :]
    logit_paddings = (t_idx >= abs_in[:, None]).astype(jnp.float32)
    label_paddings = (u_idx >= abs_tgt[:, None]).astype(jnp.float32)

    per_seq = optax.ctc_loss(
        log_probs,
        logit_paddings,
        targets.astype(jnp.int32),
        label_paddings,
        blank_id=blank_index,
    )

    if reduction == "mean":
        return jnp.mean(per_seq / jnp.maximum(abs_tgt, 1))
    if reduction == "batchmean":
        return jnp.sum(per_seq) / B
    if reduction == "batch":
        return per_seq
    if reduction == "sum":
        return jnp.sum(per_seq)
    raise ValueError(f"unknown reduction {reduction!r}")
