"""Attention/padding mask construction (reference semantics, jnp-native).

Mirrors the reference mask builders (``TransformerMultiTask.py:211-232`` and
SpeechBrain's ``get_key_padding_mask``/``get_lookahead_mask``):

* source padding from relative wav lengths with ``round`` (training path,
  :func:`src_key_padding_mask`) and ``floor``-with-``>`` (the reference's
  ``encode()`` uses a slightly different formula — ``TransformerMultiTask.py
  :291-294``; both are provided and tested);
* target padding from ``pad_idx`` equality;
* causal lookahead mask for the decoder.

Convention: masks are boolean with **True = masked/disallowed** (PyTorch
key_padding_mask convention), converted to additive bias at the attention op.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "src_key_padding_mask",
    "src_key_padding_mask_encode",
    "tgt_key_padding_mask",
    "lookahead_mask",
    "additive_bias",
]

NEG_INF = -1e9


def src_key_padding_mask(rel_lengths, max_len: int):
    """True where padded. abs_len = round(rel * max_len) (forward path)."""
    abs_len = jnp.round(jnp.asarray(rel_lengths) * max_len)
    return jnp.arange(max_len)[None, :] >= abs_len[:, None]


def src_key_padding_mask_encode(rel_lengths, max_len: int):
    """Reference encode() variant: floor + strict '>' (frame abs_len kept)."""
    abs_len = jnp.floor(jnp.asarray(rel_lengths) * max_len)
    return jnp.arange(max_len)[None, :] > abs_len[:, None]


def tgt_key_padding_mask(tokens, pad_idx: int = 0):
    """True where tokens == pad. (B, T) bool."""
    return jnp.asarray(tokens) == pad_idx


def lookahead_mask(size: int):
    """(T, T) bool, True above the diagonal (future positions masked)."""
    return jnp.triu(jnp.ones((size, size), jnp.bool_), k=1)


def additive_bias(mask, dtype=jnp.float32):
    """bool mask (True=masked) -> additive attention bias."""
    return jnp.where(mask, jnp.asarray(NEG_INF, dtype), jnp.asarray(0, dtype))
