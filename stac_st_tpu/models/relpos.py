"""Transformer-XL style relative-position MHA (reference 'RelPosMHAXL').

The reference model supports ``attention_type: RelPosMHAXL``
(``transformer_multitask.yaml:169``, ``TransformerMultiTask.py:172-176``) as
the alternative to regularMHA for the encoder. Scores follow Transformer-XL
(Dai et al. 2019):

    A = (q + u)·kᵀ  +  rel_shift((q + v)·pᵀ)

with learned global content/position biases u, v and sinusoidal embeddings p
of the relative distances. The rel-shift is implemented with the standard
pad-reshape trick (one reshape, no gathers — XLA-friendly).

Note on the decoder: the reference's ``decode()`` path adds plain sinusoidal
encodings and passes no positional embeddings to the decoder when RelPos is
selected (``TransformerMultiTask.py:253-256``), so the decoder is effectively
absolute-position; this implementation mirrors that (RelPos applies to the
encoder stack only).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["RelPosMultiHeadAttention", "relative_sinusoidal_table"]

_glorot = nn.initializers.glorot_normal()


def relative_sinusoidal_table(seq_len: int, d_model: int) -> np.ndarray:
    """(2*seq_len-1, d_model) embeddings for distances [L-1 … -(L-1)]."""
    pos = np.arange(seq_len - 1, -seq_len, -1, dtype=np.float64)[:, None]
    i = np.arange(0, d_model, 2, dtype=np.float64)[None, :]
    denom = np.power(10000.0, i / d_model)
    table = np.zeros((pos.shape[0], d_model), np.float64)
    table[:, 0::2] = np.sin(pos / denom)
    table[:, 1::2] = np.cos(pos / denom[:, : table[:, 1::2].shape[1]])
    return table.astype(np.float32)


def _rel_shift(x):
    """(B, H, T, 2T-1) -> (B, H, T, T): align diagonal relative scores."""
    B, H, T, L = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(B, H, L + 1, T)
    x = x[:, :, 1:, :].reshape(B, H, T, L)
    return x[:, :, :, :T]


class RelPosMultiHeadAttention(nn.Module):
    d_model: int
    nhead: int
    dropout: float = 0.0

    def setup(self):
        assert self.d_model % self.nhead == 0
        self.head_dim = self.d_model // self.nhead
        self.q_proj = nn.Dense(self.d_model, kernel_init=_glorot, name="q_proj")
        self.k_proj = nn.Dense(self.d_model, kernel_init=_glorot, name="k_proj")
        self.v_proj = nn.Dense(self.d_model, kernel_init=_glorot, name="v_proj")
        self.pos_proj = nn.Dense(
            self.d_model, use_bias=False, kernel_init=_glorot, name="pos_proj"
        )
        self.out_proj = nn.Dense(
            self.d_model, kernel_init=_glorot, name="out_proj"
        )
        self.u_bias = self.param(
            "u_bias", _glorot, (self.nhead, self.head_dim)
        )
        self.v_bias = self.param(
            "v_bias", _glorot, (self.nhead, self.head_dim)
        )
        self.attn_drop = nn.Dropout(rate=self.dropout)

    def __call__(self, x, bias=None, deterministic=True):
        """Self-attention with relative positions. x: (B, T, d)."""
        B, T, _ = x.shape
        H, Dh = self.nhead, self.head_dim
        q = self.q_proj(x).reshape(B, T, H, Dh)
        k = self.k_proj(x).reshape(B, T, H, Dh)
        v = self.v_proj(x).reshape(B, T, H, Dh)

        pos = jnp.asarray(relative_sinusoidal_table(T, self.d_model))
        p = self.pos_proj(pos).reshape(-1, H, Dh)  # (2T-1, H, Dh)

        scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
        content = jnp.einsum(
            "bqhd,bkhd->bhqk", q + self.u_bias[None, None], k,
            preferred_element_type=jnp.float32,
        )
        position = jnp.einsum(
            "bqhd,lhd->bhql", q + self.v_bias[None, None], p,
            preferred_element_type=jnp.float32,
        )
        logits = (content + _rel_shift(position)) * scale
        if bias is not None:
            logits = logits + bias
        weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        if self.dropout > 0.0 and not deterministic:
            weights = self.attn_drop(weights, deterministic=False)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return self.out_proj(out.reshape(B, T, self.d_model)), weights
