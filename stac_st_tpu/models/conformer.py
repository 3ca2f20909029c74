"""Conformer encoder (reference ``encoder_module: conformer`` option).

The reference's TransformerInterface can swap the encoder for a Conformer
(``transformer_multitask.yaml:170``, ``TransformerMultiTask.py:62-65`` —
kernel_size 31, Swish conv activation, decoder stays a Transformer). Layer
structure (Gulati et al. 2020 / SpeechBrain ConformerEncoderLayer):

    x += ½·FFN(LN x);  x += MHA(LN x);  x += Conv(LN x);  x += ½·FFN(LN x);
    x = LN(x)

Conv module: pointwise(2d) → GLU → depthwise(k=31, SAME/causal) → LayerNorm
→ Swish → pointwise(d) → dropout. TPU notes: the depthwise conv uses
feature_group_count=d (lowered to an efficient NHWC depthwise on TPU), and
LayerNorm replaces the reference's BatchNorm in the conv module — batch-stat
sync across the data mesh is needless serialization; documented deviation
with identical model capacity.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from .relpos import RelPosMultiHeadAttention
from .transformer import FeedForward, MultiHeadAttention

__all__ = ["ConformerEncoder", "ConformerEncoderLayer"]

_glorot = nn.initializers.glorot_normal()


class ConvModule(nn.Module):
    d_model: int
    kernel_size: int = 31
    dropout: float = 0.0
    causal: bool = False

    @nn.compact
    def __call__(self, x, pad_mask=None, deterministic=True):
        # x: (B, T, d); pad_mask: (B, T) True where padded
        h = nn.LayerNorm(name="norm")(x)
        h = nn.Dense(2 * self.d_model, kernel_init=_glorot, name="pw1")(h)
        h = jax.nn.glu(h, axis=-1)
        if pad_mask is not None:
            h = jnp.where(pad_mask[..., None], 0.0, h)
        padding = (
            [(self.kernel_size - 1, 0)] if self.causal
            else [((self.kernel_size - 1) // 2, self.kernel_size // 2)]
        )
        h = nn.Conv(
            features=self.d_model,
            kernel_size=(self.kernel_size,),
            feature_group_count=self.d_model,
            padding=padding,
            kernel_init=_glorot,
            name="depthwise",
        )(h)
        h = nn.LayerNorm(name="conv_norm")(h)
        h = jax.nn.silu(h)
        h = nn.Dense(self.d_model, kernel_init=_glorot, name="pw2")(h)
        return nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)


class ConformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    d_ffn: int
    kernel_size: int = 31
    dropout: float = 0.1
    activation: Callable = jax.nn.silu
    attention_type: str = "RelPosMHAXL"
    causal: bool = False

    def setup(self):
        self.ffn1 = FeedForward(self.d_model, self.d_ffn, self.dropout,
                                self.activation, name="ffn1")
        self.ffn2 = FeedForward(self.d_model, self.d_ffn, self.dropout,
                                self.activation, name="ffn2")
        if self.attention_type == "RelPosMHAXL":
            self.attn = RelPosMultiHeadAttention(
                self.d_model, self.nhead, self.dropout, name="attn"
            )
        else:
            self.attn = MultiHeadAttention(
                self.d_model, self.nhead, self.dropout, name="attn"
            )
        self.conv = ConvModule(self.d_model, self.kernel_size, self.dropout,
                               self.causal, name="conv")
        self.norm_ffn1 = nn.LayerNorm(name="norm_ffn1")
        self.norm_attn = nn.LayerNorm(name="norm_attn")
        self.norm_ffn2 = nn.LayerNorm(name="norm_ffn2")
        self.final_norm = nn.LayerNorm(name="final_norm")
        self.drop = nn.Dropout(rate=self.dropout)

    def __call__(self, x, bias=None, pad_mask=None, deterministic=True):
        x = x + 0.5 * self.drop(
            self.ffn1(self.norm_ffn1(x), deterministic),
            deterministic=deterministic,
        )
        h = self.norm_attn(x)
        if isinstance(self.attn, RelPosMultiHeadAttention):
            h, _ = self.attn(h, bias, deterministic)
        else:
            h, _ = self.attn(h, h, h, bias, deterministic)
        x = x + self.drop(h, deterministic=deterministic)
        x = x + self.conv(x, pad_mask, deterministic)
        x = x + 0.5 * self.drop(
            self.ffn2(self.norm_ffn2(x), deterministic),
            deterministic=deterministic,
        )
        return self.final_norm(x)


class ConformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int
    kernel_size: int = 31
    dropout: float = 0.1
    activation: Callable = jax.nn.silu
    attention_type: str = "RelPosMHAXL"
    causal: bool = False

    def setup(self):
        self.layers = [
            ConformerEncoderLayer(
                self.d_model, self.nhead, self.d_ffn, self.kernel_size,
                self.dropout, self.activation, self.attention_type,
                self.causal, name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(self, x, bias=None, pad_mask=None, deterministic=True):
        for layer in self.layers:
            x = layer(x, bias, pad_mask, deterministic)
        return x
