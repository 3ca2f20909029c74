"""Convolutional feature frontend (4× time downsampling before the encoder).

Replaces SpeechBrain's ``lobes.models.convolution.ConvolutionFrontEnd`` as
configured by the reference (``transformer_multitask.yaml:173-180``): two
conv blocks over (time, freq), out_channels (256, 256), kernel 3, stride 2,
no residuals — 100 Hz fbank frames → 25 Hz encoder frames
(``inference.py:48``), freq 80 → 20, flattened downstream to 20·256 = 5120
(yaml:186). Each block is Conv2d → LayerNorm → LeakyReLU → Dropout, matching
the SB block structure exactly:

* padding is the SB symmetric ``k//2`` per side (NOT XLA "SAME", which
  pads asymmetrically on even lengths — same output length, shifted
  windows); output length is ``ceil(L/stride)`` either way;
* LayerNorm normalizes over the trailing ``(freq, channel)`` dims with
  ``(F, C)``-shaped scale/bias, as SB's ``nnet.normalization.LayerNorm``
  does when handed a 4-D ``input_shape`` — this makes reference
  checkpoints importable weight-for-weight (tools/import_sb_ckpt.py).

NHWC layout end to end — the natural TPU conv layout; XLA fuses norm+act
into the conv epilogue.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
from flax import linen as nn

__all__ = ["ConvolutionFrontEnd", "conv_out_length"]

_glorot = nn.initializers.glorot_normal()


def conv_out_length(length: int, num_blocks: int = 2, stride: int = 2) -> int:
    """SAME-padded stride-s length after num_blocks convs: ceil-div chain."""
    for _ in range(num_blocks):
        length = -(-length // stride)
    return length


class ConvolutionFrontEnd(nn.Module):
    input_shape: Tuple[int, ...] = (8, 10, 80)  # accepted for YAML compat
    num_blocks: int = 2
    num_layers_per_block: int = 1
    out_channels: Sequence[int] = (256, 256)
    kernel_sizes: Sequence[int] = (3, 3)
    strides: Sequence[int] = (2, 2)
    residuals: Sequence[bool] = (False, False)
    dropout: float = 0.1
    negative_slope: float = 0.01  # LeakyReLU default

    @nn.compact
    def __call__(self, feats, deterministic: bool = True):
        """feats: (B, T, F) fbank -> (B, T', F', C) conv features."""
        x = feats[..., None]  # NHWC with H=time, W=freq
        for b in range(self.num_blocks):
            ksize = int(self.kernel_sizes[b])
            stride = int(self.strides[b])
            pad = ksize // 2  # SB symmetric same-padding (odd kernels)
            for l in range(self.num_layers_per_block):
                s = stride if l == self.num_layers_per_block - 1 else 1
                residual_in = x
                x = nn.Conv(
                    features=int(self.out_channels[b]),
                    kernel_size=(ksize, ksize),
                    strides=(s, s),
                    padding=((pad, pad), (pad, pad)),
                    kernel_init=_glorot,
                    name=f"block{b}_conv{l}",
                )(x)
                x = nn.LayerNorm(
                    reduction_axes=(-2, -1),
                    feature_axes=(-2, -1),
                    epsilon=1e-5,  # torch LayerNorm default (SB frontend)
                    name=f"block{b}_norm{l}",
                )(x)
                x = jax.nn.leaky_relu(x, self.negative_slope)
                x = nn.Dropout(rate=self.dropout)(
                    x, deterministic=deterministic
                )
                if self.residuals[b] and residual_in.shape == x.shape:
                    x = x + residual_in
        return x
