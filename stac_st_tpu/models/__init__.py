"""Model components: conv frontend, transformer stack, multitask model."""

from .activations import GELU, LeakyReLU, ReLU, Swish
from .frontend import ConvolutionFrontEnd, conv_out_length
from .multitask import (
    EncoderWrapper,
    LinearHead,
    ModuleGroup,
    TransformerMultiTask,
)
from .positional import sinusoidal_table
from .transformer import (
    MultiHeadAttention,
    NormalizedEmbedding,
    TransformerDecoder,
    TransformerEncoder,
)

__all__ = [
    "GELU", "LeakyReLU", "ReLU", "Swish", "ConvolutionFrontEnd",
    "conv_out_length", "EncoderWrapper", "LinearHead", "ModuleGroup",
    "TransformerMultiTask", "sinusoidal_table", "MultiHeadAttention",
    "NormalizedEmbedding", "TransformerDecoder", "TransformerEncoder",
]
