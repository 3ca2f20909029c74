"""Device compute ops: features, normalization, augmentation, losses, masks."""

from .cmvn import CmvnState, InputNormalization, cmvn_apply, cmvn_init, cmvn_update
from .ctc import ctc_loss
from .fbank import Fbank, compute_fbank, mel_filterbank, num_frames
from .losses import LogSoftmax, kldiv_loss, length_mask, nll_loss
from .masks import (
    additive_bias,
    lookahead_mask,
    src_key_padding_mask,
    src_key_padding_mask_encode,
    tgt_key_padding_mask,
)
from .specaugment import SpecAugment, spec_augment
from .speed_perturb import SpeedPerturb

__all__ = [
    "CmvnState", "InputNormalization", "cmvn_apply", "cmvn_init",
    "cmvn_update", "ctc_loss", "Fbank", "compute_fbank", "mel_filterbank",
    "num_frames", "LogSoftmax", "kldiv_loss", "length_mask", "nll_loss",
    "additive_bias", "lookahead_mask", "src_key_padding_mask",
    "src_key_padding_mask_encode", "tgt_key_padding_mask", "SpecAugment",
    "spec_augment", "SpeedPerturb",
]
