"""Log-mel filterbank features, formulated for the TPU MXU.

Replaces SpeechBrain's ``lobes.features.Fbank`` (reference
``transformer_multitask.yaml:299-302``; called on-device per batch at
``train_multitask.py:59``): 16 kHz audio → STFT(n_fft=400, hop=160, hamming,
center/constant-pad) → power spectrum → 80 triangular HTK-mel filters →
dB log with top_db clamp.

TPU-first design: there is no FFT in the hot path. The windowed DFT is a
*single strided convolution* with a fixed (n_fft × 2·n_bins) kernel — XLA
lowers it onto the MXU and fuses the surrounding elementwise ops — and the
mel projection is one more matmul. For n_fft=400 this beats an FFT lowering
on TPU and keeps everything in one fused HLO region. The whole op is pure
and jit/vmap/grad-safe.

Frame-count contract matches torch.stft(center=True): T = 1 + L // hop.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Fbank", "mel_filterbank", "compute_fbank", "num_frames"]


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: int, f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """(n_bins, n_mels) triangular HTK-mel matrix (SpeechBrain-compatible)."""
    f_max = f_max if f_max is not None else sample_rate / 2
    n_bins = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate / 2, n_bins)
    mel_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    f_central = hz_pts[1:-1]
    band = hz_pts[2:] - hz_pts[1:-1]  # right-side widths, SB-style

    slope = (all_freqs[:, None] - f_central[None, :]) / band[None, :]
    left = slope + 1.0
    right = -slope + 1.0
    fbank = np.maximum(0.0, np.minimum(left, right))
    return fbank.astype(np.float32)


def num_frames(n_samples: int, hop_length: int = 160) -> int:
    """Frames produced for a center-padded signal of n_samples."""
    return 1 + n_samples // hop_length


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "top_db", "log_mel")
)
def _fbank_impl(wavs, dft_kernel, mel_matrix, n_fft, hop_length, top_db,
                log_mel):
    B, L = wavs.shape
    pad = n_fft // 2
    x = jnp.pad(wavs, ((0, 0), (pad, pad)))
    # Strided windowed-DFT as one conv: (B, 1, L') * (2*n_bins, 1, n_fft)
    out = jax.lax.conv_general_dilated(
        x[:, None, :].astype(jnp.float32),
        dft_kernel,
        window_strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # features must be fp32-exact
    )  # (B, 2*n_bins, T)
    n_bins = dft_kernel.shape[0] // 2
    re = out[:, :n_bins, :]
    im = out[:, n_bins:, :]
    power = re * re + im * im  # (B, n_bins, T)
    mel = jnp.einsum(
        "bft,fm->btm", power, mel_matrix,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if not log_mel:
        return mel
    amin = 1e-10
    x_db = 10.0 * jnp.log10(jnp.maximum(mel, amin))
    # SB's amplitude_to_DB clamps at (global max - top_db) over the tensor
    x_db = jnp.maximum(x_db, jnp.max(x_db) - top_db)
    return x_db


class Fbank:
    """YAML-facing fbank op. Call with (B, L) or (L,) waveforms."""

    def __init__(
        self,
        sample_rate: int = 16000,
        n_fft: int = 400,
        n_mels: int = 80,
        hop_length: float | None = None,  # ms; default 10 ms
        win_length: float | None = None,  # ms; default 25 ms
        f_min: float = 0.0,
        f_max: float | None = None,
        log_mel: bool = True,
        top_db: float = 80.0,
        **unused,
    ):
        self.sample_rate = int(sample_rate)
        self.n_fft = int(n_fft)
        self.n_mels = int(n_mels)
        self.hop_length = int(
            round((hop_length or 10.0) * self.sample_rate / 1000.0)
        )
        self.win_length = int(
            round((win_length or 25.0) * self.sample_rate / 1000.0)
        )
        self.log_mel = bool(log_mel)
        self.top_db = float(top_db)

        n_bins = self.n_fft // 2 + 1
        # periodic hamming (torch.hamming_window default, used by SB's STFT)
        window = np.hamming(self.win_length + 1)[:-1].astype(np.float64)
        if self.win_length < self.n_fft:  # center window inside the FFT frame
            lpad = (self.n_fft - self.win_length) // 2
            window = np.pad(window, (lpad, self.n_fft - self.win_length - lpad))
        k = np.arange(self.n_fft)[None, :]
        bins = np.arange(n_bins)[:, None]
        angle = -2.0 * math.pi * bins * k / self.n_fft
        re = np.cos(angle) * window[None, :]
        im = np.sin(angle) * window[None, :]
        kernel = np.concatenate([re, im], axis=0)[:, None, :]  # (2nb, 1, nfft)
        self._dft_kernel = jnp.asarray(kernel, jnp.float32)
        self._mel = jnp.asarray(
            mel_filterbank(self.n_mels, self.n_fft, self.sample_rate,
                           f_min, f_max)
        )

    def __call__(self, wavs):
        wavs = jnp.asarray(wavs)
        squeeze = wavs.ndim == 1
        if squeeze:
            wavs = wavs[None, :]
        feats = _fbank_impl(
            wavs, self._dft_kernel, self._mel, self.n_fft, self.hop_length,
            self.top_db, self.log_mel,
        )
        return feats[0] if squeeze else feats

    def output_frames(self, n_samples: int) -> int:
        return num_frames(n_samples, self.hop_length)


def compute_fbank(wavs, sample_rate=16000, n_fft=400, n_mels=80):
    """Convenience functional entry (fresh op each call; prefer Fbank)."""
    return Fbank(sample_rate, n_fft, n_mels)(wavs)
