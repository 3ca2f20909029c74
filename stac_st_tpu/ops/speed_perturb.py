"""Speed perturbation (host-side, in the data-loading worker).

Replaces SpeechBrain's ``processing.speech_augmentation.SpeedPerturb``
(reference ``transformer_multitask.yaml:295-297``, applied in the dataloader
worker at ``train_multitask.py:511-512``): resample the raw waveform to one
of {90, 100, 110}% speed, chosen uniformly per utterance.

This stays on the host CPU on purpose (same placement as the reference): it
changes the *length* of the signal, which must happen before bucket/pad
decisions; doing it on device would force dynamic shapes into the compiled
graph. Resampling is scipy polyphase (numerically the same family as
SpeechBrain's windowed-sinc Resample), delegated to the native C++ resampler
when built.
"""

from __future__ import annotations

from math import gcd
from typing import List, Optional

import numpy as np

from ..data.resample import fast_resample_poly

__all__ = ["SpeedPerturb", "DeviceSpeedPerturb", "device_resample"]


class SpeedPerturb:
    def __init__(self, orig_freq: int = 16000, speeds: Optional[List[int]] = None,
                 **unused):
        self.orig_freq = int(orig_freq)
        self.speeds = [int(s) for s in (speeds or [90, 100, 110])]
        # The reference draws speeds from the torch global RNG, which the
        # yaml's `!apply:torch.manual_seed [seed]` line (loaded first) has
        # already seeded — so runs are reproducible. Mirror that: seed from
        # the recorded global seed, not from OS entropy.
        from ..utils.seeding import get_seed

        self._seed = int(get_seed())
        self._rng = np.random.default_rng(self._seed)

    def seed(self, seed: int) -> None:
        self._seed = int(seed)
        self._rng = np.random.default_rng(seed)

    def speed_for(self, key) -> int:
        """Deterministic per-utterance speed, keyed by e.g. (epoch, row).

        Counter-based rather than stream-based so the draw is invariant
        to decode order — identical under loader worker threads and on
        every host of a pod (shard-aware loaders skip non-owned audio
        decodes entirely, so a sequential stream would desync)."""
        r = np.random.default_rng((self._seed, *np.atleast_1d(key)))
        return self.speeds[int(r.integers(len(self.speeds)))]

    def perturbed_len(self, n: int, speed: int) -> int:
        """Output length of ``__call__`` on an ``n``-sample signal (the
        polyphase resampler's ceil(n·up/down) with the gcd reduced)."""
        if speed == 100:
            return int(n)
        g = gcd(100, int(speed))
        up, down = 100 // g, int(speed) // g
        return -(-int(n) * up // down)

    def __call__(self, wav: np.ndarray, speed: Optional[int] = None):
        """wav: (L,) float array -> perturbed (L',) float32 array."""
        if speed is None:
            speed = self.speeds[int(self._rng.integers(len(self.speeds)))]
        if speed == 100:
            return np.asarray(wav, np.float32)
        # playing at `speed`% == resampling by factor 100/speed
        return fast_resample_poly(np.asarray(wav, np.float32), 100,
                                  int(speed))


# ---------------------------------------------------------------------------
# On-device speed perturbation (TPU-native variant)
# ---------------------------------------------------------------------------

def device_resample(x, up: int, down: int, out_width: int):
    """Batched polyphase resample INSIDE the jitted step: x (B, W) →
    (B, out_width). Same filter/alignment math as the host
    :func:`~stac_st_tpu.data.resample.fast_resample_poly` (one conv of
    stride ``down`` whose ``up`` output channels are the polyphase block) —
    MXU-shaped, static shapes."""
    import jax.numpy as jnp
    from jax import lax

    from ..data.resample import _block_bank_c1

    g = gcd(int(up), int(down))
    up, down = int(up) // g, int(down) // g
    B, W = x.shape
    if up == 1 and down == 1:
        if out_width == W:
            return x
        return jnp.pad(x, ((0, 0), (0, out_width - W)))[:, :out_width]

    F, K, R, s0 = _block_bank_c1(up, down)
    first = s0 - (K - 1)
    n_blocks = -(-out_width // up)
    pad_lo = max(0, -first)
    needed = (n_blocks - 1) * down + (K + down)
    pad_hi = max(0, needed - (W + min(first, 0) + pad_lo) - max(first, 0))
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi)))
    if first > 0:
        xp = xp[:, first:]
    kernel = jnp.asarray(F.T)[:, None, :]  # (O=up, I=1, K+down)
    out = lax.conv_general_dilated(
        xp[:, None, :].astype(jnp.float32), kernel,
        window_strides=(down,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=lax.Precision.HIGHEST,
    )  # (B, up, n_windows >= n_blocks)
    y = jnp.transpose(out[:, :, :n_blocks], (0, 2, 1)).reshape(B, -1)
    return y[:, :out_width].astype(x.dtype)


class DeviceSpeedPerturb:
    """Speed perturbation applied ON DEVICE inside the jitted train step.

    The host only samples the per-utterance speed (same seeded draw
    protocol as :class:`SpeedPerturb`, so runs stay bit-reproducible) and
    ships a ``speed_idx`` column; the resample itself is a batched
    polyphase conv on the chip. TPU-first consequences:

    * strictly static shapes — the padded signal buffer grows by the fixed
      worst-case ratio (``100/min(speeds)``) instead of per-utterance
      (the host path lets a 90%-speed utterance overflow its duration
      bucket, widening the compiled batch shape);
    * the host pipeline sheds its most expensive stage;
    * all three speed variants are computed and one-hot-selected per row
      (cheap convs; no data-dependent shapes).

    Relative lengths rescale by ``(100/speed) · W/W_out``.
    """

    device = True

    def __init__(self, orig_freq: int = 16000,
                 speeds: Optional[List[int]] = None, **unused):
        self.orig_freq = int(orig_freq)
        self.speeds = [int(s) for s in (speeds or [90, 100, 110])]
        from ..utils.seeding import get_seed

        self._seed = int(get_seed())
        self._rng = np.random.default_rng(self._seed)

    def seed(self, seed: int) -> None:
        self._seed = int(seed)
        self._rng = np.random.default_rng(seed)

    def sample_index(self) -> int:
        return int(self._rng.integers(len(self.speeds)))

    def index_for(self, key) -> int:
        """Deterministic per-utterance speed index (see
        :meth:`SpeedPerturb.speed_for` for why counter-based)."""
        r = np.random.default_rng((self._seed, *np.atleast_1d(key)))
        return int(r.integers(len(self.speeds)))

    def out_width(self, in_width: int) -> int:
        """Static output width: worst-case (slowest speed) length."""
        widths = []
        for s in self.speeds:
            g = gcd(100, s)
            up, down = 100 // g, s // g
            widths.append(
                in_width * up // down + bool((in_width * up) % down)
            )
        return max(widths)

    def apply(self, sig, lengths_rel, speed_idx):
        """sig (B, W) float, lengths_rel (B,) in [0,1], speed_idx (B,)
        int32 → (sig' (B, W_out), lengths_rel' (B,))."""
        import jax
        import jax.numpy as jnp

        B, W = sig.shape
        W_out = self.out_width(W)
        variants = [
            device_resample(sig, 100, s, W_out) for s in self.speeds
        ]
        stacked = jnp.stack(variants, axis=1)  # (B, S, W_out)
        onehot = jax.nn.one_hot(
            speed_idx, len(self.speeds), dtype=stacked.dtype
        )
        out = jnp.einsum("bs,bsw->bw", onehot, stacked)
        ratios = jnp.asarray(
            [100.0 / s for s in self.speeds], jnp.float32
        )
        new_rel = lengths_rel * jnp.take(ratios, speed_idx) * (W / W_out)
        return out, jnp.minimum(new_rel, 1.0)
