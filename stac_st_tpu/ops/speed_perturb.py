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

from typing import List, Optional

import numpy as np

from ..data.resample import fast_resample_poly

__all__ = ["SpeedPerturb"]


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

        self._rng = np.random.default_rng(get_seed())

    def seed(self, seed: int) -> None:
        self._rng = np.random.default_rng(seed)

    def __call__(self, wav: np.ndarray, speed: Optional[int] = None):
        """wav: (L,) float array -> perturbed (L',) float32 array."""
        if speed is None:
            speed = self.speeds[int(self._rng.integers(len(self.speeds)))]
        if speed == 100:
            return np.asarray(wav, np.float32)
        # playing at `speed`% == resampling by factor 100/speed
        return fast_resample_poly(np.asarray(wav, np.float32), 100,
                                  int(speed))
