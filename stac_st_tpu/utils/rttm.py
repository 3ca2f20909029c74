"""Speaker-turn RTTM emission from CTC frame posteriors.

Re-owns the reference's CTC-spike → RTTM mechanism
(``stac-st/inference.py:44-84``): the encoder's CTC head emits frame-level
posteriors at 25 Hz (4× conv downsampling of 100 Hz fbank —
``inference.py:48``); frames whose argmax is the ``[turn]`` / ``[xt]`` token
become time-aligned speaker-change / cross-talk events. Utterance ids carry
absolute start times in centiseconds as the third '-'-separated field
(``inference.py:69``).

TPU-native note: the argmax + token comparison runs on device inside the
jitted eval forward; only the tiny boolean hit mask crosses to host.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

__all__ = ["extract_turn_events", "rttm_lines", "DOWNSAMPLING"]

DOWNSAMPLING = 25  # encoder frames per second (100 Hz fbank / 4x conv)


def extract_turn_events(
    ids: Sequence[str],
    ctc_argmax: np.ndarray,
    token_ids: Dict[str, int],
    downsampling: int = DOWNSAMPLING,
) -> Dict[str, List[str]]:
    """ctc_argmax: (B, T) frame argmax ids. Returns {name: [rttm lines]}."""
    out: Dict[str, List[str]] = {name: [] for name in token_ids}
    frame = 1.0 / downsampling
    for b, utt_id in enumerate(ids):
        parts = utt_id.split("-")
        try:
            abs_start = int(parts[2]) / 100.0
        except (IndexError, ValueError):
            abs_start = 0.0
        for name, token in token_ids.items():
            hits = np.nonzero(ctc_argmax[b] == token)[0]
            for t in hits:
                start = abs_start + t * frame
                out[name].append(
                    f"SPEAKER {utt_id} 1 {start:.3f} {frame} "
                    f"<NA> <NA> SPK1 <NA> <NA>"
                )
    return out


def rttm_lines(events: Dict[str, List[str]], name: str) -> List[str]:
    return events.get(name, [])
