"""Aligned ref/hyp RTTM construction for long-form scoring.

Re-owns ``evaluations/vad_shas/fix_RTTM.py`` (and the pyannote variant): the
model emits RTTM events on each utterance's absolute clock (utterance ids
encode centisecond offsets, ``uid-ch-start-end``); the ground truth lives in
the manifest's ``segments_*`` fields. Both are replayed onto one common
timeline with a fixed inter-utterance spacer (5 s in the reference) so
downstream tolerance scoring sees consistent clocks.
"""

from __future__ import annotations

import json
from typing import Dict, List, Tuple

__all__ = ["build_aligned_rttm", "write_rttm"]

SPACER_SECONDS = 5.0


def _utt_bounds(uid: str) -> Tuple[float, float]:
    parts = uid.split("-")
    try:
        return int(parts[2]) / 100.0, int(parts[3].split("-")[0]) / 100.0
    except (IndexError, ValueError):
        return 0.0, 0.0


def build_aligned_rttm(
    manifest_path: str,
    hyp_events: Dict[str, List[float]],
    spacer: float = SPACER_SECONDS,
) -> Tuple[List[str], List[str]]:
    """Returns (ref_lines, hyp_lines) on the common spaced timeline.

    hyp_events: per-utterance change times relative to the utterance start
    (see :func:`..eval.speaker_change.hyp_changes_from_rttm`).
    """
    with open(manifest_path) as f:
        data = json.load(f)

    ref_lines: List[str] = []
    hyp_lines: List[str] = []
    offset = 0.0
    for uid in sorted(data):
        entry = data[uid]
        duration = float(entry.get("duration", 0.0))
        starts = entry.get("segments_start") or []
        durations = entry.get("segments_duration") or []
        channels = entry.get("segments_channel") or []
        for i, start in enumerate(starts):
            dur = durations[i] if i < len(durations) else 0.1
            spk = f"SPK{channels[i] if i < len(channels) else 0}"
            ref_lines.append(
                f"SPEAKER {uid} 1 {offset + float(start):.3f} {dur:.3f} "
                f"<NA> <NA> {spk} <NA> <NA>"
            )
        for t in hyp_events.get(uid, []):
            hyp_lines.append(
                f"SPEAKER {uid} 1 {offset + float(t):.3f} 0.040 "
                f"<NA> <NA> SPK1 <NA> <NA>"
            )
        offset += duration + spacer
    return ref_lines, hyp_lines


def write_rttm(lines: List[str], path: str) -> None:
    with open(path, "w") as f:
        for line in lines:
            f.write(line + "\n")
