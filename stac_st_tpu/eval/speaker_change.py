"""Speaker-change detection metrics: P/R/F1/MDR/FAR over tolerance windows.

Re-owns the reference scorer (``evaluations/vad_shas/get_f1_score.py``,
SURVEY.md §2.1): ground-truth change points come from the multi-turn
manifests' ``segments_start`` metadata (one change per internal segment
boundary); hypothesis change points come from the model's CTC-spike RTTM
(``stac-st/inference.py:54-84``). A hypothesis event matches an unmatched
reference event when within ``tolerance`` seconds (greedy nearest-first, the
reference's Hungarian-free matching); the standard tolerance grid is
{0.1, 0.2, 0.25, 0.5, 0.8, 1.0} s (``eval_speaker_change.sh:55-67``).

Metrics: Precision, Recall, F1, MDR (missed detection rate = 1−R) and FAR
(false alarm rate = 1−P).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, Iterable, List, Sequence

__all__ = ["ChangePointMetrics", "score_change_points",
           "evaluate_speaker_change", "TOLERANCE_GRID",
           "gt_changes_from_manifest", "hyp_changes_from_rttm"]

TOLERANCE_GRID = (0.1, 0.2, 0.25, 0.5, 0.8, 1.0)


@dataclass
class ChangePointMetrics:
    tolerance: float
    true_positives: int
    false_positives: int
    false_negatives: int

    @property
    def precision(self) -> float:
        denom = self.true_positives + self.false_positives
        return self.true_positives / denom if denom else 0.0

    @property
    def recall(self) -> float:
        denom = self.true_positives + self.false_negatives
        return self.true_positives / denom if denom else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0

    @property
    def mdr(self) -> float:
        return 1.0 - self.recall

    @property
    def far(self) -> float:
        return 1.0 - self.precision

    def as_dict(self) -> Dict[str, float]:
        return {
            "tolerance": self.tolerance,
            "precision": self.precision,
            "recall": self.recall,
            "f1": self.f1,
            "MDR": self.mdr,
            "FAR": self.far,
            "TP": self.true_positives,
            "FP": self.false_positives,
            "FN": self.false_negatives,
        }


def _merge_close(events: Sequence[float], min_gap: float = 0.0) -> List[float]:
    """Collapse change events closer than min_gap (GT region merging)."""
    out: List[float] = []
    for t in sorted(events):
        if out and t - out[-1] < min_gap:
            continue
        out.append(t)
    return out


def score_change_points(
    reference: Sequence[float],
    hypothesis: Sequence[float],
    tolerance: float,
) -> ChangePointMetrics:
    """Greedy nearest-first matching within ±tolerance seconds."""
    ref = sorted(reference)
    hyp = sorted(hypothesis)
    matched_ref = [False] * len(ref)
    tp = 0
    for h in hyp:
        best_idx, best_dist = -1, tolerance + 1e-9
        for i, r in enumerate(ref):
            if matched_ref[i]:
                continue
            d = abs(h - r)
            if d <= tolerance and d < best_dist:
                best_idx, best_dist = i, d
        if best_idx >= 0:
            matched_ref[best_idx] = True
            tp += 1
    fp = len(hyp) - tp
    fn = len(ref) - tp
    return ChangePointMetrics(tolerance, tp, fp, fn)


def gt_changes_from_manifest(manifest_path: str) -> Dict[str, List[float]]:
    """Per-utterance GT change times (seconds within the utterance clock),
    from the multi-turn segments metadata — a change occurs at the start of
    every segment after the first whose channel differs from the previous."""
    with open(manifest_path) as f:
        data = json.load(f)
    out: Dict[str, List[float]] = {}
    for uid, entry in data.items():
        starts = entry.get("segments_start") or []
        channels = entry.get("segments_channel") or []
        changes = [
            float(starts[i])
            for i in range(1, len(starts))
            if i >= len(channels) or channels[i] != channels[i - 1]
        ]
        out[uid] = changes
    return out


def hyp_changes_from_rttm(
    rttm_path: str, relative_to_utt: bool = True, merge_gap: float = 0.2
) -> Dict[str, List[float]]:
    """Parse model RTTM (``SPEAKER <utt> 1 <start> <dur> ...``) into
    per-utterance change times; consecutive frame spikes closer than
    merge_gap collapse into one event."""
    raw: Dict[str, List[float]] = {}
    with open(rttm_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 5 or parts[0] != "SPEAKER":
                continue
            utt_id = parts[1]
            start = float(parts[3])
            if relative_to_utt:
                try:
                    start -= int(utt_id.split("-")[2]) / 100.0
                except (IndexError, ValueError):
                    pass
            raw.setdefault(utt_id, []).append(start)
    return {uid: _merge_close(ts, merge_gap) for uid, ts in raw.items()}


def evaluate_speaker_change(
    reference: Dict[str, List[float]],
    hypothesis: Dict[str, List[float]],
    tolerances: Iterable[float] = TOLERANCE_GRID,
) -> List[ChangePointMetrics]:
    """Corpus-level metrics at each tolerance (events pooled per utterance)."""
    results = []
    for tol in tolerances:
        tp = fp = fn = 0
        for uid in set(reference) | set(hypothesis):
            m = score_change_points(
                reference.get(uid, []), hypothesis.get(uid, []), tol
            )
            tp += m.true_positives
            fp += m.false_positives
            fn += m.false_negatives
        results.append(ChangePointMetrics(tol, tp, fp, fn))
    return results
