"""Evaluation harness (L7): speaker-change metrics, RTTM tooling, baselines."""

from .speaker_change import (
    ChangePointMetrics,
    evaluate_speaker_change,
    score_change_points,
)

__all__ = [
    "ChangePointMetrics",
    "evaluate_speaker_change",
    "score_change_points",
]
