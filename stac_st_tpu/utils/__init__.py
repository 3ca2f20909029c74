"""Utilities: metrics, logging, edit distance, seeding."""

from .edit_distance import align_edit_distance, wer_details
from .logger import FileTrainLogger
from .metrics import AccuracyStats, BLEUStats, ErrorRateStats
from .seeding import get_seed, manual_seed, root_key

__all__ = [
    "align_edit_distance", "wer_details", "FileTrainLogger",
    "AccuracyStats", "BLEUStats", "ErrorRateStats", "get_seed",
    "manual_seed", "root_key",
]
