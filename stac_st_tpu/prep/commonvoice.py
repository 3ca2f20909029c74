"""CommonVoice 13 preparation (es/en/de/fr ASR manifests).

Re-owns ``datasets/common_voice_13`` (reference
``common_voice_prepare.py:51-381`` + ``run_prepare_commonvoice.sh:22-33``):
per-locale TSVs (``train/dev/test/validated``) → cleaned ASR manifests;
``train_validated`` = validated minus dev/test sentence ids (the
data-augmentation trick for the multilingual runs); an ``all`` union.

Audio: CV ships mp3. When no ``audio_converter`` is passed, the prep
auto-detects an external decoder (ffmpeg/sox/mpg123 —
:mod:`stac_st_tpu.prep.audio_convert`) and converts per clip; otherwise
pre-convert clips to wav (the manifests point at ``<clips>/<name>.wav``
next to the mp3). Entries whose audio is missing are dropped with a
warning, so text-side preparation (tokenizer corpora, manifest unions)
works regardless.
"""

from __future__ import annotations

import csv
import json
import logging
import os
from typing import Callable, Dict, List, Optional

from .cleaning import cv_clean_all
from ..data.audio import read_audio

logger = logging.getLogger(__name__)

__all__ = ["prepare_common_voice"]

SPLITS = ["train", "dev", "test"]


def _read_tsv(path: str) -> List[Dict[str, str]]:
    with open(path, encoding="utf-8") as f:
        return list(csv.DictReader(f, delimiter="\t"))


def _entry_for(row: Dict[str, str], clips_dir: str, locale: str,
               audio_converter: Optional[Callable],
               duration_threshold: float = 45.0) -> Optional[Dict]:
    mp3 = os.path.join(clips_dir, row["path"])
    wav = os.path.splitext(mp3)[0] + ".wav"
    if not os.path.isfile(wav):
        if audio_converter is not None and os.path.isfile(mp3):
            audio_converter(mp3, wav)
        if not os.path.isfile(wav):
            return None
    try:
        samples, rate = read_audio(wav, sample_rate=16000)
    except (ValueError, FileNotFoundError):
        return None
    duration = len(samples) / 16000.0
    if duration > duration_threshold:  # ref common_voice_prepare.py:283-285
        return None
    # Full CV chain incl. Moses stages, accent strip, ≥3-words gate
    # (ref common_voice_prepare.py:289-322; the locale string is passed to
    # the Moses stages verbatim, as the reference does)
    text = cv_clean_all(row.get("sentence", ""), locale)
    if not text or duration <= 0:
        return None
    # reference entry schema (common_voice_prepare.py:339-347): bare clip
    # key, empty translation_0
    return {
        "wav": wav,
        "duration": duration,
        "task": "transcription",
        "source_lang": locale,
        "target_lang": locale,
        "transcription": text,
        "translation_0": "",
    }


def prepare_common_voice(
    data_folder: str,
    save_folder: str,
    locale: str,
    audio_converter: Optional[Callable] = None,
    duration_threshold: float = 45.0,
) -> Dict[str, str]:
    """Prepare one locale → {save}/{locale}/{split}.json + train_validated."""
    locale_dir = os.path.join(data_folder, locale)
    clips_dir = os.path.join(locale_dir, "clips")
    out_dir = os.path.join(save_folder, locale)
    os.makedirs(out_dir, exist_ok=True)
    if audio_converter is None:
        from .audio_convert import default_mp3_converter

        audio_converter = default_mp3_converter()

    outputs: Dict[str, str] = {}
    split_rows: Dict[str, List[Dict[str, str]]] = {}
    for split in SPLITS:
        tsv = os.path.join(locale_dir, f"{split}.tsv")
        split_rows[split] = _read_tsv(tsv) if os.path.isfile(tsv) else []

    validated_tsv = os.path.join(locale_dir, "validated.tsv")
    validated_rows = _read_tsv(validated_tsv) if os.path.isfile(
        validated_tsv
    ) else []
    heldout = {
        row["path"]
        for split in ("dev", "test")
        for row in split_rows[split]
    }
    split_rows["train_validated"] = [
        row for row in validated_rows if row["path"] not in heldout
    ]

    all_entries: Dict[str, Dict] = {}
    split_entries: Dict[str, Dict] = {}
    for split, rows in split_rows.items():
        if not rows:
            continue
        entries: Dict[str, Dict] = {}
        skipped = 0
        for row in rows:
            uid = os.path.splitext(os.path.basename(row["path"]))[0]
            entry = _entry_for(row, clips_dir, locale, audio_converter,
                               duration_threshold)
            if entry is None:
                skipped += 1
                continue
            entries[uid] = entry
        if skipped:
            logger.warning("%s/%s: %d clips skipped (no decodable audio)",
                           locale, split, skipped)
        path = os.path.join(out_dir, f"{split}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(entries, f, indent=2, ensure_ascii=False)
        outputs[split] = path
        split_entries[split] = entries
        logger.info("%s/%s: %d utterances", locale, split, len(entries))

    # `all` = dev + test + train_validated (the reference's jq -s add over
    # exactly those three — run_prepare_commonvoice.sh:48)
    for split in ("dev", "test", "train_validated"):
        all_entries.update(split_entries.get(split, {}))
    all_path = os.path.join(out_dir, "all.json")
    with open(all_path, "w", encoding="utf-8") as f:
        json.dump(all_entries, f, indent=2, ensure_ascii=False)
    outputs["all"] = all_path
    return outputs
