"""CoVoST2 preparation: inject translations into CommonVoice manifests.

Re-owns ``datasets/covost2`` (reference ``convert_covost_splits_to_json.py``
+ ``get_covost_splits.py``): the CoVoST2 release ships per-pair TSVs
(``covost_v2.<src>_<tgt>.tsv`` with columns path / translation / split)
keyed by CommonVoice clip paths. For each pair (en_de, de_en, es_en, fr_en
in the reference — any pair here), join against the prepared CV manifest,
flip the entry to ``task: translation`` with the cleaned translation as
``translation_0``, and emit per-split ST manifests.
"""

from __future__ import annotations

import csv
import json
import logging
import os
from typing import Dict

from .cleaning import clean_translation

logger = logging.getLogger(__name__)

__all__ = ["prepare_covost"]


def _read_covost_tsv(path: str) -> Dict[str, Dict[str, str]]:
    """path(clip) -> {translation, split}."""
    out: Dict[str, Dict[str, str]] = {}
    with open(path, encoding="utf-8") as f:
        for row in csv.DictReader(f, delimiter="\t", quoting=csv.QUOTE_NONE):
            out[row["path"]] = {
                "translation": row.get("translation", ""),
                "split": row.get("split", ""),
            }
    return out


def prepare_covost(
    covost_tsv: str,
    cv_manifest: str,
    save_folder: str,
    source_lang: str,
    target_lang: str,
) -> Dict[str, str]:
    """Join one CoVoST pair TSV with a CV 'all' manifest → ST manifests."""
    pairs = _read_covost_tsv(covost_tsv)
    with open(cv_manifest) as f:
        cv_data = json.load(f)

    by_split: Dict[str, Dict[str, Dict]] = {}
    missing = 0
    for uid, entry in cv_data.items():
        clip = os.path.basename(entry["wav"])
        for candidate in (clip, os.path.splitext(clip)[0] + ".mp3"):
            if candidate in pairs:
                info = pairs[candidate]
                break
        else:
            missing += 1
            continue
        translation = clean_translation(info["translation"])
        if not translation:
            continue
        st_entry = dict(entry)
        st_entry["task"] = "translation"
        st_entry["source_lang"] = source_lang
        st_entry["target_lang"] = target_lang
        st_entry["translation_0"] = translation
        st_entry["transcription_and_translation"] = (
            f"{st_entry.get('transcription', '')}\n{translation}"
        )
        split = info["split"] or "train"
        new_uid = uid.replace("-asr", "") + "-st"
        by_split.setdefault(split, {})[new_uid] = st_entry

    pair = f"{source_lang}_{target_lang}"
    out_dir = os.path.join(save_folder, f"covost_{pair}")
    os.makedirs(out_dir, exist_ok=True)
    outputs = {}
    for split, entries in by_split.items():
        path = os.path.join(out_dir, f"{split}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(entries, f, indent=2, ensure_ascii=False)
        outputs[split] = path
        logger.info("covost %s/%s: %d utterances", pair, split, len(entries))
    if missing:
        logger.info("covost %s: %d CV clips had no pair entry", pair, missing)
    return outputs
