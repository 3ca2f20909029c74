"""Whisper baseline runner (HF transformers) over the frozen manifests.

Re-owns ``evaluations/whisper/eval_whisper.py``: decode each manifest
utterance with a Whisper checkpoint (tiny→medium), forcing the (language,
task) decoder prompt, Fisher-style hypothesis cleanup, 4-ref BLEU / WER with
per-conversation reporting, and the reference's >125 % WER outlier skip
(``eval_whisper.py:495-498``).

This environment has no network egress, so the checkpoint must be a local
path (``model_path``); the runner gates cleanly when absent. Whisper here is
a *baseline*, not a framework component — it runs on host CPU/GPU via
torch, exactly as in the reference.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional

import numpy as np

from ..data.audio import read_audio
from ..prep.cleaning import clean_transcription, clean_translation
from ..utils.metrics import BLEUStats, ErrorRateStats

logger = logging.getLogger(__name__)

__all__ = ["run_whisper_baseline"]

WER_OUTLIER_PCT = 125.0


def run_whisper_baseline(
    manifest_path: str,
    model_path: str,
    task: str = "transcribe",       # transcribe | translate
    language: str = "es",
    out_dir: Optional[str] = None,
    max_utterances: Optional[int] = None,
) -> Dict[str, float]:
    """Returns {"WER": ...} or {"BLEU": ...} summary for the manifest."""
    try:
        import torch
        from transformers import WhisperForConditionalGeneration, WhisperProcessor
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError(f"transformers/torch unavailable: {exc}")
    if not os.path.isdir(model_path) and not os.path.isfile(model_path):
        raise FileNotFoundError(
            f"whisper checkpoint not found at {model_path!r}; this "
            "environment has no network egress — download the model "
            "elsewhere and point model_path at it"
        )

    processor = WhisperProcessor.from_pretrained(model_path)
    model = WhisperForConditionalGeneration.from_pretrained(model_path)
    model.eval()
    forced_ids = processor.get_decoder_prompt_ids(
        language=language, task=task
    )

    with open(manifest_path) as f:
        data = json.load(f)

    bleu = BLEUStats()
    wer = ErrorRateStats()
    rows: List[List[str]] = []
    clean = clean_translation if task == "translate" else clean_transcription
    for i, (uid, entry) in enumerate(data.items()):
        if max_utterances is not None and i >= max_utterances:
            break
        wavs = entry["wav"].split()
        sig = np.concatenate(
            [read_audio(w, sample_rate=16000)[0] for w in wavs]
        )
        inputs = processor(
            sig, sampling_rate=16000, return_tensors="pt"
        ).input_features
        with torch.no_grad():
            generated = model.generate(
                inputs, forced_decoder_ids=forced_ids, max_new_tokens=256
            )
        hyp = clean(processor.batch_decode(
            generated, skip_special_tokens=True
        )[0])
        ref = (
            entry.get("translation_0", "")
            if task == "translate" else entry.get("transcription", "")
        )
        rows.append([uid, ref, hyp])
        if task == "translate":
            bleu.append([uid], [hyp], [[ref]])
        else:
            detail_wer = ErrorRateStats()
            detail_wer.append([uid], [hyp.split()], [ref.split()])
            if detail_wer.summarize("error_rate") > WER_OUTLIER_PCT:
                logger.warning("skipping outlier %s (WER > %.0f%%)",
                               uid, WER_OUTLIER_PCT)
                continue
            wer.append([uid], [hyp.split()], [ref.split()])

    summary: Dict[str, float] = {}
    if task == "translate":
        summary["BLEU"] = bleu.summarize("BLEU")
    else:
        summary["WER"] = wer.summarize("error_rate")

    # per-conversation breakdown (ids share the prefix before the first
    # '-' — reference eval_whisper reports per conversation, :439-516)
    per_conv: Dict[str, Dict[str, list]] = {}
    for uid, ref, hyp in rows:
        conv = uid.split("-")[0]
        per_conv.setdefault(conv, {"refs": [], "hyps": [], "ids": []})
        per_conv[conv]["refs"].append(ref)
        per_conv[conv]["hyps"].append(hyp)
        per_conv[conv]["ids"].append(uid)
    conv_scores: Dict[str, float] = {}
    for conv, group in per_conv.items():
        if task == "translate":
            m = BLEUStats()
            m.append(group["ids"], group["hyps"], [group["refs"]])
            conv_scores[conv] = m.summarize("BLEU")
        else:
            m = ErrorRateStats()
            m.append(group["ids"], [h.split() for h in group["hyps"]],
                     [r.split() for r in group["refs"]])
            conv_scores[conv] = m.summarize("error_rate")

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        base = os.path.splitext(os.path.basename(manifest_path))[0]
        with open(os.path.join(out_dir, f"whisper_{task}_{base}.json"),
                  "w") as f:
            json.dump({"summary": summary, "per_conversation": conv_scores,
                       "outputs": rows}, f, indent=2, ensure_ascii=False)
    summary["per_conversation"] = conv_scores
    return summary
