"""pyannote speaker-change baseline (gated; RTTM plumbing is first-party).

Re-owns the glue of ``evaluations/pyannote/eval_pyannote.py``: run pyannote's
``segmentation`` model (VAD + speaker-change peak detection) or the full
``speaker-diarization`` pipeline over conversation wavs, emit RTTM, and
score it with the same tolerance-grid F1 scorer as the model's CTC-spike
events (:mod:`stac_st_tpu.eval.speaker_change`).

``pyannote.audio`` is not installed in this image (and needs an HF token at
model-fetch time); the entry point gates with a clear error while keeping
the downstream RTTM/F1 path — which is framework code — fully usable with
any externally produced RTTM.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)

__all__ = ["run_pyannote_baseline", "rttm_from_pyannote_annotation"]


def rttm_from_pyannote_annotation(annotation, uri: str) -> List[str]:
    """pyannote Annotation -> RTTM lines (works with any segment iterable
    of (start, duration, label))."""
    lines = []
    try:
        items = [
            (seg.start, seg.duration, label)
            for seg, _, label in annotation.itertracks(yield_label=True)
        ]
    except AttributeError:
        items = list(annotation)
    for start, duration, label in items:
        lines.append(
            f"SPEAKER {uri} 1 {start:.3f} {duration:.3f} "
            f"<NA> <NA> {label} <NA> <NA>"
        )
    return lines


def run_pyannote_baseline(
    wav_paths: List[str],
    mode: str = "segmentation",   # segmentation | diarization
    model_path: Optional[str] = None,
    auth_token: Optional[str] = None,
) -> Dict[str, List[str]]:
    """Returns {wav_path: rttm_lines}. Requires pyannote.audio installed and
    a local/authorized checkpoint (no network egress here)."""
    try:
        from pyannote.audio import Model, Pipeline  # type: ignore
    except ImportError as exc:
        raise RuntimeError(
            "pyannote.audio is not installed in this environment; run this "
            "baseline where it is available, or feed an external RTTM "
            "directly into stac_st_tpu.eval.speaker_change "
            f"(import error: {exc})"
        )
    results: Dict[str, List[str]] = {}
    if mode == "diarization":
        pipeline = Pipeline.from_pretrained(
            model_path or "pyannote/speaker-diarization",
            use_auth_token=auth_token,
        )
        for wav in wav_paths:
            annotation = pipeline(wav)
            results[wav] = rttm_from_pyannote_annotation(annotation, wav)
    else:
        from pyannote.audio.pipelines import SpeakerSegmentation  # type: ignore

        model = Model.from_pretrained(
            model_path or "pyannote/segmentation", use_auth_token=auth_token
        )
        pipeline = SpeakerSegmentation(segmentation=model)
        for wav in wav_paths:
            annotation = pipeline(wav)
            results[wav] = rttm_from_pyannote_annotation(annotation, wav)
    return results
