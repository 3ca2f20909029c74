"""Text cleaning for conversational speech corpora.

Equivalent of the reference's Fisher-style cleaning pipeline
(``fisher_callhome_prepare.py:501-735``): LDC transcripts carry annotation
markup (``(( ))`` uncertain regions, ``<noise>``/``<laugh>`` events,
``</foreign>`` spans, slash alternations) that must be stripped, text is
lowercased, punctuation removed except apostrophes, accented uppercase
folded, and whitespace collapsed.

This is a behavioral re-implementation (same cleaning classes, documented
here), not a regex-by-regex copy; the contract is the *output* text style
the tokenizer/metrics see: lowercase, apostrophes kept, no bracketed
annotations, single spaces.
"""

from __future__ import annotations

import re
import string

__all__ = [
    "clean_transcription",
    "clean_translation",
    "normalize_punctuation",
    "remove_punctuation",
]

# punctuation set minus apostrophe (kept: contractions in es/en)
_PUNCT_NO_APOS = "".join(c for c in string.punctuation if c != "'")
_PUNCT_RE = re.compile("[" + re.escape(_PUNCT_NO_APOS) + "]")
_WS_RE = re.compile(r"\s+")

# annotation spans: (( )), ( ), [ ], < >
_PAREN_RE = re.compile(r"\([^)]*\)")
_BRACKET_RE = re.compile(r"\[[^\]]+\]")
_ANGLE_RE = re.compile(r"</?[^<>]*>")

# event words that appear bare after markup stripping
_EVENT_WORDS = (
    "noise", "laughter", "background noise", "background speech", "cough",
    "breath", "lipsmack", "sneeze",
)

_UPPER_ACCENT_FOLD = str.maketrans(
    {"Á": "á", "É": "é", "Í": "í", "Ó": "ó", "Ú": "ú", "Ñ": "ñ", "Ü": "ü"}
)
_STRAY_MARKS = str.maketrans({"¨": None, "·": None, "´": None, "¿": None,
                              "¡": None, "`": "'"})


def _collapse(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


def normalize_punctuation(text: str) -> str:
    """Strip annotation spans, normalize apostrophes, drop event labels and
    slash alternations (reference ``normalize_punctuation``)."""
    text = _PAREN_RE.sub(" ", text)
    text = _BRACKET_RE.sub(" ", text)
    text = text.replace("_", "")
    text = text.translate(_STRAY_MARKS)
    for word in _EVENT_WORDS:
        text = text.replace(word, "")
    # slash alternations: keep the first variant ("i/he" -> "i")
    text = re.sub(r"(\w+)/\w+", r"\1", text)
    text = text.replace("/", " ")
    return _collapse(text)


def remove_punctuation(text: str) -> str:
    """Remove punctuation except apostrophes; collapse whitespace."""
    text = _PUNCT_RE.sub("", text)
    return _collapse(text)


def clean_transcription(text: str) -> str:
    """LDC transcript cleaning: markup out, punctuation out, lowercase."""
    text = _ANGLE_RE.sub(" ", text)
    text = text.translate(_UPPER_ACCENT_FOLD)
    text = text.translate(_STRAY_MARKS)
    text = remove_punctuation(text)
    return _collapse(text.lower())


def clean_translation(text: str) -> str:
    """Translation-side cleaning: lowercase, inverted punctuation out."""
    text = text.strip().lower()
    text = text.translate(_STRAY_MARKS)
    text = _ANGLE_RE.sub(" ", text)
    text = remove_punctuation(text)
    return _collapse(text)
