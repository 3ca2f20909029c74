"""BPE tokenizer training (SentencePiece-trainer-compatible surface).

Re-owns the reference's tokenizer pipeline
(``stac-st/train_tokenizer.py`` + SpeechBrain's SentencePiece wrapper,
``hparams/train_bpe_5k_special_prefix.xx_to_xx.yaml:32-43``):

* reads the ``annotation_read`` field (e.g. ``transcription_and_translation``)
  from a JSON manifest;
* trains a BPE vocab of ``vocab_size`` pieces with ``user_defined_symbols``
  (the language/turn/xt tokens) pinned directly after the control pieces,
  yielding the frozen id contract <unk>=0 <s>=1 </s>=2, first user symbol=3...
  (reference ``transformer_multitask.yaml:138-149``);
* saves ``{model_dir}/{vocab_size}_{model_type}.model`` (+ ``.vocab``) in
  real SentencePiece wire format (see :mod:`..tokenizer.spm_model`).

Training algorithm: classic BPE over word-frequency counts (words carry the
``▁`` space marker), final pieces sorted by frequency with scores ``-index``
— the same score convention real SentencePiece BPE models use, so encoding
behaves identically whether a model came from here or from the C++ trainer.

Note: the reference yaml expands ``user_defined_symbols`` to
``"[es],[en],[turn],[xt],[es],[en]"`` (duplicated languages); real
SentencePiece rejects duplicate symbols, so we de-duplicate preserving order
and log a warning (behavioral-fidelity note in SURVEY.md §7.4).
"""

from __future__ import annotations

import json
import logging
import os
from collections import Counter
from typing import Dict, Iterable, List, Optional, Tuple

from .bpe import SPACE, normalize_text
from .spm_model import (
    PIECE_CONTROL,
    PIECE_NORMAL,
    PIECE_UNKNOWN,
    PIECE_USER_DEFINED,
    Piece,
    SpmModel,
)

logger = logging.getLogger(__name__)

__all__ = ["train_bpe", "SentencePiece"]


def _iter_words(
    lines: Iterable[str], user_defined: List[str]
) -> Counter:
    """Word-frequency counts with ▁ markers; user symbols removed."""
    counts: Counter = Counter()
    for line in lines:
        for sym in user_defined:
            line = line.replace(sym, " ")
        norm = normalize_text(line)
        if not norm:
            continue
        # normalize_text escapes every space to ▁ and adds a dummy prefix, so
        # words are exactly the ▁-prefixed runs.
        for word in norm.split(SPACE):
            if word:
                counts[SPACE + word] += 1
    return counts


def train_bpe(
    lines: Iterable[str],
    vocab_size: int = 5000,
    user_defined_symbols: Optional[List[str]] = None,
    unk_id: int = 0,
    bos_id: int = 1,
    eos_id: int = 2,
    pad_id: int = -1,
    character_coverage: float = 1.0,
) -> SpmModel:
    """Train a BPE model; returns a :class:`SpmModel` ready to save."""
    user_defined = []
    seen = set()
    for sym in user_defined_symbols or []:
        if sym in seen:
            logger.warning("duplicate user_defined_symbol %r dropped", sym)
            continue
        seen.add(sym)
        user_defined.append(sym)

    word_freq = _iter_words(lines, user_defined)

    # --- character alphabet with coverage ---
    char_freq: Counter = Counter()
    for word, freq in word_freq.items():
        for ch in word:
            char_freq[ch] += freq
    total_chars = sum(char_freq.values()) or 1
    covered: List[str] = []
    running = 0
    for ch, freq in char_freq.most_common():
        covered.append(ch)
        running += freq
        if running / total_chars >= character_coverage and len(covered) > 1:
            break
    alphabet = set(covered)
    if SPACE not in alphabet:
        alphabet.add(SPACE)

    # words as tuples of in-alphabet symbols (OOV chars dropped from training)
    words: Dict[Tuple[str, ...], int] = {}
    for word, freq in word_freq.items():
        symbols = tuple(ch for ch in word if ch in alphabet)
        if symbols:
            words[symbols] = words.get(symbols, 0) + freq

    n_specials = 3 + len(user_defined)  # unk/bos/eos + user symbols
    n_mergeable = vocab_size - n_specials - len(alphabet)
    if n_mergeable < 0:
        raise ValueError(
            f"vocab_size={vocab_size} too small for alphabet "
            f"({len(alphabet)}) + specials ({n_specials})"
        )

    # --- merge loop ---
    merged_freq: Counter = Counter()  # piece -> corpus frequency when created
    for _ in range(n_mergeable):
        pair_freq: Counter = Counter()
        for symbols, freq in words.items():
            for a, b in zip(symbols, symbols[1:]):
                pair_freq[(a, b)] += freq
        if not pair_freq:
            break
        # deterministic: max freq, ties by lexicographic pair
        (a, b), freq = min(
            pair_freq.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < 2:
            break
        new_sym = a + b
        merged_freq[new_sym] = freq
        new_words: Dict[Tuple[str, ...], int] = {}
        for symbols, wfreq in words.items():
            out: List[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == a
                    and symbols[i + 1] == b
                ):
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + wfreq
        words = new_words

    # --- assemble pieces: specials, then freq-sorted (chars + merges) ---
    pieces: List[Piece] = [
        Piece("<unk>", 0.0, PIECE_UNKNOWN),
        Piece("<s>", 0.0, PIECE_CONTROL),
        Piece("</s>", 0.0, PIECE_CONTROL),
    ]
    for sym in user_defined:
        pieces.append(Piece(sym, 0.0, PIECE_USER_DEFINED))

    body: Counter = Counter()
    for ch in alphabet:
        body[ch] = char_freq.get(ch, 0)
    body.update(merged_freq)
    ordered = sorted(body.items(), key=lambda kv: (-kv[1], kv[0]))
    for rank, (piece, _freq) in enumerate(ordered):
        pieces.append(Piece(piece, float(-(rank + 1)), PIECE_NORMAL))

    if unk_id != 0 or bos_id != 1 or eos_id != 2 or pad_id != -1:
        raise NotImplementedError(
            "only the reference id layout unk=0 bos=1 eos=2 pad=-1 is "
            "supported (transformer_multitask.yaml:138-141)"
        )
    return SpmModel(pieces=pieces)


class SentencePiece:
    """SpeechBrain-style training wrapper (the YAML-facing class).

    Mirrors ``speechbrain.tokenizers.SentencePiece.SentencePiece``: training
    happens at construction when the model file is missing; the trained
    processor is exposed as ``.sp`` (reference tokenizer yaml:32-43).
    """

    def __init__(
        self,
        model_dir: str,
        vocab_size: int,
        annotation_train: Optional[str] = None,
        annotation_read: Optional[str] = None,
        model_type: str = "bpe",
        char_format_input: bool = False,
        character_coverage: float = 1.0,
        user_defined_symbols: Optional[str] = None,
        bos_id: int = -1,
        eos_id: int = -1,
        unk_id: int = 0,
        pad_id: int = -1,
        annotation_list_to_check: Optional[List[str]] = None,
        annotation_format: str = "json",
        **unused_kwargs,
    ):
        if model_type != "bpe":
            raise NotImplementedError(
                f"model_type={model_type!r}: the reference uses bpe "
                "(train_bpe_5k_special_prefix.xx_to_xx.yaml:21)"
            )
        os.makedirs(model_dir, exist_ok=True)
        vocab_size = int(vocab_size)
        prefix = os.path.join(model_dir, f"{vocab_size}_{model_type}")
        self.model_path = prefix + ".model"
        self.vocab_path = prefix + ".vocab"

        if not os.path.isfile(self.model_path):
            if annotation_train is None or annotation_read is None:
                raise ValueError(
                    "annotation_train/annotation_read required to train"
                )
            symbols = (
                [s for s in user_defined_symbols.split(",") if s]
                if user_defined_symbols
                else []
            )
            lines = self._read_annotation(
                annotation_train, annotation_read, annotation_format
            )
            logger.info(
                "training %d-piece BPE on %s[%s]",
                vocab_size, annotation_train, annotation_read,
            )
            model = train_bpe(
                lines,
                vocab_size=vocab_size,
                user_defined_symbols=symbols,
                unk_id=unk_id,
                bos_id=bos_id if bos_id >= 0 else 1,
                eos_id=eos_id if eos_id >= 0 else 2,
                pad_id=pad_id,
                character_coverage=character_coverage,
            )
            model.save(self.model_path)
            with open(self.vocab_path, "w") as f:
                for p in model.pieces:
                    f.write(f"{p.piece}\t{p.score:g}\n")

        from .sentencepiece_compat import SentencePieceProcessor

        self.sp = SentencePieceProcessor()
        self.sp.load(self.model_path)

    @staticmethod
    def _read_annotation(path: str, field: str, fmt: str) -> List[str]:
        if fmt != "json":
            raise NotImplementedError("only json annotation_format supported")
        with open(path) as f:
            data = json.load(f)
        lines = []
        for entry in data.values():
            value = entry.get(field)
            if value:
                lines.append(str(value))
        return lines

    def __call__(self):  # kept callable like the partial-then-call recipe use
        return self
