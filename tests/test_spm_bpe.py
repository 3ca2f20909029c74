"""spm_train-fidelity tests for the BPE merge engine (spm_bpe.py).

Each test pins one behavior of SentencePiece's C++ ``bpe_model_trainer``
that a generic BPE implementation gets wrong (byte-parity requirement,
SURVEY §2.2; on-site certification via tools/verify_tokenizer.py).
"""

import sys
import os

sys.path.insert(0, os.path.dirname(__file__))

from stac_st_tpu.tokenizer.bpe import BpeEncoder, SPACE
from stac_st_tpu.tokenizer.spm_bpe import SpmBpeMergeEngine
from stac_st_tpu.tokenizer.spm_model import SpmModel
from stac_st_tpu.tokenizer.train import train_bpe


def run_engine(words, n):
    return SpmBpeMergeEngine(list(words.items())).run(n)


class TestSelectionComparator:
    def test_max_frequency_wins(self):
        # "ab" appears 3x, "cd" 2x
        merges = run_engine({"abx": 3, "cdy": 2}, 1)
        assert merges[0] == ("ab", 3)

    def test_tie_prefers_shorter_merged_string(self):
        # After "ab" (freq 3) merges in "zabq":2 + "abr":1, the pair
        # (z, ab) -> "zab" has freq 2; pair (p, q) -> "pq" freq 2 too.
        # spm picks "pq": same freq, SHORTER merged string.
        merges = run_engine({"zabq": 2, "abr": 1, "pq": 2}, 2)
        assert merges[0] == ("ab", 3)
        assert merges[1] == ("pq", 2)

    def test_tie_same_length_lexicographic(self):
        # "xy" and "ab" both freq 2, both length 2: "ab" < "xy"
        merges = run_engine({"xy": 2, "ab": 2}, 2)
        assert merges[0] == ("ab", 2)
        assert merges[1] == ("xy", 2)

    def test_no_min_frequency_cutoff(self):
        # spm merges singleton pairs too (no freq>=2 gate)
        merges = run_engine({"qrs": 1}, 2)
        assert ("qr", 1) in merges or ("rs", 1) in merges

    def test_stops_when_no_pairs_remain(self):
        merges = run_engine({"ab": 1}, 10)
        assert merges == [("ab", 1)]


class TestOverlapCounting:
    def test_overlapping_positions_both_count(self):
        # "aaa": the pair (a,a) occurs at two (overlapping) positions —
        # spm's ComputeFreq counts each valid position
        merges = run_engine({"aaa": 1, "bc": 1}, 1)
        assert merges[0] == ("aa", 2)

    def test_merge_applies_leftmost_first(self):
        # "aaaa" -> [aa][aa] (positions processed in sorted order, the
        # middle overlap invalidated), so (aa,aa) becomes available
        merges = run_engine({"aaaa": 2}, 2)
        # spm's ComputeFreq counts EVERY valid position, overlaps included:
        # "aaaa" has 3 (a,a) positions x sentence freq 2 = 6
        assert merges[0] == ("aa", 6)
        # after the aa merge the only remaining pair is (aa, aa)
        assert merges[1][0] == "aaaa"


class TestVocabLayout:
    def _model(self):
        corpus = [
            "hola que tal hola",
            "que tal que pasa",
            "[es] hola [turn] que",
        ]
        return train_bpe(
            corpus, vocab_size=64,
            user_defined_symbols=["[es]", "[en]", "[turn]", "[xt]"],
        )

    def test_meta_then_merges_then_required_chars(self):
        model = self._model()
        pieces = [p.piece for p in model.pieces]
        assert pieces[:3] == ["<unk>", "<s>", "</s>"]
        assert pieces[3:7] == ["[es]", "[en]", "[turn]", "[xt]"]
        body = pieces[7:]
        # required single chars form the TAIL of the vocab (appended
        # after the merge loop, bpe_model_trainer Train())
        n_chars = sum(1 for p in body if len(p) == 1)
        assert n_chars > 0
        assert all(len(p) == 1 for p in body[-n_chars:])
        assert all(len(p) > 1 for p in body[:-n_chars])

    def test_scores_are_negative_emission_index(self):
        model = self._model()
        body = [p for p in model.pieces[7:]]
        for i, p in enumerate(body):
            assert p.score == -float(i)

    def test_required_chars_sorted_by_freq_then_codepoint(self):
        model = self._model()
        chars = [p for p in model.pieces if len(p.piece) == 1]
        # independent recount of the corpus char frequencies (▁ markers)
        from collections import Counter
        from stac_st_tpu.tokenizer.train import _iter_words
        wf = _iter_words(
            ["hola que tal hola", "que tal que pasa", "[es] hola [turn] que"],
            ["[es]", "[en]", "[turn]", "[xt]"],
        )
        cf = Counter()
        for w, f in wf.items():
            for ch in w:
                cf[ch] += f
        expected = [c for c, _ in
                    sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))]
        assert [p.piece for p in chars] == expected


class TestTrainingEncodeConsistency:
    def test_encoder_reproduces_training_segmentation(self):
        """Score-greedy encoding must reproduce the trainer's own final
        segmentation of every training word — the property that makes
        merge-order scores THE correct spm BPE convention (the encoder
        ranks merges by score, bpe_model.cc)."""
        words = {
            SPACE + "hola": 7, SPACE + "que": 6, SPACE + "tal": 4,
            SPACE + "holgura": 2, SPACE + "quedar": 3, SPACE + "atalaya": 2,
        }
        engine = SpmBpeMergeEngine(list(words.items()))
        merges = engine.run(24)

        # final segmentation per sentence from the engine state
        final_segs = []
        for arr, _f in engine.sentences:
            final_segs.append([s.chars for s in arr if s is not None])

        # build a model the way train.py does and encode the same words
        from collections import Counter
        from stac_st_tpu.tokenizer.spm_model import (
            PIECE_CONTROL, PIECE_NORMAL, PIECE_UNKNOWN, Piece,
        )
        cf = Counter()
        for w, f in words.items():
            for ch in w:
                cf[ch] += f
        pieces = [
            Piece("<unk>", 0.0, PIECE_UNKNOWN),
            Piece("<s>", 0.0, PIECE_CONTROL),
            Piece("</s>", 0.0, PIECE_CONTROL),
        ]
        idx = 0
        for piece, _freq in merges:
            pieces.append(Piece(piece, float(-idx), PIECE_NORMAL))
            idx += 1
        for ch, _freq in sorted(cf.items(), key=lambda kv: (-kv[1], kv[0])):
            pieces.append(Piece(ch, float(-idx), PIECE_NORMAL))
            idx += 1
        enc = BpeEncoder(SpmModel(pieces=pieces))

        for (word, _f), seg in zip(words.items(), final_segs):
            got = [enc.id_to_piece(i) for i in enc._bpe_segment(word)]
            assert got == seg, (word, got, seg)
