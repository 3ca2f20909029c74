"""Cross-validation of the tokenizer against INDEPENDENT implementations.

The reference contract (``stac-st/dataio_and_utils.py:40-67``) is a real
SentencePiece BPE model; our tokenizer claims (a) SentencePiece ``.model``
wire-format compatibility and (b) SentencePiece bpe_model encode semantics.
Neither ``sentencepiece`` itself is installed in this image, so certify both
claims against independent third-party code that is:

* (a) Google's official ``ModelProto`` schema, via the generated bindings
  bundled with ``transformers`` — if our hand-rolled wire writer emitted
  anything malformed, the official parser would disagree or fail;
* (b) the HuggingFace ``tokenizers`` Rust BPE — with per-piece scores
  mapped to merge ranks (our scores are unique ``-index`` values, the real
  SentencePiece BPE convention), score-greedy merging and rank-based
  merging are the same algorithm, so encodings must match token for token.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import make_corpus, train_fixture_tokenizer  # noqa: E402

from stac_st_tpu.tokenizer.bpe import BpeEncoder, normalize_text
from stac_st_tpu.tokenizer.spm_model import (
    PIECE_CONTROL,
    PIECE_NORMAL,
    PIECE_UNKNOWN,
    PIECE_USER_DEFINED,
    SpmModel,
)

SENTENCES = [
    "hola que tal",
    "[es] buenos dias [turn] hello there [xt]",
    "the quick brown fox jumps over the lazy dog",
    "uno dos tres cuatro cinco seis",
    "[en] mixed case WORDS and   extra   spaces",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tok_ext"))
    _, _, joint_json = make_corpus(root, n_utts=12, seconds=0.4)
    sp, model_path = train_fixture_tokenizer(root, joint_json, vocab=150)
    return model_path


def test_model_parses_with_official_proto_schema(trained):
    """Our .model bytes parse under Google's ModelProto schema and agree
    field-for-field with our own reader."""
    pb = pytest.importorskip("transformers.utils.sentencepiece_model_pb2_new")

    raw = open(trained, "rb").read()
    official = pb.ModelProto()
    official.ParseFromString(raw)

    ours = SpmModel.load(trained)
    assert len(official.pieces) == len(ours.pieces) > 0

    type_map = {
        PIECE_NORMAL: pb.ModelProto.SentencePiece.NORMAL,
        PIECE_UNKNOWN: pb.ModelProto.SentencePiece.UNKNOWN,
        PIECE_CONTROL: pb.ModelProto.SentencePiece.CONTROL,
        PIECE_USER_DEFINED: pb.ModelProto.SentencePiece.USER_DEFINED,
    }
    for off, (theirs, mine) in enumerate(zip(official.pieces, ours.pieces)):
        assert theirs.piece == mine.piece, off
        assert theirs.score == pytest.approx(mine.score), off
        assert theirs.type == type_map[mine.type], off

    # the reference id contract: unk=0, bos=1, eos=2 as control/unknown
    assert official.pieces[0].type == pb.ModelProto.SentencePiece.UNKNOWN
    assert official.pieces[1].type == pb.ModelProto.SentencePiece.CONTROL
    assert official.pieces[2].type == pb.ModelProto.SentencePiece.CONTROL


def test_reserialization_is_byte_identical(trained):
    """load -> save round-trips the exact bytes (unknown fields preserved)."""
    raw = open(trained, "rb").read()
    assert SpmModel.from_bytes(raw).to_bytes() == raw


def _hf_bpe_from(model: SpmModel):
    """Build a HuggingFace `tokenizers` BPE from our pieces + scores.

    Scores are unique -index values, so score order == merge-rank order;
    every two-way split of a piece whose halves are themselves pieces is a
    legal merge producing it, ranked by the piece's own score (this is how
    transformers' SentencePieceExtractor converts real SP BPE models too).
    """
    tokenizers = pytest.importorskip("tokenizers")

    vocab = {}
    scores = {}
    for idx, p in enumerate(model.pieces):
        if p.piece not in vocab:
            vocab[p.piece] = idx
            scores[p.piece] = p.score
    merges = []
    for piece, score in scores.items():
        if len(piece) < 2:
            continue
        for i in range(1, len(piece)):
            l, r = piece[:i], piece[i:]
            if l in vocab and r in vocab:
                merges.append((score, (l, r)))
    merges = [pair for _, pair in sorted(merges, key=lambda t: -t[0])]
    return tokenizers.models.BPE(
        vocab=vocab, merges=merges, unk_token="<unk>", fuse_unk=False
    )


def test_encode_matches_hf_tokenizers_bpe(trained):
    """Token-for-token agreement with the independent Rust BPE on every
    non-user-defined segment of the test sentences."""
    model = SpmModel.load(trained)
    enc = BpeEncoder(model)
    hf = _hf_bpe_from(model)

    checked_segments = 0
    for sent in SENTENCES:
        norm = normalize_text(sent)
        for segment, is_uds in enc._split_user_defined(norm):
            if is_uds or not segment:
                continue
            ours = enc._bpe_segment(segment)
            theirs = [t.id for t in hf.tokenize(segment)]
            assert ours == theirs, (sent, segment)
            checked_segments += 1
    assert checked_segments >= 5


def test_full_sentence_ids_match_hf_pipeline(trained):
    """End-to-end encode (normalization + user-defined splitting + BPE)
    agrees with the HF model driven over the same segment stream."""
    model = SpmModel.load(trained)
    enc = BpeEncoder(model)
    hf = _hf_bpe_from(model)

    for sent in SENTENCES:
        norm = normalize_text(sent)
        expected = []
        for segment, is_uds in enc._split_user_defined(norm):
            if is_uds:
                expected.append(enc.piece_to_id(segment))
            elif segment:
                expected.extend(t.id for t in hf.tokenize(segment))
        assert enc.encode_as_ids(sent) == expected, sent
