"""Tokenizer tests: id contract, round-trips, model IO, prompt construction."""

import json

import pytest

from stac_st_tpu.tokenizer import (
    BpeEncoder,
    SentencePiece,
    SentencePieceProcessor,
    SpmModel,
    train_bpe,
)

CORPUS = [
    "hola como estas hoy [turn] hello how are you",
    "buenos dias [turn] good morning [xt] overlapping here",
    "si claro que si [turn] yes of course",
    "no lo se [turn] i do not know",
    "hasta luego amigo [turn] see you later friend",
] * 20

SYMBOLS = ["[es]", "[en]", "[turn]", "[xt]"]


@pytest.fixture(scope="module")
def model():
    return train_bpe(CORPUS, vocab_size=200, user_defined_symbols=SYMBOLS)


@pytest.fixture(scope="module")
def enc(model):
    return BpeEncoder(model)


def test_special_token_id_contract(model):
    """unk=0 bos=1 eos=2, user symbols pinned from 3 (yaml:138-149 contract)."""
    pieces = [p.piece for p in model.pieces]
    assert pieces[:3] == ["<unk>", "<s>", "</s>"]
    assert pieces[3:7] == SYMBOLS


def test_duplicate_user_symbols_deduped():
    m = train_bpe(CORPUS, vocab_size=200,
                  user_defined_symbols=["[es]", "[en]", "[es]"])
    pieces = [p.piece for p in m.pieces]
    assert pieces.count("[es]") == 1


def test_roundtrip(enc):
    text = "hola como estas"
    ids = enc.encode_as_ids(text)
    assert enc.decode_ids(ids) == text


def test_user_symbols_encode_as_single_ids(enc):
    ids = enc.encode_as_ids("[es] [turn] hola")
    assert ids[0] == enc.piece_to_id("▁")  # dummy-prefix space
    assert ids[1] == 3  # [es]
    assert enc.piece_to_id("[turn]") in ids


def test_lang_token_indexing_quirk(enc):
    """The reference reads ``encode_as_ids('[es]')[1]`` and ``[-1]``
    (dataio_and_utils.py:54 vs :240-241); both must yield the symbol id."""
    ids = enc.encode_as_ids("[es]")
    assert len(ids) == 2  # [▁, [es]]
    assert ids[1] == ids[-1] == 3


def test_model_file_roundtrip(tmp_path, model, enc):
    path = str(tmp_path / "m.model")
    model.save(path)
    loaded = SpmModel.load(path)
    assert [p.piece for p in loaded.pieces] == [p.piece for p in model.pieces]
    assert [p.type for p in loaded.pieces] == [p.type for p in model.pieces]
    enc2 = BpeEncoder(loaded)
    for line in CORPUS[:3]:
        assert enc2.encode_as_ids(line) == enc.encode_as_ids(line)


def test_processor_api(tmp_path, model):
    path = str(tmp_path / "m.model")
    model.save(path)
    sp = SentencePieceProcessor(path)
    assert sp.vocab_size() == len(model.pieces)
    ids = sp.encode_as_ids("hola hello")
    assert sp.decode_ids(ids) == "hola hello"
    assert sp.piece_to_id("[xt]") == 6


def test_speechbrain_wrapper_trains_from_json(tmp_path):
    manifest = {
        f"utt{i}": {"transcription_and_translation": line}
        for i, line in enumerate(CORPUS)
    }
    json_path = tmp_path / "data.json"
    json_path.write_text(json.dumps(manifest))
    tok = SentencePiece(
        model_dir=str(tmp_path),
        vocab_size=200,
        annotation_train=str(json_path),
        annotation_read="transcription_and_translation",
        model_type="bpe",
        user_defined_symbols="[es],[en],[turn],[xt],[es],[en]",
        bos_id=1,
        eos_id=2,
        unk_id=0,
    )
    assert tok.sp.piece_to_id("[turn]") == 5
    assert (tmp_path / "200_bpe.model").exists()
    # second construction loads instead of retraining
    tok2 = SentencePiece(model_dir=str(tmp_path), vocab_size=200)
    assert tok2.sp.vocab_size() == tok.sp.vocab_size()


def test_unknown_chars_map_to_unk(enc):
    ids = enc.encode_as_ids("日本語")
    assert all(i == 0 for i in ids if enc.id_to_piece(i) not in ("▁",))


class TestNmtNfkcNormalization:
    """Exact nmt_nfkc charsmap semantics (spm src/builder.cc
    BuildNmtNFKCMap): NFKC + NMT overrides, FF5E preserved."""

    def test_nfkc_compatibility_folding(self):
        from stac_st_tpu.tokenizer import normalize_text
        assert normalize_text("ﬁn…") == "▁fin..."  # fi-lig, ellipsis
        assert normalize_text("ａｂｃ") == "▁abc"  # fullwidth

    def test_unicode_space_family_folds_to_space(self):
        from stac_st_tpu.tokenizer import normalize_text
        # NFKC side: NBSP, EN/EM spaces, ideographic space
        assert normalize_text("a b c　d") == "▁a▁b▁c▁d"
        # NMT side: tab/newline/CR, line+paragraph seps, ogham, BOM,
        # replacement char, zero-width family (ZWSP ZWNJ ZWJ LRM RLM)
        s = ("a\tb\nc\rd e f g﻿h�"
             "i​j‌k‍l‎m‏n")
        assert normalize_text(s) == "▁" + "▁".join("abcdefghijklmn")

    def test_lower_one_eighth_block_cannot_collide_with_marker(self):
        from stac_st_tpu.tokenizer import normalize_text
        # raw U+2581 in input folds to space, so ▁ in normalized output
        # ALWAYS means word boundary (spm invariant)
        assert normalize_text("a▁b") == "▁a▁b"

    def test_control_characters_removed(self):
        from stac_st_tpu.tokenizer import normalize_text
        assert normalize_text("a\x01\x02b\x0bc\x1fd\x7fe") == "▁abcde"
        # FS/GS/RS/US are REMOVED (python str.isspace is True for them,
        # but the nmt map deletes the 0x0E-0x1F range)
        assert normalize_text("a\x1cb\x1dc") == "▁abc"
        assert normalize_text("\x01\x02") == ""

    def test_fullwidth_tilde_preserved(self):
        import unicodedata

        from stac_st_tpu.tokenizer import normalize_text
        # plain NFKC folds FF5E to ASCII '~'; nmt_nfkc erases that rule
        assert unicodedata.normalize("NFKC", "～") == "~"
        assert normalize_text("a～b") == "▁a～b"

    def test_nel_stays_in_word(self):
        from stac_st_tpu.tokenizer import normalize_text
        # U+0085 NEL has no nmt_nfkc entry: it stays put (does not
        # split words), matching spm rather than python str.isspace
        assert normalize_text("a\x85b") == "▁a\x85b"

    def test_whitespace_squeeze_and_dummy_prefix(self):
        from stac_st_tpu.tokenizer import normalize_text
        assert normalize_text("  hola   como  ") == "▁hola▁como"
        assert normalize_text("hola", add_dummy_prefix=False) == "hola"
        assert normalize_text("a  b", remove_extra_whitespaces=False,
                              add_dummy_prefix=False) == "a▁▁b"
