"""The learnable synthetic corpus (stac_st_tpu.data.synth): schema,
determinism, audio-text consistency, and tokenizer compatibility.

This corpus backs the flagship-shape quality run (the d256/12+6/vocab-5000
protocol numbers in docs/PERF.md), so its invariants are load-bearing:
the audio must deterministically encode the words, the manifests must be
reference-schema, and the turn metadata must line up with the markers."""

import json

import numpy as np
import pytest

from stac_st_tpu.data.synth import (
    SR,
    build_lexicon,
    make_synth_conversations,
    make_synth_corpus,
    render_words,
    synth_utterance,
    write_mixed_manifest,
    _zipf_weights,
)


@pytest.fixture(scope="module")
def lex():
    return build_lexicon(200, seed=0)


def test_lexicon_deterministic_and_bijective(lex):
    lex2 = build_lexicon(200, seed=0)
    assert lex.words == lex2.words
    es = [lex.es(i) for i in range(len(lex))]
    en = [lex.en(i) for i in range(len(lex))]
    # word-level translation is a bijection: distinct words on both sides
    assert len(set(es)) == len(es)
    assert len(set(en)) == len(en)
    # the two alphabets never collide (hyp language is identifiable)
    assert not set(es) & set(en)


def test_audio_encodes_words_not_noise(lex):
    """Same words -> near-identical spectra; different words -> different.
    (The test-fixture corpus fails exactly this property.)"""
    rng = lambda s: np.random.default_rng(s)  # noqa: E731
    a = render_words(lex, [3, 5], speaker=2, rng=rng(0))
    b = render_words(lex, [3, 5], speaker=2, rng=rng(1))
    c = render_words(lex, [7, 9], speaker=2, rng=rng(0))
    n = min(len(a), len(b), len(c))

    def spec(x):
        f = np.abs(np.fft.rfft(x[:n] * np.hanning(n)))
        return f / (np.linalg.norm(f) + 1e-9)

    same = float(spec(a) @ spec(b))
    diff = float(spec(a) @ spec(c))
    assert same > 0.7, same  # amplitude jitter + detune cost ~0.2
    assert diff < 0.5 * same, (same, diff)


def test_speaker_pitch_keeps_classes_separable(lex):
    """Extreme speakers shift pitch less than the consonant spacing."""
    lo = render_words(lex, [0], speaker=0, rng=np.random.default_rng(0))
    hi = render_words(lex, [0], speaker=5, rng=np.random.default_rng(0))
    # dominant frequency moves by <20% (the consonant class spacing)
    def peak(x):
        f = np.abs(np.fft.rfft(x))
        return np.argmax(f) * SR / len(x) / 2 * 2

    assert abs(peak(hi) - peak(lo)) / peak(lo) < 0.20


def test_corpus_schema_and_turn_metadata(tmp_path, lex):
    asr_p, st_p, joint_p = make_synth_corpus(
        str(tmp_path), n_utts=24, seed=0, lexicon=lex,
        multi_turn_frac=0.5)
    asr = json.load(open(asr_p))
    st = json.load(open(st_p))
    joint = json.load(open(joint_p))
    assert set(asr) == set(st) == set(joint)
    saw_turn = saw_xt = False
    for uid, e in st.items():
        assert e["task"] == "translation"
        assert asr[uid]["task"] == "transcription"
        assert asr[uid]["target_lang"] == asr[uid]["source_lang"] == "es"
        # uid carries centisecond times (RTTM parse contract:
        # utt_id.split("-")[2] / 100 — reference inference.py:69-84)
        parts = uid.split("-")
        assert len(parts) == 4 and parts[2].isdigit()
        starts = [float(x) for x in e["segments_start"].split()]
        chans = e["segments_channel"].split()
        assert len(starts) == len(chans) == e["nb_turns"]
        n_markers = e["transcription"].count("[turn]")
        assert n_markers == e["nb_turns"] - 1
        saw_turn |= "[turn]" in e["transcription"]
        saw_xt |= "[xt]" in e["transcription"]
        # manifest duration matches the wav on disk
        import wave

        with wave.open(
                e["wav"].replace("{data_root}", str(tmp_path)), "rb") as w:
            assert w.getnframes() / SR == pytest.approx(
                e["duration"], abs=0.01)
        # ASR target is the transcription; ST target is the translation,
        # with markers at identical positions
        es_m = [w for w in e["transcription"].split()
                if w in ("[turn]", "[xt]")]
        en_m = [w for w in e["translation_0"].split()
                if w in ("[turn]", "[xt]")]
        assert es_m == en_m
    assert saw_turn and saw_xt


def test_corpus_deterministic(tmp_path, lex):
    a = make_synth_corpus(str(tmp_path / "a"), n_utts=8, seed=3,
                          lexicon=lex)
    b = make_synth_corpus(str(tmp_path / "b"), n_utts=8, seed=3,
                          lexicon=lex)
    assert json.load(open(a[1])) == json.load(open(b[1]))
    wav_a = (tmp_path / "a" / "wav" / "sutt000000.wav").read_bytes()
    wav_b = (tmp_path / "b" / "wav" / "sutt000000.wav").read_bytes()
    assert wav_a == wav_b


def test_mixed_manifest_doubles_rows(tmp_path, lex):
    asr_p, st_p, _ = make_synth_corpus(str(tmp_path), n_utts=6, seed=0,
                                       lexicon=lex)
    mixed_p = write_mixed_manifest(asr_p, st_p,
                                   str(tmp_path / "data-mixed.json"))
    mixed = json.load(open(mixed_p))
    assert len(mixed) == 12
    asr_rows = [e for e in mixed.values() if e["task"] == "transcription"]
    st_rows = [e for e in mixed.values() if e["task"] == "translation"]
    assert len(asr_rows) == len(st_rows) == 6
    assert all(e["target_lang"] == "es" for e in asr_rows)
    assert all(e["target_lang"] == "en" for e in st_rows)


def test_conversations_manifest(tmp_path, lex):
    convs, manifest, man_path = make_synth_conversations(
        str(tmp_path), lex, n_convs=2, utts_per_conv=4, seed=5)
    assert len(convs) == 2
    for conv in convs:
        assert len(conv["ref_uids"]) == 4
        # offsets are consistent with the concatenated wav length
        last = manifest[conv["ref_uids"][-1]]
        end = last["offset"] + last["duration"]
        assert len(conv["wav"]) / SR >= end
        for uid in conv["ref_uids"]:
            assert uid in manifest
            e = manifest[uid]
            assert {"wav", "duration", "transcription", "translation_0",
                    "offset", "segments_start",
                    "segments_channel"} <= set(e)


def test_tokenizer_trains_and_round_trips(tmp_path, lex):
    from stac_st_tpu.tokenizer import SentencePiece

    _, _, joint_p = make_synth_corpus(str(tmp_path), n_utts=64, seed=0,
                                      lexicon=lex, multi_turn_frac=0.4)
    tok = SentencePiece(
        model_dir=str(tmp_path), vocab_size=400,
        annotation_train=joint_p,
        annotation_read="transcription_and_translation",
        model_type="bpe", user_defined_symbols="[es],[en],[turn],[xt]",
        bos_id=1, eos_id=2, unk_id=0)
    sp = tok.sp
    # reference special-symbol order ([es]=3 [en]=4 [turn]=5 [xt]=6 —
    # effective ids of train_bpe_5k_special_prefix.xx_to_xx.yaml:28-29)
    assert [sp.piece_to_id(p)
            for p in ("[es]", "[en]", "[turn]", "[xt]")] == [3, 4, 5, 6]
    rng = np.random.default_rng(0)
    zipf_w = _zipf_weights(len(lex))
    u = synth_utterance(lex, rng, zipf_w, multi_turn=True)
    assert sp.decode_ids(sp.encode_as_ids(u.es)) == u.es
    assert sp.decode_ids(sp.encode_as_ids(u.en)) == u.en
