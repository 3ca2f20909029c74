"""Golden-oracle tests: our text cleaning vs the REFERENCE'S OWN functions.

Imports the reference prep modules directly (with their heavy deps —
torchaudio, speechbrain, soundfile — stubbed, since only the pure-text
functions are exercised) and asserts string equality over an adversarial
corpus that triggers every substitution rule, plus seeded random
compositions of those triggers.

Covers all four cleaning profiles:
- fisher   (datasets/fisher_callhome/st_asr_task/fisher_callhome_prepare.py)
- callhome (datasets/fisher_callhome/st_asr_task/callhome_prepare.py)
- mslt     (datasets/mslt/mslt_prepare.py)
- cv       (datasets/common_voice_13/common_voice_prepare.py)

and the full translation chain (get_translations_from_path) byte-for-byte.
"""

import importlib.util
import os
import random
import sys
import types

import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not available"
)


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference prep modules with heavy deps stubbed."""
    saved = {}
    stubs = {
        "torchaudio": _stub(
            "torchaudio",
            load=lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub")),
            save=lambda *a, **k: None,
            info=lambda *a, **k: None,
        ),
        "soundfile": _stub("soundfile"),
        "speechbrain": _stub("speechbrain"),
        "speechbrain.processing": _stub("speechbrain.processing"),
        "speechbrain.processing.speech_augmentation": _stub(
            "speechbrain.processing.speech_augmentation", Resample=object
        ),
        "speechbrain.utils": _stub("speechbrain.utils"),
        "speechbrain.utils.data_utils": _stub(
            "speechbrain.utils.data_utils", get_all_files=lambda *a, **k: []
        ),
        "speechbrain.utils.torch_audio_backend": _stub(
            "speechbrain.utils.torch_audio_backend",
            check_torchaudio_backend=lambda: None,
        ),
    }
    for name, mod in stubs.items():
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod

    def load(alias, rel):
        spec = importlib.util.spec_from_file_location(
            alias, os.path.join(REF_ROOT, rel)
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    try:
        mods = {
            "fisher": load(
                "ref_fisher",
                "datasets/fisher_callhome/st_asr_task/fisher_callhome_prepare.py",
            ),
            "callhome": load(
                "ref_callhome",
                "datasets/fisher_callhome/st_asr_task/callhome_prepare.py",
            ),
            "mslt": load("ref_mslt", "datasets/mslt/mslt_prepare.py"),
            "cv": load(
                "ref_cv", "datasets/common_voice_13/common_voice_prepare.py"
            ),
            "covost": load(
                "ref_covost",
                "datasets/covost2/convert_covost_splits_to_json.py",
            ),
        }
        yield mods
    finally:
        for name, prev in saved.items():
            if prev is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = prev


# Trigger fragments: every rule in the reference tables fires on at least
# one of these, and random compositions stress rule interactions/ordering.
TRIGGERS = [
    "<laugh>", "</laugh>", "< laugh >", "<cough>", "<cough/>", "< cough/>",
    "<sneeze/>", "<breath>", "<lipsmack/>", "<background>", "</background>",
    "<lname>", "<lname/>", "<lname>(Smith)</lname>",
    "<foreign lang=\"English\"", "</foreign", "<foreign langenglish",
    "<foreign langenglishhip hop", "<foreign langenglishonline",
    "<foreign langengullís>", "<foreing xyz>", "< /foreigh abc>",
    "foreign>", "</b", "Salvador>",
    "(( ))", "(risas)", "( laughter )", "[ruido]", "[[tag]]", "{brace}",
    "(())", "()",
    "i/he", "i/she", "her/his", "her/him", "she/he", "She/he", "you/he",
    "you/she", "and/or", "A/C", "a/c", "Jose/Josefina", "welfare/foreign",
    "stay/", "boys/", "right/", "follow/", "o/", "co/", "Um/", "name/",
    "American/", "is/", "Then/Well", "fine/well", "Likewise/Equally",
    "boyfriend/girlfriend", "living room / dining room", "L / ",
    " /? ", " / ", "/foreign/", "what))",
    "<???>", "<?>", "<plural>", "<from Texas>", "<weird phrase>",
    "<this makes no sense>", "<metaphoric meaning>", "<missing text ? >",
    "<barely makes any sense>", "<kind of a weird phrase>",
    "<last word does not fit there>",
    "<players with the meaning of singers>",
    "<this phrase barely made any sense whatsoever>",
    "<colorcito does not exist as a word so I have no ideea what he means"
    " about that>",
    "<broken phrase but I tried to guess what would it mean if it was"
    " complete>",
    "<very bad phrase>", "<poorly written phrase>",
    "<this phrase barely even made sense>",
    "<very poorly written phrase but I think this is what was supposed to"
    " mean>",
    "¿Qué tal?", "¡Hola!", "Árbol Él Íntimo Ópera Única Ñandú",
    "SEÑOR", "I¨m", "don't", "can´t", "`backtick`", "a·b", "_under_",
    "noise", "background noise", "laughter", "background speech", "noisy",
    "<space>", "a;b", "c~d", "e=f", "g\\h", "i{j}k", "l[m]n",
    "  double  spaces ", "?", ".", ". ", "? ", "...", "hm's", "it''s",
    "normal palabra", "San José", "más o menos", "[noise]", "[laughter]",
    "larrow inside", "N DE TELÉFONO",
]


def _corpus():
    rng = random.Random(20260816)
    samples = list(TRIGGERS)
    for _ in range(400):
        k = rng.randint(1, 6)
        samples.append(" ".join(rng.choice(TRIGGERS) for _ in range(k)))
        samples.append("".join(rng.choice(TRIGGERS) for _ in range(k)))
    return samples


CORPUS = _corpus()


def test_normalize_punctuation_matches_reference(ref_modules):
    from stac_st_tpu.prep.cleaning import normalize_punctuation

    ref = ref_modules["fisher"]
    for s in CORPUS:
        assert normalize_punctuation(s) == ref.normalize_punctuation(s), s
    # identical table across all four reference files
    for name in ("callhome", "mslt", "cv"):
        other = ref_modules[name]
        for s in CORPUS[:80]:
            assert other.normalize_punctuation(s) == ref.normalize_punctuation(s)


def test_remove_punctuation_matches_reference(ref_modules):
    from stac_st_tpu.prep.cleaning import remove_punctuation

    for name in ("fisher", "mslt"):  # two class variants, same behavior
        ref = ref_modules[name]
        for s in CORPUS:
            assert remove_punctuation(s) == ref.remove_punctuation(s), (name, s)


def test_clean_transcription_fisher(ref_modules):
    from stac_st_tpu.prep.cleaning import FISHER, clean_transcription

    ref = ref_modules["fisher"]
    for s in CORPUS:
        assert clean_transcription(s, FISHER) == ref.clean_transcription(s), s


def test_clean_transcription_callhome(ref_modules):
    from stac_st_tpu.prep.cleaning import CALLHOME, clean_transcription

    ref = ref_modules["callhome"]
    for s in CORPUS:
        assert clean_transcription(s, CALLHOME) == ref.clean_transcription(s), s


def test_clean_transcription_mslt(ref_modules):
    from stac_st_tpu.prep.cleaning import MSLT, clean_transcription

    ref = ref_modules["mslt"]
    for s in CORPUS:
        assert clean_transcription(s, MSLT) == ref.clean_transcription(s), s


def test_clean_transcription_cv(ref_modules):
    from stac_st_tpu.prep.cleaning import COMMONVOICE, clean_transcription

    ref = ref_modules["cv"]
    for s in CORPUS:
        assert clean_transcription(s, COMMONVOICE) == ref.clean_transcription(s), s


def test_remove_labels_matches_reference(ref_modules):
    from stac_st_tpu.prep.cleaning import CALLHOME, FISHER, remove_labels

    reff, refc = ref_modules["fisher"], ref_modules["callhome"]
    for s in CORPUS:
        low = s.lower()
        assert remove_labels(low, FISHER) == reff.remove_labels(low), s
        assert remove_labels(low, CALLHOME) == refc.remove_labels(low), s


def test_clean_translation_matches_reference(ref_modules):
    from stac_st_tpu.prep.cleaning import clean_translation

    ref = ref_modules["fisher"]
    for s in CORPUS:
        assert clean_translation(s) == ref.clean_translation(s), s


def test_full_translation_chain_matches_reference(ref_modules, tmp_path):
    """Byte parity of the whole get_translations_from_path chain, including
    the Moses normalize/tokenize stages and \\r handling."""
    from stac_st_tpu.prep.cleaning import process_translation

    ref = ref_modules["fisher"]
    lines = [s.encode("utf-8") + b"\r\n" for s in CORPUS[:120]]
    p = tmp_path / "fisher_dev.en.0"
    p.write_bytes(b"".join(lines))

    expected = ref.get_translations_from_path(str(p))
    ours = [
        process_translation(raw.replace(b"\r", b"").decode("utf-8"))
        for raw in p.read_bytes().splitlines(keepends=True)
    ]
    assert ours == expected


def test_mslt_full_transcript_chain(ref_modules):
    from stac_st_tpu.prep.cleaning import mslt_clean_transcript

    ref = ref_modules["mslt"]
    for s in CORPUS[:120]:
        assert mslt_clean_transcript(s, "en") == ref.clean_transcript(s, "en"), s


def test_cv_full_transcript_chain(ref_modules):
    from stac_st_tpu.prep.cleaning import cv_clean_transcript

    ref = ref_modules["cv"]
    for s in CORPUS[:120]:
        assert cv_clean_transcript(s, "en") == ref.clean_transcript(s, "en"), s


def test_transcription_finalize_chain(ref_modules):
    """Post-mapping finish: normalize_punctuation + Moses es-normalizer,
    as applied at fisher_callhome_prepare.py:366-367."""
    from stac_st_tpu.prep.cleaning import finalize_transcription

    ref = ref_modules["fisher"]
    for s in CORPUS[:120]:
        expected = ref.es_normalizer.normalize(ref.normalize_punctuation(s))
        assert finalize_transcription(s, "es") == expected, s


def test_mslt_clean_all_matches_reference(ref_modules):
    from stac_st_tpu.prep.cleaning import mslt_clean_all

    ref = ref_modules["mslt"]
    for s in CORPUS[:120]:
        for accented in (True, False):
            expected = ref.clean_all_transcript([s], "en", accented)
            got = mslt_clean_all([s], "en", accented)
            assert got == (None if expected is False else expected), s


def test_cv_clean_all_matches_reference(ref_modules):
    """Reference CV cleaning is inline in create_json (no function) — mirror
    the exact statement sequence at common_voice_prepare.py:289-322."""
    import re as _re

    from stac_st_tpu.prep.cleaning import cv_clean_all

    ref = ref_modules["cv"]

    def ref_inline(words, language, accented_letters=False):
        words = ref.unicode_normalisation(words)
        words = ref.clean_transcript(words, language)
        if not accented_letters:
            words = ref.strip_accents(words)
            words = words.replace("'", " ")
            words = words.replace("’", " ")
        words = _re.sub(" +", " ", words)
        words = words.lstrip().rstrip()
        chars = words.replace(" ", "_")
        chars = " ".join([char for char in chars][:])
        if language in ["ja", "ch"]:
            if len(chars) < 3:
                return None
        else:
            if len(words.split(" ")) < 3:
                return None
        return words

    for s in CORPUS[:120]:
        assert cv_clean_all(s, "en") == ref_inline(s, "en"), s


def test_covost_full_chain_matches_reference(ref_modules):
    """CoVoST translation cleaning: chain + accent handling + length gate
    (the reference's inline statements at convert_covost_splits_to_json.py
    :395-427)."""
    import re as _re

    from stac_st_tpu.prep.cleaning import covost_clean_all

    ref = ref_modules["covost"]

    def ref_inline(translation, locale, accented_letters=True):
        words = ref.unicode_normalisation(translation)
        words = ref.clean_transcript(words, locale)
        if not accented_letters:
            words = ref.strip_accents(words)
            words = words.replace("'", " ")
            words = words.replace("\u2019", " ")
        words = _re.sub(" +", " ", words)
        words = words.lstrip().rstrip()
        chars = words.replace(" ", "_")
        chars = " ".join([char for char in chars][:])
        if locale in ["ja", "ch"]:
            if len(chars) < 3:
                return None
        else:
            if len(words.split(" ")) < 3:
                return None
        return words

    for s in CORPUS[:120]:
        for accented in (True, False):
            assert covost_clean_all(s, "en", accented) == \
                ref_inline(s, "en", accented), (s, accented)


def test_strip_accents_matches_reference(ref_modules):
    from stac_st_tpu.prep.cleaning import strip_accents

    ref = ref_modules["cv"]
    for s in CORPUS:
        assert strip_accents(s) == ref.strip_accents(s), s
