"""Dataset-preparation tests: cleaning, turns, parsers, mixers, and a full
synthetic Fisher-style prep → manifest → SpeechDataset round trip."""

import json
import os

import numpy as np
import pytest

from stac_st_tpu.prep.cleaning import (
    clean_transcription,
    clean_translation,
    normalize_punctuation,
)
from stac_st_tpu.prep.mixing import concat_json, join_json
from stac_st_tpu.prep.records import Utterance, write_manifests
from stac_st_tpu.prep.segmentation import (
    energy_vad,
    segments_to_json,
    split_to_grid,
)
from stac_st_tpu.prep.tdf import parse_callhome, parse_tdf
from stac_st_tpu.prep.turns import concatenate_turns


class TestCleaning:
    def test_transcription_lowercase_no_punct(self):
        out = clean_transcription("Hola, ¿Cómo ESTÁS? <laugh> (bien)")
        assert out == out.lower()
        assert "," not in out and "?" not in out and "<" not in out

    def test_apostrophe_kept(self):
        assert "don't" in clean_translation("Don't worry, be happy!")

    def test_annotations_removed(self):
        out = normalize_punctuation("yes ((unclear)) [noise] i/he said")
        assert "((" not in out and "[" not in out
        assert "i said" in out


class TestTurns:
    def _utt(self, uid, start, end, channel, text="hola", rec="conv1"):
        return Utterance(
            uid=f"{rec}-{channel}-{start:06d}-{end:06d}",
            wav="", duration=(end - start) / 100.0,
            transcription=text, translations=[text + "_en"],
            source_audio=f"/x/{rec}.sph", channel=channel,
            start=start, end=end,
        )

    def test_turn_token_on_channel_change(self):
        utts = [self._utt("a", 0, 500, 0, "hola"),
                self._utt("b", 600, 1000, 1, "hello")]
        merged = concatenate_turns(utts, max_seconds=30)
        assert len(merged) == 1
        assert merged[0].transcription == "hola [turn] hello"
        assert merged[0].translations[0] == "hola_en [turn] hello_en"
        assert merged[0].turn_channel == [0, 1]
        assert merged[0].nb_turns == 1

    def test_xt_on_crosstalk(self):
        # second segment starts 0.5 s before the first ends
        utts = [self._utt("a", 0, 500, 0), self._utt("b", 450, 900, 1)]
        merged = concatenate_turns(utts, max_seconds=30)
        assert "[turn] [xt]" in merged[0].transcription

    def test_same_channel_joins_with_space(self):
        utts = [self._utt("a", 0, 300, 0, "uno"),
                self._utt("b", 400, 700, 0, "dos")]
        merged = concatenate_turns(utts, max_seconds=30)
        assert merged[0].transcription == "uno dos"
        assert merged[0].nb_turns == 0
        # duration of the running segment extended
        assert merged[0].turn_duration == [7.0]

    def test_max_seconds_respected(self):
        utts = [self._utt("a", 0, 2000, 0), self._utt("b", 2100, 4000, 1),
                self._utt("c", 4100, 6000, 0)]
        merged = concatenate_turns(utts, max_seconds=45)
        assert len(merged) == 2  # third would exceed 45 s
        assert merged[0].duration == pytest.approx(40.0)

    def test_excessive_overlap_rejected(self):
        # second ends 5 s before the first ends (> 4 s max overlap)
        utts = [self._utt("a", 0, 1500, 0), self._utt("b", 100, 1000, 1)]
        merged = concatenate_turns(utts, max_seconds=60)
        assert len(merged) == 2

    def test_different_recordings_never_merge(self):
        utts = [self._utt("a", 0, 500, 0, rec="conv1"),
                self._utt("b", 600, 1000, 1, rec="conv2")]
        merged = concatenate_turns(utts, max_seconds=60)
        assert len(merged) == 2

    def test_uid_format(self):
        utts = [self._utt("a", 123, 500, 0), self._utt("b", 600, 4567, 1)]
        merged = concatenate_turns(utts, max_seconds=60)
        assert merged[0].uid == "conv1-0-000123-004567"


class TestParsers:
    def test_tdf(self, tmp_path):
        lines = ["h1\nh2\nh3\n"]
        rows = [
            "f.sph\t0\t1.50\t3.25\tspkA\t\t\thola que tal\t0\t0\t1\n",
            "f.sph\t1\t3.30\t5.00\tspkB\t\t\tmuy bien\t0\t1\t2\n",
        ]
        p = tmp_path / "f.tdf"
        p.write_text("".join(lines) + "".join(rows))
        segs = parse_tdf(str(p))
        assert len(segs) == 2
        assert segs[0].channel == 0 and segs[0].start == 150
        assert segs[0].end == 325
        assert segs[1].transcript == "muy bien"

    def test_callhome(self, tmp_path):
        p = tmp_path / "sp_0001.txt"
        p.write_text(
            "12.10 14.50 A: hola amigo\n15.00 16.75 B: que pasa\n",
            encoding="ISO-8859-1",
        )
        segs = parse_callhome(str(p))
        assert len(segs) == 2
        assert segs[0].channel == 0 and segs[1].channel == 1
        assert segs[0].start == 1210 and segs[1].end == 1675


class TestManifests:
    def test_write_manifests_schema(self, tmp_path):
        utt = Utterance(
            uid="conv1-0-000000-000500", wav="/x/a.wav", duration=5.0,
            transcription="hola [turn] hello", translations=["hi [turn] hey"],
            turn_start=[0.0, 2.5], turn_duration=[2.5, 2.5],
            turn_channel=[0, 1],
        )
        paths = write_manifests([utt], str(tmp_path), "data-turns",
                                n_refs=1, with_segments=True)
        st = json.load(open(paths["st"]))
        entry = st["conv1-0-000000-000500-st"]
        assert entry["task"] == "translation"
        # reference schema: space-joined strings
        assert entry["segments_channel"] == "0 1"
        assert entry["nb_turns"] == 1
        asr = json.load(open(paths["asr"]))
        a = asr["conv1-0-000000-000500-asr"]
        assert a["target_lang"] == a["source_lang"]
        assert "transcription_and_translation" in a

    def test_four_ref_manifest(self, tmp_path):
        utt = Utterance(
            uid="c-0-000000-000100", wav="/x.wav", duration=1.0,
            transcription="hola", translations=["a", "b", "c", "d"],
        )
        paths = write_manifests([utt], str(tmp_path), n_refs=4)
        st = json.load(open(paths["st"]))
        entry = st["c-0-000000-000100-st"]
        assert [entry[f"translation_{i}"] for i in range(4)] == [
            "a", "b", "c", "d"
        ]


class TestMixers:
    def _manifest(self, tmp_path, n=6):
        data = {
            f"u{i}-st": {
                "wav": f"/x/u{i}.wav", "duration": 8.0,
                "task": "translation", "source_lang": "es",
                "target_lang": "en", "transcription": f"es{i}",
                "translation_0": f"en{i}",
            }
            for i in range(n)
        }
        p = tmp_path / "in.json"
        p.write_text(json.dumps(data))
        return str(p)

    def test_concat_json(self, tmp_path):
        src = self._manifest(tmp_path)
        out = concat_json(src, str(tmp_path / "out.json"), max_seconds=30.0,
                          seed=1)
        for entry in out.values():
            assert entry["duration"] <= 30.0
            n_wavs = len(entry["wav"].split())
            assert entry["nb_turns"] == n_wavs - 1
            assert entry["transcription"].count("[turn]") == n_wavs - 1
            assert len(entry["segments_start"].split(" ")) == n_wavs

    def test_join_json(self, tmp_path):
        a = self._manifest(tmp_path)
        merged = join_json([a], str(tmp_path / "j.json"))
        assert all("transcription_and_translation" in e
                   for e in merged.values())


class TestSegmentation:
    def test_energy_vad_finds_speech(self):
        sr = 16000
        sig = np.zeros(sr * 4, np.float32)
        sig[sr : 2 * sr] = 0.3 * np.sin(
            2 * np.pi * 300 * np.arange(sr) / sr
        ).astype(np.float32)
        regions = energy_vad(sig, sr)
        assert len(regions) >= 1
        start, end = regions[0]
        assert 0.8 <= start <= 1.2 and 1.8 <= end <= 2.6

    def test_split_to_grid(self):
        regions = [(0.0, 50.0)]
        out = split_to_grid(regions, 10.0, 30.0)
        assert all(e - s <= 30.0 + 1e-6 for s, e in out)
        assert abs(sum(e - s for s, e in out) - 50.0) < 1e-6

    def test_segments_to_json(self, tmp_path):
        from stac_st_tpu.data.audio import write_wav

        sr = 16000
        wav = tmp_path / "conv.wav"
        write_wav(str(wav), np.zeros(sr * 3, np.float32), sr)
        path = segments_to_json(str(wav), [(0.0, 1.5), (1.5, 3.0)],
                                str(tmp_path / "out"))
        data = json.load(open(path))
        assert len(data) == 2
        uid = next(iter(data))
        assert uid.split("-")[2] == "000000"
        assert os.path.isfile(data[uid]["wav"])


def _write_sphere(path, samples, rate=8000, channels=1):
    """Minimal NIST SPHERE writer for fixtures (pcm16, little-endian)."""
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    header = (
        "NIST_1A\n   1024\n"
        f"sample_rate -i {rate}\n"
        f"channel_count -i {channels}\n"
        "sample_n_bytes -i 2\n"
        "sample_byte_format -s2 01\n"
        "sample_coding -s3 pcm\n"
        "end_head\n"
    ).encode()
    header = header + b" " * (1024 - len(header))
    with open(path, "wb") as f:
        f.write(header)
        f.write(pcm.tobytes())


class TestFisherRoundTrip:
    """Synthetic LDC-style tree -> prepare_fisher -> SpeechDataset."""

    @pytest.fixture(scope="class")
    def ldc_tree(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("ldc")
        speech = root / "LDC2010T04" / "fisher_spa" / "data" / "speech"
        trans = root / "LDC2010T04" / "fisher_spa_tr" / "data" / "transcripts"
        corpus = root / "fisher-callhome-corpus"
        (corpus / "mapping").mkdir(parents=True)
        (corpus / "corpus" / "ldc").mkdir(parents=True)
        speech.mkdir(parents=True)
        trans.mkdir(parents=True)

        # 2-channel 8 kHz recording, 20 s
        rate = 8000
        t = np.arange(rate * 20) / rate
        ch0 = 0.3 * np.sin(2 * np.pi * 220 * t)
        ch1 = 0.3 * np.sin(2 * np.pi * 440 * t)
        stereo = np.stack([ch0, ch1], axis=1).astype(np.float32)
        _write_sphere(str(speech / "20050908_fsp.sph"),
                      stereo.reshape(-1), rate=rate, channels=2)

        rows = [
            "f\t0\t0.50\t3.00\tA\t\t\thola como estas\t0\t0\t1\n",
            "f\t1\t3.50\t6.00\tB\t\t\tmuy bien gracias\t0\t1\t2\n",
            "f\t0\t6.50\t9.00\tA\t\t\tque bueno amigo\t0\t2\t3\n",
        ]
        (trans / "20050908_fsp.tdf").write_text("h\nh\nh\n" + "".join(rows))

        (corpus / "mapping" / "fisher_dev").write_text(
            "20050908_fsp-A-1 1\n20050908_fsp-B-2 2\n20050908_fsp-A-3 3\n"
        )
        for n in range(4):
            (corpus / "corpus" / "ldc" / f"fisher_dev.en.{n}").write_text(
                "hello how are you\nvery well thanks\nthat is good friend\n"
            )
        return dict(root=str(root), corpus=str(corpus))

    def test_prepare_and_load(self, ldc_tree, tmp_path_factory):
        from stac_st_tpu.prep.fisher import prepare_fisher, prepare_fisher_turns
        from stac_st_tpu.data.dataset import SpeechDataset

        save = str(tmp_path_factory.mktemp("prepared"))
        prepare_fisher(ldc_tree["root"], save,
                       corpus_path=ldc_tree["corpus"], datasets=["dev"])
        st_json = os.path.join(save, "dev", "data-st.json")
        data = json.load(open(st_json))
        assert len(data) == 3
        entry = next(iter(data.values()))
        assert entry["task"] == "translation"
        assert entry["translation_3"]
        assert os.path.isfile(entry["wav"])

        ds = SpeechDataset(st_json, tokenizer=None)
        sample = ds[0]
        assert sample["sig"].ndim == 1 and len(sample["sig"]) > 0
        # 16 kHz contract after 8->16k resample
        assert abs(len(sample["sig"]) / 16000.0 - sample["duration"]) < 0.1

        # turns variant
        prepare_fisher_turns(ldc_tree["root"], save, max_seconds=30,
                             corpus_path=ldc_tree["corpus"], datasets=["dev"])
        turns_json = os.path.join(save, "dev-30s", "data-turns-st.json")
        tdata = json.load(open(turns_json))
        assert len(tdata) == 1  # all 3 merge into one 30s window
        tentry = next(iter(tdata.values()))
        assert tentry["transcription"].count("[turn]") == 2
        assert tentry["nb_turns"] == 2
        assert len(tentry["segments_start"].split(" ")) == 3


class TestAudioConvertFallback:
    def test_no_decoder_returns_none(self, monkeypatch):
        import shutil as _sh

        from stac_st_tpu.prep import audio_convert as ac

        # the in-process _stacaudio path (preferred when built) is stubbed
        # out here: this test pins the no-decoder-anywhere behavior
        monkeypatch.setattr(ac, "native_converter", lambda sr: None)
        monkeypatch.setattr(_sh, "which", lambda name: None)
        assert ac.default_mp3_converter() is None

    def test_detects_first_available(self, monkeypatch, tmp_path):
        import shutil as _sh

        from stac_st_tpu.prep import audio_convert as ac

        calls = []
        monkeypatch.setattr(ac, "native_converter", lambda sr: None)
        monkeypatch.setattr(
            _sh, "which",
            lambda name: "/usr/bin/sox" if name == "sox" else None,
        )
        monkeypatch.setattr(
            ac.subprocess, "run",
            lambda cmd, **kw: calls.append(cmd),
        )
        conv = ac.default_mp3_converter()
        assert conv is not None
        conv("a.mp3", "b.wav")
        assert calls and calls[0][0] == "/usr/bin/sox"
        assert "a.mp3" in calls[0] and "b.wav" in calls[0]

    def test_commonvoice_uses_converter(self, tmp_path):
        """prepare_common_voice converts mp3 via the pluggable hook."""
        import csv as _csv
        import json as _json

        import numpy as _np

        from stac_st_tpu.data.audio import write_wav
        from stac_st_tpu.prep.commonvoice import prepare_common_voice

        locale_dir = tmp_path / "es"
        clips = locale_dir / "clips"
        clips.mkdir(parents=True)
        rows = []
        for i in range(3):
            (clips / f"c{i}.mp3").write_bytes(b"\xff\xfbFAKE")
            rows.append({
                "client_id": f"u{i}", "path": f"c{i}.mp3",
                "sentence": "this is a perfectly long sentence indeed",
            })
        with open(locale_dir / "train.tsv", "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=list(rows[0]), delimiter="\t")
            w.writeheader()
            w.writerows(rows)

        def fake_convert(src, dst):
            write_wav(dst, _np.zeros(16000, _np.float32), 16000)

        out = prepare_common_voice(
            str(tmp_path), str(tmp_path / "save"), "es",
            audio_converter=fake_convert,
        )
        data = _json.load(open(out["train"]))
        assert len(data) == 3
        for entry in data.values():
            assert entry["wav"].endswith(".wav")
            assert entry["duration"] == 1.0


class TestCovost:
    def test_join_and_clean(self, tmp_path):
        """CoVoST TSV ⋈ CV manifest: reference key/cleaning semantics."""
        import json as _json

        from stac_st_tpu.prep.covost import prepare_covost

        cv = {
            "clip_001": {"wav": "/w/clip_001.wav", "duration": 2.0,
                         "task": "transcription", "source_lang": "es",
                         "target_lang": "es",
                         "transcription": "hola que tal amigo",
                         "translation_0": ""},
            "clip_002": {"wav": "/w/clip_002.wav", "duration": 2.0,
                         "task": "transcription", "source_lang": "es",
                         "target_lang": "es",
                         "transcription": "poca cosa", "translation_0": ""},
        }
        cv_path = tmp_path / "all.json"
        cv_path.write_text(_json.dumps(cv))
        tsv = tmp_path / "covost_v2.es_en.tsv"
        tsv.write_text(
            "path\tsentence\ttranslation\tsplit\n"
            "clip_001.mp3\thola\tHello, how are you my friend?\ttrain\n"
            "clip_002.mp3\tpoca\tNot much\ttrain\n"     # <3 words -> dropped
            "clip_404.mp3\tx\tThis clip is missing here\ttrain\n"
        )
        out = prepare_covost(str(tsv), str(cv_path), str(tmp_path),
                             "es", "en")
        data = _json.load(open(out["train"]))
        assert list(data) == ["clip_001"]  # bare clip key, reference schema
        entry = data["clip_001"]
        assert entry["task"] == "translation"
        assert entry["target_lang"] == "en"
        # full cleaning chain: lowercased, punctuation out, tokenized
        assert entry["translation_0"] == "hello how are you my friend"
        assert entry["transcription"] == "hola que tal amigo"
