"""Execute the pyannote baseline plumbing end-to-end under a stub
pyannote.audio (the real package is not installed and needs network/auth).

Covers both reference paths (evaluations/pyannote/eval_pyannote.py): the
diarization pipeline and the segmentation VAD+SCD peak detector — manifest
in, one utterance-keyed RTTM out, scored by the exact region scorer.
"""

import json
import sys
import types
from dataclasses import dataclass

import pytest


@dataclass
class _Seg:
    start: float
    duration: float

    @property
    def end(self):
        return self.start + self.duration


class _Annotation:
    def __init__(self, tracks):
        self._tracks = tracks

    def itertracks(self, yield_label=False):
        for seg, label in self._tracks:
            yield seg, None, label


class _Timeline(list):
    def get_timeline(self):
        return self


class _Peaks:
    def __init__(self, segs):
        self.segs = segs

    def crop(self, timeline):
        out = []
        for s in self.segs:
            for region in timeline:
                if s.start >= region.start and s.end <= region.end:
                    out.append(s)
                    break
        return out


@pytest.fixture()
def stub_pyannote(monkeypatch):
    """Deterministic fake pyannote: diarization alternates two speakers;
    segmentation yields speech [0.5, 4.5] with change peaks at 2.0/3.0 s."""

    audio = types.ModuleType("pyannote.audio")

    class Pipeline:
        @staticmethod
        def from_pretrained(name, use_auth_token=None):
            return Pipeline()

        def __call__(self, wav, min_speakers=None, num_speakers=None):
            assert min_speakers == 1 and num_speakers == 2
            return _Annotation([
                (_Seg(0.50, 1.50), "SPEAKER_00"),
                (_Seg(2.00, 1.00), "SPEAKER_01"),
                (_Seg(3.00, 1.50), "SPEAKER_00"),
            ])

    class Model:
        @staticmethod
        def from_pretrained(name, use_auth_token=None):
            return Model()

    class Inference:
        def __init__(self, model, pre_aggregation_hook=None):
            self.hook = pre_aggregation_hook

        def __call__(self, wav):
            import numpy as np

            # (1, T, speakers) probability track; the hooks reduce it
            probs = np.zeros((1, 50, 2), np.float32)
            probs[:, 5:45, 0] = 0.9          # speech region 0.5-4.5 s
            probs[:, 20:30, 1] = 0.9         # second speaker 2.0-3.0 s
            return self.hook(probs) if self.hook else probs

    class Binarize:
        def __init__(self, onset=0.5):
            self.onset = onset

        def __call__(self, track):
            return _Timeline([_Seg(0.5, 4.0)])

    class Peak:
        def __init__(self, alpha=0.05):
            self.alpha = alpha

        def __call__(self, track):
            return _Peaks([_Seg(2.0, 0.1), _Seg(3.0, 0.1),
                           _Seg(4.8, 0.1)])  # last is outside speech

    audio.Pipeline = Pipeline
    audio.Model = Model
    audio.Inference = Inference
    signal = types.ModuleType("pyannote.audio.utils.signal")
    signal.Binarize = Binarize
    signal.Peak = Peak
    root = types.ModuleType("pyannote")
    utils = types.ModuleType("pyannote.audio.utils")
    monkeypatch.setitem(sys.modules, "pyannote", root)
    monkeypatch.setitem(sys.modules, "pyannote.audio", audio)
    monkeypatch.setitem(sys.modules, "pyannote.audio.utils", utils)
    monkeypatch.setitem(sys.modules, "pyannote.audio.utils.signal", signal)


@pytest.fixture()
def manifest(tmp_path):
    data = {
        f"conv1-A-{i * 500:06d}-{i * 500 + 450:06d}": {
            "wav": str(tmp_path / f"u{i}.wav"), "duration": 4.5
        }
        for i in range(2)
    }
    p = tmp_path / "data-st.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_diarization_path(stub_pyannote, manifest, tmp_path):
    from stac_st_tpu.eval.pyannote_baseline import run_pyannote_manifest

    out = tmp_path / "pyannote.rttm"
    lines = run_pyannote_manifest(
        manifest, str(out), pipeline="pyannote/speaker-diarization@2.1",
        model_name="pyannote/speaker-diarization@2.1",
    )
    assert len(lines) == 6  # 3 turns x 2 utterances
    first = lines[0].split(" ")
    assert first[0] == "SPEAKER" and first[3] == "0.5000"
    assert out.read_text().count("\n") == 6


def test_segmentation_scd_path(stub_pyannote, manifest, tmp_path):
    from stac_st_tpu.eval.pyannote_baseline import run_pyannote_manifest

    out = tmp_path / "scd.rttm"
    lines = run_pyannote_manifest(manifest, str(out))
    # 2 in-speech peaks per utterance; the 4.8 s peak is cropped out
    assert len(lines) == 4
    assert all("SPK1" in ln for ln in lines)


def test_scored_end_to_end(stub_pyannote, manifest, tmp_path):
    """pyannote RTTM feeds the exact region scorer."""
    from stac_st_tpu.eval.pyannote_baseline import run_pyannote_manifest
    from stac_st_tpu.eval.speaker_change import (
        evaluate_speaker_turn_detection,
    )

    hyp = tmp_path / "hyp.rttm"
    run_pyannote_manifest(
        manifest, str(hyp), pipeline="pyannote/speaker-diarization@2.1",
        model_name="x",
    )
    ref = tmp_path / "ref.rttm"
    ref.write_text(
        "".join(
            f"SPEAKER conv 1 {s} {d} <NA> <NA> {spk} <NA> <NA>\n"
            for s, d, spk in [(0.5, 1.5, "A"), (2.0, 1.0, "B"),
                              (3.1, 1.4, "A")]
        )
    )
    results = evaluate_speaker_turn_detection(str(ref), str(hyp),
                                              tolerances=[0.25])
    assert results[0]["num_pred_regions"] > 0
    assert 0.0 <= results[0]["f1"] <= 100.0


def test_gates_without_pyannote(manifest, tmp_path):
    from stac_st_tpu.eval.pyannote_baseline import run_pyannote_manifest

    with pytest.raises(RuntimeError, match="pyannote.audio is not installed"):
        run_pyannote_manifest(manifest, str(tmp_path / "x.rttm"))
