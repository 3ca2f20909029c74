"""Evaluation-harness tests: speaker-change F1, RTTM alignment, mwer realign."""

import json

import numpy as np
import pytest

from stac_st_tpu.eval.long_form import mwer_segment, realign_hypotheses
from stac_st_tpu.eval.rttm_fix import build_aligned_rttm
from stac_st_tpu.eval.speaker_change import (
    evaluate_speaker_change,
    gt_changes_from_manifest,
    hyp_changes_from_rttm,
    score_change_points,
)


class TestSpeakerChangeF1:
    def test_perfect_match(self):
        m = score_change_points([1.0, 5.0, 9.0], [1.05, 4.98, 9.1], 0.25)
        assert m.true_positives == 3 and m.f1 == 1.0
        assert m.mdr == 0.0 and m.far == 0.0

    def test_misses_and_false_alarms(self):
        m = score_change_points([1.0, 5.0], [1.0, 3.0, 7.0], 0.25)
        assert m.true_positives == 1
        assert m.false_positives == 2
        assert m.false_negatives == 1
        assert m.precision == pytest.approx(1 / 3)
        assert m.recall == pytest.approx(0.5)

    def test_tolerance_grid_monotone(self):
        ref = {"u1": [1.0, 5.0, 9.0]}
        hyp = {"u1": [1.3, 5.4, 8.6]}
        results = evaluate_speaker_change(ref, hyp)
        f1s = [m.f1 for m in results]
        assert f1s == sorted(f1s)  # wider tolerance can only help

    def test_each_ref_matched_once(self):
        # two hyp events near one ref: only one TP
        m = score_change_points([2.0], [1.9, 2.1], 0.25)
        assert m.true_positives == 1 and m.false_positives == 1


class TestRttmPlumbing:
    def _manifest(self, tmp_path):
        data = {
            "conv1-0-000000-001000": {
                "duration": 10.0,
                "segments_start": [0.0, 4.0, 7.0],
                "segments_duration": [4.0, 3.0, 3.0],
                "segments_channel": [0, 1, 0],
            },
            "conv1-0-001500-002500": {
                "duration": 10.0,
                "segments_start": [0.0, 5.0],
                "segments_duration": [5.0, 5.0],
                "segments_channel": [1, 0],
            },
        }
        p = tmp_path / "data-turns-st.json"
        p.write_text(json.dumps(data))
        return str(p)

    def test_gt_changes(self, tmp_path):
        gt = gt_changes_from_manifest(self._manifest(tmp_path))
        assert gt["conv1-0-000000-001000"] == [4.0, 7.0]
        assert gt["conv1-0-001500-002500"] == [5.0]

    def test_hyp_rttm_parse_and_merge(self, tmp_path):
        rttm = tmp_path / "RTTM_turn.csv"
        # utterance clock starts at 15.00 s (id field = 1500 centisec)
        rttm.write_text(
            "SPEAKER conv1-0-001500-002500 1 20.000 0.04 <NA> <NA> SPK1 <NA> <NA>\n"
            "SPEAKER conv1-0-001500-002500 1 20.040 0.04 <NA> <NA> SPK1 <NA> <NA>\n"
        )
        hyp = hyp_changes_from_rttm(str(rttm))
        # two adjacent frame spikes merge into one event at 5.0 s rel
        assert hyp["conv1-0-001500-002500"] == [pytest.approx(5.0)]

    def test_aligned_rttm_timeline(self, tmp_path):
        manifest = self._manifest(tmp_path)
        ref, hyp = build_aligned_rttm(
            manifest, {"conv1-0-001500-002500": [5.0]}
        )
        assert len(ref) == 5  # 3 + 2 segments
        # second utterance offset = 10 (dur) + 5 (spacer)
        hyp_time = float(hyp[0].split()[3])
        assert hyp_time == pytest.approx(15.0 + 5.0)


class TestMwerRealign:
    def test_exact_split_recovered(self):
        refs = [["hello", "world"], ["how", "are", "you"]]
        hyp = ["hello", "world", "how", "are", "you"]
        spans = mwer_segment(refs, hyp)
        assert spans == [["hello", "world"], ["how", "are", "you"]]

    def test_noisy_split(self):
        refs = ["the cat sat", "on the mat today"]
        hyp = "the cat sad on the mat todey"
        out = realign_hypotheses(refs, hyp)
        assert out[0].startswith("the cat")
        assert "mat" in out[1]
        assert " ".join(out) == hyp

    def test_empty_segments_allowed(self):
        refs = [["a"], ["b"], ["c"]]
        hyp = ["b"]
        spans = mwer_segment(refs, hyp)
        assert sum(len(s) for s in spans) == 1
