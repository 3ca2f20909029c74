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


class TestMwerSegmenterEquivalence:
    """Hand-built fixtures pinning ``mwer_segment`` to mwerSegmenter's
    DOCUMENTED behavior (RWTH tool of Matusov et al. 2005, shelled out by
    the reference at ``run_align_and_eval.sh:57-70``): resegment the
    hypothesis word stream into exactly ``len(references)`` consecutive
    spans minimizing the SUM of per-segment word edit distances. A brute
    force over every split-point placement is the oracle."""

    @staticmethod
    def _levenshtein(a, b):
        import numpy as np

        col = np.arange(len(a) + 1)
        for k, w in enumerate(b, start=1):
            prev = col.copy()
            col[0] = k
            for i in range(1, len(a) + 1):
                col[i] = min(prev[i] + 1, col[i - 1] + 1,
                             prev[i - 1] + (a[i - 1] != w))
        return int(col[len(a)])

    @classmethod
    def _brute_min_cost(cls, refs, hyp):
        import itertools

        R, H = len(refs), len(hyp)
        best = None
        for cuts in itertools.combinations_with_replacement(
                range(H + 1), R - 1):
            bounds = (0,) + cuts + (H,)
            cost = sum(
                cls._levenshtein(refs[i], hyp[bounds[i]:bounds[i + 1]])
                for i in range(R)
            )
            best = cost if best is None else min(best, cost)
        return best

    @classmethod
    def _cost_of(cls, refs, spans):
        return sum(cls._levenshtein(r, s) for r, s in zip(refs, spans))

    def test_optimal_on_random_fixtures(self, rng):
        words = ["uno", "dos", "tres", "cuatro", "cinco", "seis"]
        for trial in range(25):
            R = int(rng.integers(1, 5))
            refs = [
                [words[int(w)] for w in rng.integers(0, 6, rng.integers(1, 5))]
                for _ in range(R)
            ]
            H = int(rng.integers(0, 12))
            hyp = [words[int(w)] for w in rng.integers(0, 6, H)]
            spans = mwer_segment(refs, hyp)
            assert len(spans) == R
            assert [w for s in spans for w in s] == hyp  # partition
            got = self._cost_of(refs, spans)
            want = self._brute_min_cost(refs, hyp)
            assert got == want, (refs, hyp, spans, got, want)

    def test_boundary_insertion_attribution(self):
        # an extra word between segments must be attributed where it is
        # cheapest: 'oh' before 'b c' costs 1 insertion either way, but
        # attached to ref2 ['oh','b','c'] it is a free match
        refs = [["a"], ["oh", "b", "c"]]
        hyp = ["a", "oh", "b", "c"]
        spans = mwer_segment(refs, hyp)
        assert spans == [["a"], ["oh", "b", "c"]]

    def test_surplus_and_deficit(self):
        refs = [["x", "y"], ["z"]]
        # deficit: too few hyp words — the cheap segment goes empty
        assert mwer_segment(refs, ["z"]) == [[], ["z"]]
        # surplus: extras stay with whichever segment minimizes cost
        spans = mwer_segment(refs, ["x", "y", "q", "z", "w"])
        assert self._cost_of(refs, spans) == self._brute_min_cost(
            refs, ["x", "y", "q", "z", "w"])

    def test_case_sensitive_like_mwersegmenter(self):
        # mwerSegmenter matches case-sensitively by default (the reference
        # pipeline lowercases upstream, run_align_and_eval.sh)
        refs = [["Hola"], ["hola"]]
        spans = mwer_segment(refs, ["hola"])
        # matching the second segment is free; first must go empty
        assert spans == [[], ["hola"]]
