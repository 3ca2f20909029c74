"""Smoke tests for the evaluations/ CLI drivers (the reference's shell
entry points re-owned as Python CLIs). The underlying scorers are
oracle-tested elsewhere (test_speaker_change_oracle, test_rttm_fix_oracle);
these drive the argparse mains end-to-end on synthetic fixtures."""

import json
import os
import random
import sys

import pytest

EVAL_DIR = os.path.join(os.path.dirname(__file__), "..", "evaluations")


def _write_rttm(path, rows):
    with open(path, "w") as f:
        for name, start, dur, spk in rows:
            f.write(
                f"SPEAKER {name} 1 {start} {dur} <NA> <NA> {spk} <NA> <NA>\n"
            )


def _conversation(rng, n=10):
    rows, t = [], rng.uniform(0.0, 1.0)
    for i in range(n):
        dur = rng.uniform(0.8, 3.0)
        rows.append(("conv", round(t, 3), round(dur, 3),
                     "A" if i % 2 == 0 else "B"))
        t = t + dur + rng.uniform(0.05, 1.0)
    return rows


class TestSpeakerChangeCli:
    def test_reference_exact_mode(self, tmp_path, monkeypatch):
        sys.path.insert(0, os.path.join(EVAL_DIR, "vad_shas"))
        import run_eval_speaker_change as cli

        rng = random.Random(0)
        ref_rows = _conversation(rng)
        hyp_rows = [(n, max(0.0, s + rng.uniform(-0.1, 0.1)), d, spk)
                    for n, s, d, spk in ref_rows]
        ref = str(tmp_path / "ref.rttm")
        hyp = str(tmp_path / "hyp.rttm")
        out = str(tmp_path / "report.json")
        _write_rttm(ref, ref_rows)
        _write_rttm(hyp, hyp_rows)
        monkeypatch.setattr(sys, "argv", [
            "run_eval_speaker_change.py", "--ref-rttm", ref,
            "--rttm", hyp, "--out", out,
        ])
        cli.main()
        report = json.load(open(out))
        tols = {m["tolerance"] for m in report}
        assert 0.5 in tols and 1.0 in tols
        for metrics in report:
            assert {"precision", "recall", "f1"} <= set(metrics)
            # reference scorer reports percentages
            assert all(0.0 <= metrics[k] <= 100.0
                       for k in ("precision", "recall", "f1"))

    def test_manifest_mode(self, tmp_path, monkeypatch):
        sys.path.insert(0, os.path.join(EVAL_DIR, "vad_shas"))
        import run_eval_speaker_change as cli

        # multi-turn manifest: two utterances with segment metadata
        manifest = {
            "c1-A-0-3000": {
                "duration": 30.0,
                "segments_start": [0.0, 10.0, 20.0],
                "segments_duration": [9.5, 9.5, 9.5],
                "segments_channel": [0, 1, 0],
                "nb_turns": 2,
            },
        }
        mpath = str(tmp_path / "data-turns-st.json")
        json.dump(manifest, open(mpath, "w"))
        # hypothesis RTTM keyed by utterance id (CTC-spike output format)
        hyp = str(tmp_path / "RTTM_dev_turn.csv")
        _write_rttm(hyp, [("c1-A-0-3000", 9.8, 0.1, "turn"),
                          ("c1-A-0-3000", 19.9, 0.1, "turn")])
        out = str(tmp_path / "report.json")
        monkeypatch.setattr(sys, "argv", [
            "run_eval_speaker_change.py", "--manifest", mpath,
            "--rttm", hyp, "--out", out,
        ])
        cli.main()
        report = json.load(open(out))
        assert report, "empty report"
        # 0.5 s tolerance: both hyp points are within 0.5 of the true
        # changes (10.0, 20.0) -> perfect recall
        at_half = [m for m in report if m["tolerance"] == pytest.approx(0.5)]
        assert at_half and at_half[0]["recall"] == pytest.approx(1.0)
