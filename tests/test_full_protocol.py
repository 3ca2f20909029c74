"""One-command long-form L7 protocol driver (VERDICT r3 item 4).

Runs `evaluations/vad_shas/run_full_protocol.py` end to end on a tiny
fixture (2 training epochs — plumbing gate, not a quality gate): corpus →
train → segmentation grid (pause + SHAS pDAC) → engine.long_form decode →
minimum-WER realign → BLEU/WER ± turn-marker variants → speaker-change
F1 over the tolerance grid.
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "evaluations",
                    "vad_shas"))


def test_full_protocol_runs_end_to_end(tmp_path):
    import run_full_protocol as proto

    rows, f1_rows = proto.main([
        "--epochs", "2", "--utts", "8", "--convs", "1",
        "--utts-per-conv", "3", "--grid", "pause,shas_3_6",
        "--workdir", str(tmp_path),
    ])

    assert [r["grid"] for r in rows] == ["pause", "shas_3_6"]
    for r in rows:
        assert r["segments"] >= 1
        for k in ("st_bleu", "asr_wer", "st_bleu_with_turns",
                  "asr_wer_with_turns"):
            assert np.isfinite(r[k]), (r, k)
    # pause VAD must split the 3-utterance conversation into roughly one
    # segment per utterance (a range, not ==3: this is a plumbing gate,
    # and retuned pause_based_segments defaults should not fail it —
    # ADVICE r4 item 4); SHAS at (min 3 s, max 6 s) must not be finer
    assert 2 <= rows[0]["segments"] <= 4
    assert rows[1]["segments"] <= rows[0]["segments"]

    # the F1 grid covers the reference tolerance grid
    from stac_st_tpu.eval.speaker_change import TOLERANCE_GRID

    assert len(f1_rows) == len(list(TOLERANCE_GRID))
    for d in f1_rows:
        assert 0.0 <= d["f1"] <= 1.0
