"""Speaker-change scorer parity vs the REFERENCE'S OWN get_f1_score.py.

Runs the reference's ``evaluate_speaker_turn_detection_davidhzc`` (its deps
— numpy/pandas/scipy — are installed; it prints its metrics) on randomized
RTTM fixtures covering merges, jitter, insertions, deletions, zero-gap
turns, overlapping turns, and the single-speaker-label path, and asserts
our :func:`stac_st_tpu.eval.speaker_change.evaluate_speaker_turn_detection`
reproduces precision/recall/F1/miss/FA at every tolerance in the grid.
"""

import contextlib
import importlib.util
import io
import os
import random
import re

import pytest

from stac_st_tpu.eval.speaker_change import (
    TOLERANCE_GRID,
    evaluate_speaker_turn_detection,
)

REF_SCRIPT = "/root/reference/evaluations/vad_shas/get_f1_score.py"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_SCRIPT), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_mod():
    spec = importlib.util.spec_from_file_location("ref_f1", REF_SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_rttm(path, rows):
    with open(path, "w") as f:
        for name, start, dur, spk in rows:
            f.write(
                f"SPEAKER {name} 1 {start} {dur} <NA> <NA> {spk} <NA> <NA>\n"
            )


def _make_conversation(rng, n=14, zero_gaps=False, overlaps=False):
    """Reference RTTM: alternating speakers, gaps/zero-gaps/overlaps."""
    rows, t = [], rng.uniform(0.0, 2.0)
    for i in range(n):
        dur = rng.uniform(0.8, 4.0)
        rows.append(("conv", round(t, 3), round(dur, 3),
                     "A" if i % 2 == 0 else "B"))
        gap = 0.0 if (zero_gaps and i % 3 == 0) else rng.uniform(0.05, 1.2)
        if overlaps and i % 4 == 1:
            gap = -rng.uniform(0.05, 0.4)
        t = t + dur + gap
    return rows


def _make_hyp(rng, ref_rows, multi_speaker=True):
    """Jittered hypothesis: drop some boundaries, insert spurious ones."""
    rows = []
    spk_cycle = ["S1", "S2", "S3"]
    k = 0
    for name, start, dur, _ in ref_rows:
        if rng.random() < 0.15:  # merge into previous (missed change)
            if rows:
                pname, pstart, pdur, pspk = rows[-1]
                rows[-1] = (pname, pstart,
                            round(start + dur - pstart, 3), pspk)
                continue
        js = start + rng.uniform(-0.3, 0.3)
        jd = max(0.2, dur + rng.uniform(-0.3, 0.3))
        spk = spk_cycle[k % 3] if multi_speaker else "SPK"
        rows.append((name, round(js, 3), round(jd, 3), spk))
        k += 1
        if rng.random() < 0.2:  # spurious extra segment (false alarm)
            rows.append((name, round(js + jd / 2, 3),
                         round(jd / 3, 3), spk_cycle[(k + 1) % 3]))
            k += 1
    return rows


def _oracle_metrics(ref_mod, ref_path, hyp_path, tolerance):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ref_mod.evaluate_speaker_turn_detection_davidhzc(
            ref_rttm_file_path=ref_path,
            hyp_rttm_file_path=hyp_path,
            tolerances=[tolerance],
            merge_overlap_gt_regions=True,
            calclate_mean_turn_point_in_time=False,
        )
    m = re.search(
        r"^([\d.]+)s: ([\d.]+) ([\d.]+) ([\d.]+) ([\d.]+) ([\d.]+)$",
        buf.getvalue(), re.M,
    )
    assert m, f"could not parse oracle output:\n{buf.getvalue()}"
    counts = re.search(r"tolerance=[\d.]+s: (\d+)", buf.getvalue())
    return [float(x) for x in m.groups()[1:]], int(counts.group(1))


@pytest.mark.parametrize("case", range(8))
def test_region_scorer_matches_reference(ref_mod, tmp_path, case):
    rng = random.Random(1000 + case)
    ref_rows = _make_conversation(
        rng, n=10 + case, zero_gaps=case % 2 == 0, overlaps=case % 3 == 0
    )
    hyp_rows = _make_hyp(rng, ref_rows, multi_speaker=case != 3)
    ref_path, hyp_path = str(tmp_path / "ref.rttm"), str(tmp_path / "hyp.rttm")
    _write_rttm(ref_path, ref_rows)
    _write_rttm(hyp_path, hyp_rows)

    ours = evaluate_speaker_turn_detection(
        ref_path, hyp_path, tolerances=TOLERANCE_GRID
    )
    for tol, got in zip(TOLERANCE_GRID, ours):
        (p, r, f1, miss, fa), n_gt = _oracle_metrics(
            ref_mod, ref_path, hyp_path, tol
        )
        assert got["num_gt_regions"] == n_gt, tol
        assert abs(got["precision"] - p) < 5e-3, (tol, got, p)
        assert abs(got["recall"] - r) < 5e-3, (tol, got, r)
        assert abs(got["f1"] - f1) < 5e-3, (tol, got, f1)
        assert abs(got["miss"] - miss) < 5e-3, tol
        assert abs(got["fa"] - fa) < 5e-3, tol


def test_mean_turn_point_mode(ref_mod, tmp_path):
    rng = random.Random(7)
    ref_rows = _make_conversation(rng, n=12)
    hyp_rows = _make_hyp(rng, ref_rows)
    ref_path, hyp_path = str(tmp_path / "r.rttm"), str(tmp_path / "h.rttm")
    _write_rttm(ref_path, ref_rows)
    _write_rttm(hyp_path, hyp_rows)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ref_mod.evaluate_speaker_turn_detection_davidhzc(
            ref_rttm_file_path=ref_path, hyp_rttm_file_path=hyp_path,
            tolerances=[0.25], merge_overlap_gt_regions=True,
            calclate_mean_turn_point_in_time=True,
        )
    m = re.search(
        r"^0\.25s: ([\d.]+) ([\d.]+) ([\d.]+) ([\d.]+) ([\d.]+)$",
        buf.getvalue(), re.M,
    )
    ours = evaluate_speaker_turn_detection(
        ref_path, hyp_path, tolerances=[0.25], mean_turn_point=True
    )[0]
    expected = [float(x) for x in m.groups()]
    for key, exp in zip(("precision", "recall", "f1", "miss", "fa"),
                        expected):
        assert abs(ours[key] - exp) < 5e-3, key
