"""fix_rttm vs the REFERENCE'S OWN fix_RTTM.py / fix_RTTM_pyannote.py:
byte-identical ref/hyp RTTM outputs on randomized turns manifests."""

import importlib.util
import json
import os
import random
import sys
import types

import pytest

from stac_st_tpu.eval.rttm_fix import fix_rttm

REF_VAD = "/root/reference/evaluations/vad_shas/fix_RTTM.py"
REF_PYA = "/root/reference/evaluations/pyannote/fix_RTTM_pyannote.py"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_VAD), reason="reference checkout not available"
)


def _load_ref(path, alias):
    sys.modules.setdefault("ipdb", types.ModuleType("ipdb"))
    spec = importlib.util.spec_from_file_location(alias, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fixture(tmp_path, rng, n_utts=6):
    """Turns manifest (reference string schema) + model RTTM csv."""
    gt = {}
    pred_lines = []
    t_abs = 0.0
    for i in range(n_utts):
        n_seg = rng.randint(1, 4)
        starts, durs = [], []
        t = 0.0
        for _ in range(n_seg):
            d = round(rng.uniform(1.0, 5.0), 2)
            starts.append(round(t, 2))
            durs.append(d)
            t += d + rng.uniform(0.0, 0.5)
        uid = f"rec{i:02d}-0-{int(t_abs * 100):06d}-{int((t_abs + t) * 100):06d}"
        gt[f"{uid}-st"] = {
            "wav": f"/data/wavs/{uid}.wav",
            "source_lang": "es", "target_lang": "en",
            "nb_turns": n_seg - 1,
            "segments_start": " ".join(str(s) for s in starts),
            "segments_duration": " ".join(str(d) for d in durs),
            "segments_channel": " ".join(
                str(j % 2) for j in range(n_seg)
            ),
            "duration": round(t, 2),
            "task": "translation",
            "transcription": "hola",
        }
        # model events on the ABSOLUTE clock (uid offset + within-utt time)
        n_ev = rng.randint(0, 4)
        for _ in range(n_ev):
            ev = t_abs + rng.uniform(0, t)
            pred_lines.append(
                f"SPEAKER {uid}-st 1 {ev:.4f} 0.0400 <NA> <NA> "
                f"[turn] <NA> <NA>"
            )
        t_abs += t + 5.0
    # one utterance with no predictions at all gets skipped by the fixer
    gt["recXX-0-999000-999400-st"] = {
        "wav": "/data/wavs/recXX-0-999000-999400.wav",
        "segments_start": "0.0", "segments_duration": "4.0",
        "segments_channel": "0", "duration": 4.0,
    }
    gt_path = tmp_path / "data-turns-st.json"
    gt_path.write_text(json.dumps(gt))
    rttm_path = tmp_path / "RTTM_dev_turn.csv"
    rttm_path.write_text("\n".join(pred_lines) + "\n")
    return str(gt_path), str(rttm_path)


@pytest.mark.parametrize("case", range(4))
def test_fix_rttm_matches_reference(tmp_path, case):
    rng = random.Random(100 + case)
    gt_path, rttm_path = _fixture(tmp_path, rng)
    ref_out = tmp_path / "ref_out"
    my_out = tmp_path / "my_out"
    ref_out.mkdir()
    my_out.mkdir()

    ref_mod = _load_ref(REF_VAD, "ref_fix_rttm")
    args = types.SimpleNamespace(
        gt_json=gt_path, pred_rttm=rttm_path, output_folder=str(ref_out)
    )
    ref_mod.main(args)
    my_ref, my_hyp = fix_rttm(gt_path, rttm_path, str(my_out))

    for name in ("RTTM_dev_turn.ref.rttm", "RTTM_dev_turn.hyp.rttm"):
        expected = (ref_out / name).read_bytes()
        got = (my_out / name).read_bytes()
        assert got == expected, name
    assert os.path.basename(my_ref) == "RTTM_dev_turn.ref.rttm"


def test_fix_rttm_pyannote_variant_matches_reference(tmp_path):
    rng = random.Random(9)
    gt_path, rttm_path = _fixture(tmp_path, rng)
    ref_out = tmp_path / "ref_out"
    my_out = tmp_path / "my_out"
    ref_out.mkdir()
    my_out.mkdir()

    ref_mod = _load_ref(REF_PYA, "ref_fix_rttm_pya")
    args = types.SimpleNamespace(
        gt_json=gt_path, pred_rttm=rttm_path, output_folder=str(ref_out)
    )
    ref_mod.main(args)
    fix_rttm(gt_path, rttm_path, str(my_out), relative_from_uid=False)

    for name in ("RTTM_dev_turn.ref.rttm", "RTTM_dev_turn.hyp.rttm"):
        assert (my_out / name).read_bytes() == (ref_out / name).read_bytes()
