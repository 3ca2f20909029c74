"""SHAS/WebRTC segmentation pipeline tests.

Behavioral tests for the collector/pDAC, plus golden-oracle tests that run
the REFERENCE'S OWN ``mask_wav_files.py`` / ``create_json_and_segment.py``
(with torchaudio shimmed onto wave-file IO) and assert byte-identical JSON
and sample-identical masked audio.
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

from stac_st_tpu.data.audio import read_audio, write_wav
from stac_st_tpu.prep.shas import (
    EnergyFrameVAD,
    create_json_and_segment,
    frame_generator,
    mask_wav_files,
    pause_based_segmentation,
    pdac,
    shas_segmentation,
    vad_collector,
    write_segmentation_yaml,
)

REF_DIR = "/root/reference/datasets/fisher_callhome"


def _tone_with_silences(rng, total_s=20.0, rate=16000):
    """Speech-like bursts separated by silences: known voiced regions."""
    n = int(total_s * rate)
    x = np.zeros(n, np.float32)
    voiced = [(1.0, 4.0), (6.0, 12.0), (14.0, 19.0)]
    for lo, hi in voiced:
        t = np.arange(int((hi - lo) * rate)) / rate
        burst = 0.3 * np.sin(2 * np.pi * 220 * t)
        burst += 0.1 * rng.standard_normal(len(t)).astype(np.float32)
        x[int(lo * rate): int(lo * rate) + len(t)] = burst
    return x, voiced


def test_frame_generator_contract():
    x = np.zeros(16000, np.float32)
    frames = frame_generator(x, 16000, 10)
    assert len(frames) == 100
    assert frames[0][1].dtype == np.int16
    assert frames[1][0] == pytest.approx(0.01)
    with pytest.raises(ValueError):
        frame_generator(x, 16000, 25)


def test_vad_collector_finds_voiced_regions():
    rng = np.random.default_rng(0)
    x, voiced = _tone_with_silences(rng)
    frames = frame_generator(x, 16000, 10)
    segs = vad_collector(frames, EnergyFrameVAD(1), 16000, 10, 300)
    assert len(segs) == len(voiced)
    for (off, dur), (lo, hi) in zip(segs, voiced):
        assert abs(off - lo) < 0.4
        assert abs((off + dur) - hi) < 0.4


def test_pdac_respects_max_and_splits_at_valleys():
    # 60 s of probs at 50 Hz with deep valleys at 20 s and 40 s
    probs = np.full(3000, 0.9, np.float32)
    probs[1000] = 0.55  # valley at 20 s (above trim threshold)
    probs[2000] = 0.55  # valley at 40 s
    segs = pdac(probs, max_segment_length=25.0, min_segment_length=5.0)
    assert all(dur <= 25.0 + 1e-6 for _, dur in segs)
    bounds = sorted(off for off, _ in segs)
    assert any(abs(b - 20.0) < 0.05 for b in bounds)
    assert any(abs(b - 40.0) < 0.05 for b in bounds)


def test_pdac_trims_low_probability_edges():
    probs = np.concatenate([
        np.full(100, 0.1), np.full(500, 0.95), np.full(100, 0.1)
    ]).astype(np.float32)
    segs = pdac(probs, max_segment_length=30.0, min_segment_length=1.0)
    assert len(segs) == 1
    off, dur = segs[0]
    assert off == pytest.approx(2.0)   # 100 frames * 0.02 s
    assert dur == pytest.approx(10.0)  # 500 frames


def test_pause_and_shas_segmentation_on_wav(tmp_path):
    rng = np.random.default_rng(1)
    x, _ = _tone_with_silences(rng)
    wav = str(tmp_path / "conv.wav")
    write_wav(wav, x, 16000)
    pause = pause_based_segmentation(wav)
    assert len(pause) >= 2 and all(s["wav"] == "conv.wav" for s in pause)
    shas = shas_segmentation(wav, 2.0, 8.0)
    assert shas and all(s["duration"] <= 8.0 + 1e-6 for s in shas)


# ---------------------------------------------------------------------------
# oracle tests vs the reference scripts
# ---------------------------------------------------------------------------

@pytest.fixture()
def ref_env(monkeypatch):
    """Import reference mask/create scripts with torchaudio shimmed."""
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout not available")

    import torch

    def ta_load(path, frame_offset=0, num_frames=-1):
        samples, rate = read_audio(path)
        if num_frames >= 0:
            samples = samples[frame_offset: frame_offset + num_frames]
        elif frame_offset:
            samples = samples[frame_offset:]
        return torch.from_numpy(np.asarray(samples, np.float32))[None, :], rate

    def ta_save(path, src, sample_rate, **kwargs):
        write_wav(path, src.numpy()[0], sample_rate)

    ta = types.ModuleType("torchaudio")
    ta.load = ta_load
    ta.save = ta_save
    monkeypatch.setitem(sys.modules, "torchaudio", ta)

    def load(alias, filename):
        spec = importlib.util.spec_from_file_location(
            alias, os.path.join(REF_DIR, filename)
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    return {
        "mask": load("ref_mask", "mask_wav_files.py"),
        "create": load("ref_create", "create_json_and_segment.py"),
    }


def _fixture_corpus(tmp_path, rng):
    """Two conversations + GT manifest keyed <rec>-<ch>-<start>-<end>."""
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    gt = {}
    for rec in ("sp_0001", "sp_0002"):
        x, voiced = _tone_with_silences(rng)
        write_wav(str(wav_dir / f"{rec}.wav"), x, 16000)
        for lo, hi in voiced:
            uid = f"{rec}-A-{int(lo * 100):06d}-{int(hi * 100):06d}"
            gt[uid] = {"wav": f"{rec}.wav", "duration": hi - lo}
    gt_path = tmp_path / "data.json"
    gt_path.write_text(json.dumps(gt))
    return str(wav_dir), str(gt_path), gt


def test_mask_wav_files_matches_reference(ref_env, tmp_path, monkeypatch):
    rng = np.random.default_rng(2)
    wav_dir, gt_path, _ = _fixture_corpus(tmp_path, rng)
    ref_out, my_out = tmp_path / "ref_masked", tmp_path / "my_masked"
    ref_out.mkdir()

    monkeypatch.setattr(
        sys, "argv", ["mask_wav_files.py", gt_path, wav_dir, str(ref_out)]
    )
    ref_env["mask"].main()
    mask_wav_files(gt_path, wav_dir, str(my_out))

    for rec in ("sp_0001", "sp_0002"):
        a, _ = read_audio(str(ref_out / f"{rec}.wav"))
        b, _ = read_audio(str(my_out / f"{rec}.wav"))
        np.testing.assert_array_equal(a, b)


def test_create_json_and_segment_matches_reference(ref_env, tmp_path,
                                                   monkeypatch):
    rng = np.random.default_rng(3)
    wav_dir, gt_path, _ = _fixture_corpus(tmp_path, rng)

    # segmentation yaml from the pause-based method, plus one
    # out-of-bounds segment that must be dropped by the boundary filter
    segments = []
    for rec in ("sp_0001", "sp_0002"):
        segments += pause_based_segmentation(
            os.path.join(wav_dir, f"{rec}.wav")
        )
    segments.append({"duration": 0.4, "offset": 19.5, "rW": 0, "uW": 0,
                     "speaker_id": "NA", "wav": "sp_0001.wav"})
    yaml_path = str(tmp_path / "shas_output.yaml")
    write_segmentation_yaml(segments, yaml_path)

    ref_base, my_base = tmp_path / "ref_base", tmp_path / "my_base"
    for base in (ref_base, my_base):
        base.mkdir()
        (base / "data.json").write_text(open(gt_path).read())
        (base / "reseg").mkdir()

    monkeypatch.setattr(sys, "argv", [
        "create_json_and_segment.py", yaml_path, str(ref_base), wav_dir,
        str(ref_base / "reseg"),
    ])
    ref_env["create"].main()
    create_json_and_segment(
        yaml_path, str(my_base), wav_dir, str(my_base / "reseg")
    )

    for task in ("asr", "st"):
        ref_json = json.load(open(ref_base / f"data-resegmented-{task}.json"))
        my_json = json.load(open(my_base / f"data-resegmented-{task}.json"))
        # identical keys, identical fields (wav differs only by base dir)
        assert list(ref_json) == list(my_json)
        for uid in ref_json:
            r, m = dict(ref_json[uid]), dict(my_json[uid])
            assert os.path.basename(r.pop("wav")) == \
                os.path.basename(m.pop("wav"))
            assert r == m, uid
        # the out-of-bounds segment was filtered
        assert not any(uid.endswith("-001950-001990") for uid in my_json)
    # cut wavs are sample-identical
    for uid in json.load(open(my_base / "data-resegmented-asr.json")):
        a, _ = read_audio(str(ref_base / "reseg" / f"{uid}.wav"))
        b, _ = read_audio(str(my_base / "reseg" / f"{uid}.wav"))
        np.testing.assert_array_equal(a, b)
