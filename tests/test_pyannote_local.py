"""Execute the pyannote baseline's real model path in-image via the
first-party local backend (stac_st_tpu/eval/pyannote_local.py).

Unlike tests/test_pyannote_baseline.py (stubbed pyannote), this trains a
miniature PyanNet-architecture checkpoint on synthetic two-speaker audio
and drives the REAL inference math — sliding windows, pre_aggregation_hook,
Hamming overlap-add, Binarize hysteresis, Peak partitioning — through the
unchanged baseline entry points (reference
evaluations/pyannote/eval_pyannote.py:91-132 semantics).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from stac_st_tpu.data.audio import write_wav
from stac_st_tpu.eval.pyannote_local import (
    Binarize,
    LocalInference,
    Peak,
    Segment,
    SlidingWindowFeature,
    SlidingWindowFrames,
    Timeline,
    build_local_segmentation_checkpoint,
    load_local_model,
)

SR = 16000


def _two_speaker_wav(seconds=8.0, seed=0):
    """Matches the checkpoint's training distribution: spk0 = 500 Hz tone,
    spk1 = 3 kHz tone, near-zero silence."""
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    wav = np.zeros(n, np.float32)
    regions = [(0.5, 3.0, 500.0), (4.0, min(7.0, seconds - 0.5), 3000.0)]
    for start, end, carrier in regions:
        i0, i1 = int(start * SR), int(end * SR)
        tt = np.arange(i1 - i0) / SR
        wav[i0:i1] = (0.5 * np.sin(2 * np.pi * carrier * tt)
                      + 0.1 * rng.standard_normal(i1 - i0)).astype(np.float32)
    return wav, regions


@pytest.fixture(scope="module")
def local_ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pyannote_local") / "seg.pt")
    build_local_segmentation_checkpoint(path, seed=0, train_steps=120)
    return path


def test_checkpoint_roundtrip_and_shapes(local_ckpt):
    model = load_local_model(local_ckpt)
    import torch

    with torch.no_grad():
        out = model(torch.zeros(2, 1, int(model.duration * SR)))
    assert out.shape[0] == 2 and out.shape[2] == model.n_speakers
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_local_model_learned_vad(local_ckpt):
    """The briefly trained model must separate speech from silence: mean
    max-speaker posterior higher on tone regions than on silence."""
    model = load_local_model(local_ckpt)
    wav, regions = _two_speaker_wav()
    inf = LocalInference(model, pre_aggregation_hook=lambda o: np.max(
        o, axis=2, keepdims=True))
    track = inf(wav)
    step = track.sliding_window.step
    times = np.array([track.frame_time(i) for i in range(len(track.data))])
    speech_mask = np.zeros(len(times), bool)
    for start, end, _ in regions:
        speech_mask |= (times >= start + 0.2) & (times <= end - 0.2)
    sil_mask = np.zeros(len(times), bool)
    sil_mask |= times < 0.3
    sil_mask |= (times > 3.2) & (times < 3.8)
    score = track.data[:, 0]
    assert step > 0
    assert score[speech_mask].mean() > score[sil_mask].mean() + 0.15, (
        score[speech_mask].mean(), score[sil_mask].mean())


def test_manifest_model_path_end_to_end(local_ckpt, tmp_path):
    """reference eval_pyannote.py segmentation branch: manifest -> VAD+SCD
    -> RTTM, entirely through run_pyannote_manifest(backend='local')."""
    from stac_st_tpu.eval.pyannote_baseline import run_pyannote_manifest

    wav, regions = _two_speaker_wav()
    wav_path = str(tmp_path / "conv.wav")
    write_wav(wav_path, wav, SR)
    manifest = str(tmp_path / "manifest.json")
    with open(manifest, "w") as f:
        json.dump({"conv-a": {"wav": "{data_root}/conv.wav"}}, f)

    out_rttm = str(tmp_path / "hyp.rttm")
    lines = run_pyannote_manifest(
        manifest, out_rttm, pipeline="pyannote/segmentation",
        model_name=local_ckpt, data_root=str(tmp_path), backend="local")

    assert lines and os.path.exists(out_rttm)
    for line in lines:
        parts = line.split()
        assert parts[0] == "SPEAKER" and parts[1] == "conv-a"
        start, dur = float(parts[3]), float(parts[4])
        assert dur > 0
        # every detected region must lie inside the overall extent
        assert 0.0 <= start <= start + dur <= 8.5
    # regions come from Peak.crop(speech): they must overlap true speech
    # (0.3 s edge slack: overlap-add smears VAD boundaries by a few frames)
    speech = [(s - 0.3, e + 0.3) for s, e, _ in regions]
    for line in lines:
        parts = line.split()
        start, dur = float(parts[3]), float(parts[4])
        assert any(min(e, start + dur) - max(s, start) > 0
                   for s, e in speech), line
    # the scorer consumes this RTTM unchanged
    with open(out_rttm) as f:
        assert f.read().count("SPEAKER conv-a") == len(lines)


def test_driver_cli_local_backend(local_ckpt, tmp_path):
    wav, _ = _two_speaker_wav(seconds=6.0)
    wav_path = str(tmp_path / "conv0.wav")
    write_wav(wav_path, wav, SR)
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable,
         os.path.join(repo, "evaluations/pyannote/run_pyannote_baseline.py"),
         "--wavs", wav_path, "--mode", "segmentation",
         "--backend", "local", "--model", local_ckpt, "--out", out],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr
    rttm = os.path.join(out, "conv0.rttm")
    assert os.path.exists(rttm)
    assert "SPEAKER" in open(rttm).read()


# ---------------------------------------------------------------------------
# Deterministic unit semantics for the signal utilities (no model involved)
# ---------------------------------------------------------------------------


def _track(values, step=0.1):
    return SlidingWindowFeature(
        np.asarray(values, np.float32)[:, None],
        SlidingWindowFrames(0.0, step, step))


def test_binarize_hysteresis_and_min_durations():
    y = [0.1] * 5 + [0.9] * 10 + [0.1] * 2 + [0.9] * 10 + [0.1] * 5
    # min_duration_off larger than the 0.2 s dip: regions merge
    merged = Binarize(onset=0.5, min_duration_off=0.5)(_track(y))
    assert len(merged) == 1
    split = Binarize(onset=0.5, min_duration_off=0.05)(_track(y))
    assert len(split) == 2
    # min_duration_on drops a short blip
    blip = [0.1] * 5 + [0.9] * 2 + [0.1] * 5
    assert len(Binarize(onset=0.5, min_duration_on=0.5)(_track(blip))) == 0


def test_peak_partitions_at_local_maxima():
    y = np.zeros(60, np.float32)
    y[15] = 0.8
    y[40] = 0.6
    tl = Peak(alpha=0.05, min_duration=0.5)(_track(y))
    # two peaks -> three partition segments spanning the extent
    assert len(tl) == 3
    bounds = [s.start for s in tl] + [tl.segments[-1].end]
    assert bounds[0] == 0.0
    assert abs(tl.segments[0].end - _track(y).frame_time(15)) < 1e-6
    assert abs(tl.segments[1].end - _track(y).frame_time(40)) < 1e-6


def test_peak_min_duration_suppression():
    y = np.zeros(60, np.float32)
    y[20] = 0.8
    y[23] = 0.7  # 0.3 s away, weaker: suppressed at min_duration=1.0
    tl = Peak(alpha=0.05, min_duration=1.0)(_track(y))
    assert len(tl) == 2


def test_timeline_crop_intersection():
    peaks = Timeline([Segment(0.0, 2.0), Segment(2.0, 5.0),
                      Segment(5.0, 8.0)])
    speech = Timeline([Segment(1.0, 3.0), Segment(6.0, 7.0)])
    cropped = peaks.crop(speech)
    got = [(s.start, s.end) for s in cropped]
    assert got == [(1.0, 2.0), (2.0, 3.0), (6.0, 7.0)]


# ---------------------------------------------------------------------------
# Diarization pipeline (speaker-diarization@2.1 semantics, local backend)
# ---------------------------------------------------------------------------


def test_agglomerative_cluster_constrained_and_threshold():
    from stac_st_tpu.eval.pyannote_local import agglomerative_cluster

    rng = np.random.default_rng(0)
    centers = np.eye(3, 8)
    emb = np.concatenate([
        centers[i] + 0.01 * rng.standard_normal((4, 8)) for i in range(3)
    ])
    # constrained: exactly 2 clusters even though 3 natural groups exist
    labels2 = agglomerative_cluster(emb, num_clusters=2)
    assert labels2.max() == 1
    # unconstrained with a tight threshold: recovers the 3 groups
    labels3 = agglomerative_cluster(emb, threshold=0.5)
    assert labels3.max() == 2
    for g in range(3):
        group = labels3[g * 4:(g + 1) * 4]
        assert (group == group[0]).all()
    # degenerate inputs
    assert agglomerative_cluster(np.zeros((0, 4))).shape == (0,)
    assert (agglomerative_cluster(np.ones((1, 4)), num_clusters=2)
            == np.array([0])).all()


def test_spectral_embedding_separates_carriers():
    from stac_st_tpu.eval.pyannote_local import spectral_embedding

    tt = np.arange(SR) / SR
    low = np.sin(2 * np.pi * 500.0 * tt).astype(np.float32)
    high = np.sin(2 * np.pi * 3000.0 * tt).astype(np.float32)
    e_low1 = spectral_embedding(low[: SR // 2])
    e_low2 = spectral_embedding(low[SR // 2:])
    e_high = spectral_embedding(high)
    same = float(e_low1 @ e_low2)
    cross = float(e_low1 @ e_high)
    assert same > cross + 0.2, (same, cross)


def test_diarization_pipeline_end_to_end(local_ckpt, tmp_path):
    """reference eval_pyannote.py diarization branch: manifest ->
    Pipeline.from_pretrained -> pipe(wav, min_speakers=1, num_speakers=2)
    -> labeled RTTM, through run_pyannote_manifest(backend='local')."""
    from stac_st_tpu.eval.pyannote_baseline import run_pyannote_manifest

    wav, regions = _two_speaker_wav(seconds=10.0)
    wav_path = str(tmp_path / "conv.wav")
    write_wav(wav_path, wav, SR)
    manifest = str(tmp_path / "manifest.json")
    with open(manifest, "w") as f:
        json.dump({"conv-d": {"wav": "{data_root}/conv.wav"}}, f)

    out_rttm = str(tmp_path / "hyp_diar.rttm")
    lines = run_pyannote_manifest(
        manifest, out_rttm,
        pipeline="pyannote/speaker-diarization@2.1",
        model_name=local_ckpt, data_root=str(tmp_path), backend="local")

    assert lines and os.path.exists(out_rttm)
    labels = set()
    votes = {}  # region index -> {label: overlap seconds}
    for line in lines:
        parts = line.split()
        assert parts[0] == "SPEAKER" and parts[1] == "conv-d"
        start, dur, label = float(parts[3]), float(parts[4]), parts[7]
        assert dur > 0
        labels.add(label)
        for r, (s, e, _) in enumerate(regions):
            ov = min(e, start + dur) - max(s, start)
            if ov > 0:
                votes.setdefault(r, {})
                votes[r][label] = votes[r].get(label, 0.0) + ov
    # num_speakers=2 constraint: exactly two labels on two-speaker audio
    assert len(labels) == 2, lines
    # each true region is dominated by a different speaker label
    assert set(votes) == {0, 1}, votes
    top = {r: max(v, key=v.get) for r, v in votes.items()}
    assert top[0] != top[1], (votes, lines)


def test_diarization_pipeline_single_speaker_collapses(local_ckpt, tmp_path):
    """Unconstrained clustering on one-speaker audio yields one label."""
    from stac_st_tpu.eval.pyannote_local import LocalDiarizationPipeline

    rng = np.random.default_rng(1)
    n = int(8.0 * SR)
    wav = np.zeros(n, np.float32)
    tt = np.arange(int(6.0 * SR)) / SR
    i0 = int(1.0 * SR)
    wav[i0:i0 + len(tt)] = (0.5 * np.sin(2 * np.pi * 500.0 * tt)
                            + 0.1 * rng.standard_normal(len(tt)))
    pipe = LocalDiarizationPipeline.from_pretrained(local_ckpt)
    ann = pipe(wav, min_speakers=1)
    got = {label for _, _, label in ann.itertracks(yield_label=True)}
    assert len(got) == 1, got
