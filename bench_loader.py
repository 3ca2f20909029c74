#!/usr/bin/env python3
"""Host data-pipeline throughput bench: audio-seconds/second of batch
production (decode + resample + speed perturb + collate), wav and sph.

The envelope: the measured TPU device rate is ≈ 3,970 audio-s/s
(docs/PERF.md); the loader must stay ahead of it (target ≥ 2×, i.e. the
device never waits on the host — reference equivalent: ``num_workers: 32``,
yaml:74).

    python bench_loader.py [--utts 160] [--seconds 8] [--workers 1 4 8]

Prints one JSON line per (format, num_workers) configuration plus a
summary line comparing the best rate to the device envelope.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stac_st_tpu.data.audio import write_wav
from stac_st_tpu.data.dataset import SpeechDataset
from stac_st_tpu.data.loader import BatchLoader
from stac_st_tpu.data.sampler import DynamicBatchSampler
from stac_st_tpu.ops.speed_perturb import SpeedPerturb

DEVICE_RATE = 8038.0  # audio-s/s (bf16 + rbg step, docs/PERF.md)


def _write_sphere(path, samples, rate=8000):
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    header = (
        "NIST_1A\n   1024\n"
        f"sample_rate -i {rate}\n"
        "channel_count -i 1\n"
        "sample_n_bytes -i 2\n"
        "sample_byte_format -s2 01\n"
        "sample_coding -s3 pcm\n"
        "end_head\n"
    ).encode()
    with open(path, "wb") as f:
        f.write(header + b" " * (1024 - len(header)))
        f.write(pcm.tobytes())


def build_corpus(root, fmt, n_utts, seconds):
    """n_utts synthetic utterances; sph at 8 kHz (forces resample to 16k)."""
    rng = np.random.default_rng(0)
    rate = 8000 if fmt == "sph" else 16000
    manifest = {}
    os.makedirs(root, exist_ok=True)
    for i in range(n_utts):
        dur = seconds * (0.5 + rng.random())  # 0.5x..1.5x nominal
        x = 0.2 * rng.standard_normal(int(dur * rate)).astype(np.float32)
        path = os.path.join(root, f"utt{i:04d}.{fmt}")
        if fmt == "sph":
            _write_sphere(path, x, rate)
        else:
            write_wav(path, x, rate)
        manifest[f"utt{i:04d}"] = {
            "wav": path,
            "duration": round(dur, 3),
            "task": "translation",
            "source_lang": "es",
            "target_lang": "en",
        }
    mpath = os.path.join(root, "data.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    return mpath


def bench(manifest, num_workers, epochs=2, device_perturb=True):
    if device_perturb:
        # production config: DeviceSpeedPerturb resamples on the TPU inside
        # the jitted step; the host only samples a per-utterance speed index
        from stac_st_tpu.ops.speed_perturb import DeviceSpeedPerturb

        perturb = DeviceSpeedPerturb(16000, [90, 100, 110])
        perturb.seed(1234)
    else:
        perturb = SpeedPerturb(speeds=[95, 100, 105], seed=1234)
    ds = SpeechDataset(
        manifest,
        tokenizer=None,
        speed_perturb=perturb,
    )
    sampler = DynamicBatchSampler(
        ds.durations(), max_batch_length=450.0, num_buckets=20, shuffle=True
    )
    loader = BatchLoader(ds, sampler=sampler, num_workers=num_workers,
                         prefetch=4)
    # warmup epoch (page cache, thread pool spin-up)
    for _ in loader:
        pass
    total_audio = 0.0
    t0 = time.perf_counter()
    for epoch in range(epochs):
        loader.set_epoch(epoch + 1)
        for batch in loader:
            # lengths are relative to the padded width (SB convention)
            width = batch.sig.data.shape[1]
            total_audio += float(np.sum(batch.sig.lengths)) * width / 16000.0
    dt = time.perf_counter() - t0
    return total_audio / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=160)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    best = {}
    try:
        for fmt in ("wav", "sph"):
            manifest = build_corpus(
                os.path.join(tmp, fmt), fmt, args.utts, args.seconds
            )
            for nw in args.workers:
                for dev_p in (True, False):
                    rate = bench(manifest, nw, args.epochs, dev_p)
                    print(json.dumps({
                        "metric": "loader_audio_seconds_per_second",
                        "format": fmt,
                        "num_workers": nw,
                        "speed_perturb": "device" if dev_p else "host",
                        "value": round(rate, 1),
                        "unit": "audio-s/s",
                        "vs_device_rate": round(rate / DEVICE_RATE, 2),
                    }))
                    if dev_p:  # headroom gate uses the production config
                        best[fmt] = max(best.get(fmt, 0.0), rate)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # Headroom accounting: this box has ONE host core, so the measured
    # rate is per-core. After the train step doubled (docs/PERF.md:
    # 3,970 -> 8,038 audio-s/s), one core no longer holds 2x headroom —
    # report how many cores the production pipeline needs for it
    # (workers scale across cores; the reference assumes 32, yaml:74).
    ncores = os.cpu_count() or 1
    worst = min(best.values()) if best else 0.0
    cores_for_2x = (
        int(np.ceil(2 * DEVICE_RATE / (worst / ncores))) if worst else -1
    )
    ok = worst >= 2 * DEVICE_RATE
    print(json.dumps({
        "metric": "loader_headroom",
        "best_wav": round(best.get("wav", 0.0), 1),
        "best_sph": round(best.get("sph", 0.0), 1),
        "device_rate": DEVICE_RATE,
        "target": "2x device rate",
        "pass": ok,
        "host_cores": ncores,
        "cores_for_2x_headroom": cores_for_2x,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
