#!/usr/bin/env python3
"""Measure whole-conversation ``engine.long_form`` on the real chip.

The reference's long-form path is a four-stage shell pipeline (VAD →
inference.py → fix_RTTM → realign) with no timing identity. Ours is one
engine call; this gives it a measured RTFx:

  1. build the briefly-trained bench engine (bench_serve recipe, eos
     binds so hypothesis lengths are realistic);
  2. synthesize an N-second "conversation": speech chunks (slices of
     the memorized training wavs, so the trained model decodes them
     with early eos) separated by 0.5 s silences the pause-based VAD
     splits on;
  3. time end-to-end ``long_form`` (host VAD + segmentation + batched
     fused dual ASR+ST decode + CTC turn head + merge + RTTM) and
     report audio-seconds / wall-second.

Env: STAC_LF_SECONDS (default 120), STAC_LF_REPEAT (default 3).
Run: python tools/exp_long_form.py   (needs the TPU free)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_serve import SR, _build_trained_engine  # noqa: E402


def build_conversation(train_wavs: np.ndarray, total_s: float) -> np.ndarray:
    rng = np.random.default_rng(7)
    pieces = []
    t = 0.0
    i = 0
    gap = np.zeros(int(0.5 * SR), np.float32)
    while t < total_s:
        dur = float(rng.uniform(3.0, 8.0))
        row = train_wavs[i % len(train_wavs)]
        n = min(int(dur * SR), row.shape[0])
        pieces += [row[:n], gap]
        t += n / SR + 0.5
        i += 1
    return np.concatenate(pieces)


def main():
    total_s = float(os.environ.get("STAC_LF_SECONDS", "120"))
    repeat = int(os.environ.get("STAC_LF_REPEAT", "3"))
    engine, train_wavs = _build_trained_engine()
    conv = build_conversation(train_wavs, total_s)
    dur = conv.shape[0] / SR

    # warm: compiles every bucket the VAD hits
    t0 = time.perf_counter()
    res = engine.long_form(conv, "es", "en")
    warm_s = time.perf_counter() - t0

    times = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        res = engine.long_form(conv, "es", "en")
        times.append(time.perf_counter() - t0)
    wall = min(times)
    out = {
        "metric": "long_form_rtfx",
        "audio_s": round(dur, 1),
        "segments": len(res["segments"]),
        "rttm_lines": sum(len(v) for v in res.get("rttm", {}).values()),
        "warm_call_s": round(warm_s, 2),
        "wall_s": round(wall, 3),
        "value": round(dur / wall, 1),
        "unit": "x_realtime",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
