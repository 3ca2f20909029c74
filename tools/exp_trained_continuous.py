#!/usr/bin/env python3
"""Trained-serving RTFx through the continuous engine, dispatch-inclusive.

VERDICT r3 item 7: the round-2 target was "trained-serving >= 2,000 RTFx";
round 3 measured 1,460 dispatch-inclusive on the batch beam path, where a
trained (early-exiting) decode is tens of ms and this dev tunnel's ~28 ms
per-call round trip dominates. The continuous (in-flight) batching engine
amortizes dispatch BY DESIGN — one admission call primes a whole group and
one chunk call advances every slot `chunk` decode steps — so it is the
production path whose dispatch-inclusive number is meaningful for short
trained decodes.

This experiment: build the flagship small preset, briefly train it on chip
(bench.py phase-2 recipe, eos binds at ~15 tokens), wrap the SAME engine
the batch bench uses in `ContinuousBatchingEngine`, submit a saturating
offline batch of 10 s requests directly (no HTTP — the 1-core host's
transport tax is measured separately in bench_serve.py), and report served
audio-seconds per wall-clock second, dispatch-inclusive.

Env: STAC_TC_SLOTS (default 32), STAC_TC_CHUNK (default 16),
     STAC_TC_REQS (default 192), STAC_SERVE_TRAIN_STEPS,
     STAC_SERVE_COMPILE_CACHE.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import bench_serve

    from stac_st_tpu.serving_continuous import ContinuousBatchingEngine

    slots = int(os.environ.get("STAC_TC_SLOTS", "32"))
    chunk = int(os.environ.get("STAC_TC_CHUNK", "16"))
    n_reqs = int(os.environ.get("STAC_TC_REQS", "192"))

    engine, wav_bank = bench_serve._build_trained_engine()
    cont = ContinuousBatchingEngine(engine, slots=slots, chunk=chunk)
    try:
        cont.warmup()
        print("# continuous engine warmed", flush=True)

        # memorized training wavs => realistic trained hyp lengths
        wavs = [wav_bank[i % len(wav_bank)] for i in range(n_reqs)]
        seconds = sum(len(w) for w in wavs) / 16000.0

        t0 = time.perf_counter()
        futs = [cont.submit(w, task="translate") for w in wavs]
        texts = [f.result(timeout=600) for f in futs]
        elapsed = time.perf_counter() - t0

        hyp_lens = [len(t.split()) for t in texts]
        result = {
            "metric": "trained_continuous_rtfx",
            "value": round(seconds / elapsed, 1),
            "unit": "x_realtime_per_chip_dispatch_inclusive",
            "requests": n_reqs,
            "slots": slots,
            "chunk": chunk,
            "audio_s": round(seconds, 1),
            "wall_s": round(elapsed, 2),
            "hyp_len_mean": round(float(np.mean(hyp_lens)), 1),
            "stats": cont.stats(),
        }
        print(json.dumps(result))
    finally:
        cont.close()


if __name__ == "__main__":
    main()
