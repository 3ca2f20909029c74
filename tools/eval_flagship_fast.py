#!/usr/bin/env python3
"""Single-bucket flagship protocol eval — tunnel-budget variant.

`tools/eval_flagship.py` is the full driver (5 buckets × 3 engines ×
long-form grid); through a dev tunnel where each XLA program costs
minutes to compile, its compile matrix dominates wall-clock. This
variant pins ONE audio bucket and ONE row shape so every engine shares
a handful of programs, and reports the same core table: held-out
beam-10-protocol vs continuous-greedy vs hybrid BLEU/WER + RTFx, the
speaker-change-F1 leg, and a pause-VAD long-form point.

  python tools/eval_flagship_fast.py --exp results/flagship_synth/8886 \
      --data /tmp/stac_flagship/data [--out eval.json] [--n 64]
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "evaluations", "vad_shas"))

from eval_flagship import (  # noqa: E402
    SR,
    load_conversations,
    load_wav,
    score,
    strip_markers,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--bucket", type=float, default=6.0)
    ap.add_argument("--skip-longform", action="store_true")
    args = ap.parse_args(argv)

    from stac_st_tpu.serving import STEngine
    from stac_st_tpu.serving_continuous import ContinuousBatchingEngine
    from stac_st_tpu.tokenizer import SentencePieceProcessor

    toks = sorted(glob.glob(os.path.join(args.data, "tok", "*.model")))
    sp = SentencePieceProcessor(toks[0])
    engine = STEngine.from_saved_experiment(
        args.exp, tokenizer_file=toks[0],
        beam_size=10, bucket_seconds=(args.bucket,),
        max_decode_tokens=96, pad_batch_rows=args.n,
        turn_id=sp.piece_to_id("[turn]"), xt_id=sp.piece_to_id("[xt]"),
    )
    print(f"# engine loaded ({time.strftime('%H:%M:%S')})", flush=True)

    # held-out utterances that fit the single bucket
    with open(os.path.join(args.data, "heldout", "data-st.json")) as f:
        meta = json.load(f)
    picked = [(u, e) for u, e in sorted(meta.items())
              if e["duration"] <= args.bucket][: args.n]
    wavs = [load_wav(e["wav"].replace("{data_root}", args.data))
            for _, e in picked]
    refs_es = [e["transcription"] for _, e in picked]
    refs_en = [e["translation_0"] for _, e in picked]
    audio_s = sum(len(w) for w in wavs) / SR
    report = {"metric": "flagship_quality_protocol_fast",
              "exp": args.exp, "n_utts": len(wavs),
              "audio_seconds": round(audio_s, 1),
              "bucket_seconds": args.bucket}
    rows = []

    # batch beam-10 (one compiled program per task direction)
    asr_b = engine.transcribe(wavs)
    st_b = engine.translate(wavs)
    print(f"# batch warm done ({time.strftime('%H:%M:%S')})", flush=True)
    t0 = time.perf_counter()
    asr_b = engine.transcribe(wavs)
    st_b = engine.translate(wavs)
    dt = time.perf_counter() - t0
    bleu, wer = score(asr_b, st_b, refs_es, refs_en)
    rows.append({"engine": "batch_beam10", "st_bleu": bleu,
                 "asr_wer": wer, "rtfx": round(2 * audio_s / dt, 1)})
    print(json.dumps(rows[-1]), flush=True)

    # continuous greedy
    cont = ContinuousBatchingEngine(engine, slots=8, chunk=16,
                                    admit_rungs=(8,))
    try:
        t0 = time.perf_counter()
        asr_g = cont.transcribe(wavs)
        st_g = cont.translate(wavs)
        dt = time.perf_counter() - t0
    finally:
        cont.close()
    bleu_g, wer_g = score(asr_g, st_g, refs_es, refs_en)
    rows.append({"engine": "continuous_greedy", "st_bleu": bleu_g,
                 "asr_wer": wer_g, "rtfx": round(2 * audio_s / dt, 1)})
    print(json.dumps(rows[-1]), flush=True)

    # hybrid (reuses both compiled paths)
    hyb = ContinuousBatchingEngine(engine, slots=8, chunk=16,
                                   admit_rungs=(8,),
                                   protocol_finalize=True,
                                   finalize_batch=len(wavs))
    try:
        t0 = time.perf_counter()
        asr_h = hyb.transcribe(wavs)
        st_h = hyb.translate(wavs)
        dt = time.perf_counter() - t0
        hstats = hyb.stats()
    finally:
        hyb.close()
    bleu_h, wer_h = score(asr_h, st_h, refs_es, refs_en)
    rows.append({
        "engine": "hybrid_finalized", "st_bleu": bleu_h,
        "asr_wer": wer_h, "rtfx": round(2 * audio_s / dt, 1),
        "final_matches_batch_engine": bool(
            asr_h == asr_b and st_h == st_b),
        "draft_exact_rate": round(
            hstats.get("draft_exact", 0)
            / max(hstats.get("finalized", 1), 1), 3),
    })
    print(json.dumps(rows[-1]), flush=True)
    report["heldout"] = rows

    # speaker-change F1 (ground-truth segmentation leg, conv utterances)
    convs, manifest, man_path = load_conversations(args.data)
    from stac_st_tpu.eval.speaker_change import (
        TOLERANCE_GRID,
        evaluate_speaker_change,
        gt_changes_from_manifest,
    )

    gt = gt_changes_from_manifest(man_path)
    suids = [u for u, e in sorted(manifest.items())
             if e["duration"] <= args.bucket]
    swavs = [load_wav(manifest[u]["wav"]) for u in suids]
    turns = engine.speaker_turns(swavs)
    hyp = {u: t["turn"] for u, t in zip(suids, turns)}
    f1_rows = []
    for m in evaluate_speaker_change(
            {u: v for u, v in gt.items() if u in set(suids)}, hyp,
            TOLERANCE_GRID):
        d = {k: round(float(v), 3) for k, v in m.as_dict().items()}
        f1_rows.append(d)
        print(json.dumps(d), flush=True)
    report["speaker_change_f1"] = f1_rows

    # one long-form point (pause VAD) on the first two conversations
    if not args.skip_longform:
        from run_full_protocol import score_grid_point

        results = []
        sub = convs[:2]
        t0 = time.perf_counter()
        for conv in sub:
            r = engine.long_form(conv["wav"], uri=conv["uri"],
                                 segmentation="pause")
            r["raw"] = {
                "transcription": " ".join(
                    s["transcription"] for s in r["segments"]),
                "translation": " ".join(
                    s["translation"] for s in r["segments"]),
            }
            results.append(r)
        dt = time.perf_counter() - t0
        conv_s = sum(len(c["wav"]) for c in sub) / SR
        bleu_l, wer_l = score_grid_point(sub, manifest, results,
                                         with_markers=False)
        row = {"grid": "pause", "segments": sum(
            len(r["segments"]) for r in results),
            "st_bleu": bleu_l, "asr_wer": wer_l,
            "rtfx": round(conv_s / dt, 1)}
        report["long_form"] = row
        print(json.dumps(row), flush=True)

    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return report


if __name__ == "__main__":
    main()
