#!/usr/bin/env python3
"""pyannote baseline driver (reference ``run_inference_pyannote.sh``).

Runs pyannote segmentation/diarization over conversation wavs, writes RTTM,
and scores speaker changes with the same tolerance-grid F1 scorer. The
default backend requires pyannote.audio + an HF checkpoint; in
egress-blocked environments ``--backend local`` runs the same model path on
a first-party PyanNet-architecture checkpoint built locally with
``--build-local`` (the Whisper-baseline trick).

    python evaluations/pyannote/run_pyannote_baseline.py \
        --wavs conv*.wav --mode segmentation --out results/pyannote
    python evaluations/pyannote/run_pyannote_baseline.py \
        --wavs conv*.wav --backend local --build-local --out results/pyannote
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from stac_st_tpu.eval.pyannote_baseline import run_pyannote_baseline


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--wavs", nargs="+", required=True)
    parser.add_argument("--mode", default="segmentation",
                        choices=["segmentation", "diarization"])
    parser.add_argument("--model", default=None)
    parser.add_argument("--token", default=None)
    parser.add_argument("--out", default="results/pyannote")
    parser.add_argument("--backend", default="pyannote",
                        choices=["pyannote", "local"],
                        help="'local' = first-party PyanNet backend "
                        "(both modes; diarization clusters local-speaker "
                        "embeddings; --model is a local checkpoint path)")
    parser.add_argument("--build-local", action="store_true",
                        help="build the miniature local segmentation "
                        "checkpoint at --model (or <out>/local_seg.pt) "
                        "before running")
    args = parser.parse_args()
    if args.build_local:
        from stac_st_tpu.eval.pyannote_local import (
            build_local_segmentation_checkpoint,
        )

        os.makedirs(args.out, exist_ok=True)
        args.model = args.model or os.path.join(args.out, "local_seg.pt")
        build_local_segmentation_checkpoint(args.model)
        args.backend = "local"
    results = run_pyannote_baseline(args.wavs, args.mode, args.model,
                                    args.token, backend=args.backend)
    os.makedirs(args.out, exist_ok=True)
    for wav, lines in results.items():
        name = os.path.splitext(os.path.basename(wav))[0]
        with open(os.path.join(args.out, f"{name}.rttm"), "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
