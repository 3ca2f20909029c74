#!/usr/bin/env python3
"""pyannote baseline driver (reference ``run_inference_pyannote.sh``).

Runs pyannote segmentation/diarization over conversation wavs, writes RTTM,
and scores speaker changes with the same tolerance-grid F1 scorer. Requires
pyannote.audio + a local checkpoint (gated in this environment).

    python evaluations/pyannote/run_pyannote_baseline.py \
        --wavs conv*.wav --mode segmentation --out results/pyannote
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
    args = parser.parse_args()
    results = run_pyannote_baseline(args.wavs, args.mode, args.model,
                                    args.token)
    os.makedirs(args.out, exist_ok=True)
    for wav, lines in results.items():
        name = os.path.splitext(os.path.basename(wav))[0]
        with open(os.path.join(args.out, f"{name}.rttm"), "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
