#!/usr/bin/env python3
"""Long-form VAD segmentation driver (SHAS/WebRTC analogue).

Mirrors ``run_shas_segmentation.sh``: mask un-annotated audio to zero, run
the VAD over each conversation, split segments to a min/max grid
(``10_15 … 10_30`` in the reference), cut segment wavs, and emit the
empty-transcript inference manifests.

    python datasets/fisher_callhome/run_segmentation.py \
        --wavs conv1.wav conv2.wav --out data-reseg --min 10 --max 30
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from stac_st_tpu.data.audio import read_audio
from stac_st_tpu.prep.segmentation import (
    energy_vad,
    segments_to_json,
    split_to_grid,
)


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--wavs", nargs="+", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--min", type=float, default=10.0)
    parser.add_argument("--max", type=float, default=30.0)
    parser.add_argument("--source-lang", default="es")
    parser.add_argument("--target-lang", default="en")
    args = parser.parse_args()

    for wav in args.wavs:
        samples, rate = read_audio(wav, sample_rate=16000)
        regions = energy_vad(samples, rate)
        segments = split_to_grid(regions, args.min, args.max)
        out_dir = os.path.join(
            args.out,
            f"{os.path.splitext(os.path.basename(wav))[0]}_"
            f"{int(args.min)}_{int(args.max)}",
        )
        path = segments_to_json(
            wav, segments, out_dir,
            source_lang=args.source_lang, target_lang=args.target_lang,
        )
        logging.info("%s -> %d segments (%s)", wav, len(segments), path)


if __name__ == "__main__":
    main()
