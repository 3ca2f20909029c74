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
    parser.add_argument("--grid", action="store_true",
                        help="sweep the reference max grid "
                             "{15,20,25,30} s at min 10 s "
                             "(run_shas_segmentation.sh:137)")
    parser.add_argument("--source-lang", default="es")
    parser.add_argument("--target-lang", default="en")
    args = parser.parse_args()

    settings = (
        [(10.0, m) for m in (15.0, 20.0, 25.0, 30.0)]
        if args.grid else [(args.min, args.max)]
    )
    for wav in args.wavs:
        samples, rate = read_audio(wav, sample_rate=16000)
        regions = energy_vad(samples, rate)
        for min_s, max_s in settings:
            segments = split_to_grid(regions, min_s, max_s)
            out_dir = os.path.join(
                args.out,
                f"{os.path.splitext(os.path.basename(wav))[0]}_"
                f"{int(min_s)}_{int(max_s)}",
            )
            path = segments_to_json(
                wav, segments, out_dir,
                source_lang=args.source_lang, target_lang=args.target_lang,
            )
            logging.info("%s [%g_%g] -> %d segments (%s)",
                         wav, min_s, max_s, len(segments), path)


if __name__ == "__main__":
    main()
