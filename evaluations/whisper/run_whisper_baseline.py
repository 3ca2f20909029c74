#!/usr/bin/env python3
"""Whisper baseline driver (reference ``run_inference_whisper.sh``).

    python evaluations/whisper/run_whisper_baseline.py \
        --manifest data/dev/data-st.json --model /path/to/whisper-small \
        --task translate --language es [--out results/whisper]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from stac_st_tpu.eval.whisper_baseline import run_whisper_baseline


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest", required=True)
    parser.add_argument("--model", required=True,
                        help="local Whisper checkpoint dir (no egress)")
    parser.add_argument("--task", default="transcribe",
                        choices=["transcribe", "translate"])
    parser.add_argument("--language", default="es")
    parser.add_argument("--out", default=None)
    parser.add_argument("--max-utterances", type=int, default=None)
    args = parser.parse_args()
    summary = run_whisper_baseline(
        args.manifest, args.model, args.task, args.language, args.out,
        args.max_utterances,
    )
    print(summary)


if __name__ == "__main__":
    main()
