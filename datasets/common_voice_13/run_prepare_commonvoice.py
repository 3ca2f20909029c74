#!/usr/bin/env python3
"""CommonVoice 13 preparation driver (reference ``run_prepare_commonvoice.sh``).

    python datasets/common_voice_13/run_prepare_commonvoice.py \
        --data /path/to/cv-corpus-13.0 --out data-cv --locales es en de fr
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from stac_st_tpu.prep.commonvoice import prepare_common_voice


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--locales", nargs="+",
                        default=["es", "en", "de", "fr"])
    args = parser.parse_args()
    for locale in args.locales:
        prepare_common_voice(args.data, args.out, locale)


if __name__ == "__main__":
    main()
