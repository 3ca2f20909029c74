#!/usr/bin/env python3
"""MSLT preparation driver (reference ``run_prepare_mslt.sh``).

    python datasets/mslt/run_prepare_mslt.py \
        --data /path/to/MSLT --out data-mslt --src en --tgt de --subset dev
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from stac_st_tpu.prep.mslt import prepare_mslt


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--src", required=True)
    parser.add_argument("--tgt", required=True)
    parser.add_argument("--subset", default="dev")
    args = parser.parse_args()
    prepare_mslt(args.data, args.out, args.src, args.tgt, args.subset)


if __name__ == "__main__":
    main()
