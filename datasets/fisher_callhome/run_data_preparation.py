#!/usr/bin/env python3
"""Fisher + CALLHOME Spanish single-turn preparation driver.

Mirrors the reference entry points (``datasets/fisher_callhome/
run_data_preparation.sh`` → ``st_asr_task/data_prep.py``)::

    python datasets/fisher_callhome/run_data_preparation.py \
        --raw /path/to/LDC --out data \
        [--corpus /path/to/fisher-callhome-corpus]

The fisher-callhome-corpus translations repo must be available locally (the
reference git-clones it; this environment has no egress).
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from stac_st_tpu.prep.callhome import prepare_callhome
from stac_st_tpu.prep.fisher import prepare_fisher


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--raw", required=True, help="LDC root folder")
    parser.add_argument("--out", required=True, help="output data folder")
    parser.add_argument("--corpus", default=None,
                        help="fisher-callhome-corpus checkout")
    args = parser.parse_args()
    prepare_fisher(args.raw, args.out, corpus_path=args.corpus)
    prepare_callhome(args.raw, args.out, corpus_path=args.corpus)


if __name__ == "__main__":
    main()
