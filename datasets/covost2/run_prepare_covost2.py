#!/usr/bin/env python3
"""CoVoST2 preparation driver (reference ``run_prepare_covost2.sh``).

    python datasets/covost2/run_prepare_covost2.py \
        --tsv covost_v2.es_en.tsv --cv data-cv/es/all.json \
        --out data-covost --src es --tgt en
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from stac_st_tpu.prep.covost import prepare_covost


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--tsv", required=True)
    parser.add_argument("--cv", required=True,
                        help="prepared CommonVoice manifest (all.json)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--src", required=True)
    parser.add_argument("--tgt", required=True)
    args = parser.parse_args()
    prepare_covost(args.tsv, args.cv, args.out, args.src, args.tgt)


if __name__ == "__main__":
    main()
