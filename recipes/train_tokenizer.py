#!/usr/bin/env python3
"""Train the 5k-BPE tokenizer with language/turn special symbols.

Mirrors the reference CLI (``/root/reference/stac-st/train_tokenizer.py``)::

    python recipes/train_tokenizer.py recipes/hparams/train_bpe_5k.yaml \
        --train_json_file=... --output_folder=... [--languages="'[ES],[EN]'"]

Produces ``<output_folder>/<vocab>_bpe.model`` (+ .vocab) in real
SentencePiece wire format with the frozen id contract unk=0 bos=1 eos=2,
user symbols from 3.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stac_st_tpu.config import (
    create_experiment_directory,
    load_hyperpyyaml,
    parse_arguments,
)


def main(argv):
    hparams_file, run_opts, overrides = parse_arguments(argv)
    with open(hparams_file) as fin:
        hparams = load_hyperpyyaml(fin, overrides)
    create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    tokenizer = hparams["tokenizer"]
    result = tokenizer() if callable(tokenizer) else tokenizer
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
