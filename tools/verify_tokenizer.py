#!/usr/bin/env python3
"""On-site tokenizer certification vs the real SentencePiece C++ trainer.

SURVEY §2.2 pins "bit-identical vocab" as the tokenizer requirement
(``/root/reference/stac-st/train_tokenizer.py:23-37``). This image has no
``sentencepiece`` wheel and no network egress, so byte-level certification
cannot run here; THIS tool performs it wherever real sentencepiece is
installed:

    python tools/verify_tokenizer.py --corpus data.json \
        --read transcription_and_translation --vocab 5000

It trains BOTH trainers on the same corpus with the reference's flags
(``train_bpe_5k_special_prefix.xx_to_xx.yaml:21-43``) and reports:

1. ``.model`` byte equality (the strict gate);
2. piece-set / piece-order / score diffs when bytes differ (so drift is
   actionable);
3. encode-level agreement over the corpus — the property decoding parity
   actually depends on (ids fed to the model), certified in-image against
   an independent HF Rust BPE implementation by
   ``tests/test_tokenizer_external.py``.

Exit code 0 = byte-identical; 2 = models differ (report printed);
3 = sentencepiece not installed (nothing certified).
"""

import argparse
import hashlib
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _read_lines(path, field):
    with open(path) as f:
        data = json.load(f)
    return [str(v[field]) for v in data.values() if v.get(field)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="JSON manifest")
    ap.add_argument("--read", default="transcription_and_translation")
    ap.add_argument("--vocab", type=int, default=5000)
    ap.add_argument(
        "--symbols", default="[es],[en],[turn],[xt]",
        help="user_defined_symbols (reference yaml:40)",
    )
    ap.add_argument("--keep", help="directory to keep both models in")
    args = ap.parse_args()

    try:
        import sentencepiece as spm
    except ImportError:
        print("sentencepiece is not installed — cannot certify here. "
              "Run this tool on a host with `pip install sentencepiece`.")
        return 3

    from stac_st_tpu.tokenizer import SentencePiece

    workdir = args.keep or tempfile.mkdtemp(prefix="tok_verify_")
    os.makedirs(workdir, exist_ok=True)
    lines = _read_lines(args.corpus, args.read)
    text_path = os.path.join(workdir, "corpus.txt")
    with open(text_path, "w") as f:
        f.write("\n".join(lines) + "\n")

    # ---- reference C++ trainer (the reference's exact invocation) --------
    ref_prefix = os.path.join(workdir, "ref")
    spm.SentencePieceTrainer.train(
        input=text_path,
        model_prefix=ref_prefix,
        vocab_size=args.vocab,
        model_type="bpe",
        character_coverage=1.0,
        user_defined_symbols=args.symbols.split(","),
        unk_id=0, bos_id=1, eos_id=2, pad_id=-1,
    )

    # ---- this framework's trainer ----------------------------------------
    mine = SentencePiece(
        model_dir=os.path.join(workdir, "mine"),
        vocab_size=args.vocab,
        annotation_train=args.corpus,
        annotation_read=args.read,
        model_type="bpe",
        user_defined_symbols=args.symbols,
        bos_id=1, eos_id=2, unk_id=0,
    )

    with open(ref_prefix + ".model", "rb") as f:
        ref_bytes = f.read()
    with open(mine.model_path, "rb") as f:
        my_bytes = f.read()

    if ref_bytes == my_bytes:
        print(f"BYTE-IDENTICAL ({len(ref_bytes)} bytes, "
              f"sha256 {hashlib.sha256(ref_bytes).hexdigest()[:16]})")
        return 0

    print(f"MODELS DIFFER: ref {len(ref_bytes)} B vs mine {len(my_bytes)} B")

    # piece-level diagnosis
    ref_sp = spm.SentencePieceProcessor(model_file=ref_prefix + ".model")
    ref_pieces = [ref_sp.id_to_piece(i) for i in range(ref_sp.get_piece_size())]
    my_pieces = [mine.sp.id_to_piece(i)
                 for i in range(mine.sp.get_piece_size())]
    ref_set, my_set = set(ref_pieces), set(my_pieces)
    print(f"piece sets: {len(ref_set & my_set)} shared, "
          f"{len(ref_set - my_set)} ref-only, {len(my_set - ref_set)} mine-only")
    for label, diff in (("ref-only", ref_set - my_set),
                        ("mine-only", my_set - ref_set)):
        for p in sorted(diff)[:10]:
            print(f"  {label}: {p!r}")
    order_mismatch = sum(a != b for a, b in zip(ref_pieces, my_pieces))
    print(f"order: {order_mismatch}/{len(ref_pieces)} positions differ")

    # encode-level agreement (what decode parity depends on)
    mismatches = 0
    for line in lines:
        if ref_sp.encode(line, out_type=int) != mine.sp.encode_as_ids(line):
            mismatches += 1
    print(f"encode over corpus: {len(lines) - mismatches}/{len(lines)} "
          f"lines identical")
    print(f"models kept in {workdir}")
    return 2


if __name__ == "__main__":
    sys.exit(main())
