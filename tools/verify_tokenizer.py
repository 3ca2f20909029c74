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


def preflight(out_path=None):
    """Narrow the stated tokenizer residual (VERDICT r4 item 8): the only
    in-image-unverifiable exposure is Unicode-version skew between this
    Python's ``unicodedata`` and spm's pinned ICU charsmap data.

    Unicode's normalization stability policy guarantees NFKC of a code
    point never changes once ASSIGNED — so skew can only come from code
    points assigned after spm's charsmap snapshot (spm passes unknown
    code points through; a newer unicodedata may map them). This scan
    enumerates every assigned code point, classifies how our nmt_nfkc
    treats it, and emits the manifest of NON-IDENTITY code points — the
    exact set an on-site verifier must compare first (everything else is
    identity on both sides by construction + stability policy).

    Runs WITHOUT sentencepiece (pure unicodedata); when real spm is also
    importable, additionally normalizes every manifest code point through
    spm's own normalizer and reports actual mismatches.
    """
    import unicodedata

    from stac_st_tpu.tokenizer.bpe import _nmt_nfkc

    manifest = {}
    counts = {"assigned": 0, "identity": 0, "removed": 0, "space": 0,
              "nfkc_changed": 0}
    newly_assigned_since_3_2 = 0
    old = getattr(unicodedata, "ucd_3_2_0", None)
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        ch = chr(cp)
        if unicodedata.category(ch) in ("Cn",):
            continue
        counts["assigned"] += 1
        is_new = old is not None and old.category(ch) == "Cn"
        newly_assigned_since_3_2 += is_new
        out = _nmt_nfkc(ch)
        if out == ch:
            counts["identity"] += 1
            continue
        if out == "":
            counts["removed"] += 1
            kind = "removed"
        elif out == " ":
            counts["space"] += 1
            kind = "space"
        else:
            counts["nfkc_changed"] += 1
            kind = "nfkc"
        manifest[f"{cp:04X}"] = {
            "out": out, "kind": kind,
            **({"new_since_3_2": True} if is_new else {}),
        }

    report = {
        "metric": "tokenizer_preflight",
        "python_unidata_version": unicodedata.unidata_version,
        "counts": counts,
        "newly_assigned_since_3_2": newly_assigned_since_3_2,
        "non_identity_manifest_size": len(manifest),
        "high_risk": sum(1 for v in manifest.values()
                         if v.get("new_since_3_2")),
    }

    # optional: direct comparison through real spm's normalizer
    try:
        import sentencepiece as spm  # noqa: F401

        norm = None
        if hasattr(spm, "SentencePieceNormalizer"):
            norm = spm.SentencePieceNormalizer()
            norm.LoadFromRuleName("nmt_nfkc")
        if norm is not None:
            mismatches = {}
            for hexcp, row in manifest.items():
                ch = chr(int(hexcp, 16))
                got = norm.Normalize(ch)
                if got != row["out"]:
                    mismatches[hexcp] = {"ours": row["out"], "spm": got}
            report["spm_compared"] = True
            report["spm_mismatches"] = len(mismatches)
            report["spm_mismatch_detail"] = dict(
                list(mismatches.items())[:50])
        else:
            report["spm_compared"] = False
            report["note"] = ("sentencepiece present but no "
                              "SentencePieceNormalizer API; use "
                              "`spm_normalize --normalization_rule_name="
                              "nmt_nfkc` over the manifest instead")
    except ImportError:
        report["spm_compared"] = False

    if out_path:
        with open(out_path, "w") as f:
            json.dump({"report": report, "manifest": manifest}, f,
                      ensure_ascii=False, separators=(",", ":"))
        report["manifest_file"] = out_path
    print(json.dumps(report, ensure_ascii=False))
    return 0 if report.get("spm_mismatches", 0) == 0 else 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", help="JSON manifest")
    ap.add_argument("--read", default="transcription_and_translation")
    ap.add_argument("--vocab", type=int, default=5000)
    ap.add_argument(
        "--symbols", default="[es],[en],[turn],[xt]",
        help="user_defined_symbols (reference yaml:40)",
    )
    ap.add_argument("--keep", help="directory to keep both models in")
    ap.add_argument(
        "--preflight", action="store_true",
        help="scan all assigned code points; emit the version-sensitive "
             "normalization manifest (runs without sentencepiece)")
    ap.add_argument("--preflight-out", default=None,
                    help="write the full manifest JSON here")
    args = ap.parse_args()

    if args.preflight:
        return preflight(args.preflight_out)
    if not args.corpus:
        ap.error("--corpus is required (unless --preflight)")

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
