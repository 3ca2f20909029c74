#!/usr/bin/env python3
"""Speaker-change evaluation over the tolerance grid.

Mirrors ``evaluations/vad_shas/eval_speaker_change.sh`` + ``get_f1_score.py``:
score the model's ``[turn]``/``[xt]`` RTTM events against the multi-turn
manifest's segments metadata at tolerances {0.1 … 1.0} s.

    python evaluations/vad_shas/run_eval_speaker_change.py \
        --manifest data/dev-30s/data-turns-st.json \
        --rttm results/.../RTTM_dev-30s_turn.csv [--out report.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from stac_st_tpu.eval.speaker_change import (
    TOLERANCE_GRID,
    evaluate_speaker_change,
    gt_changes_from_manifest,
    hyp_changes_from_rttm,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest", required=True)
    parser.add_argument("--rttm", required=True)
    parser.add_argument("--out", default=None)
    parser.add_argument("--tolerances", nargs="+", type=float,
                        default=list(TOLERANCE_GRID))
    args = parser.parse_args()

    ref = gt_changes_from_manifest(args.manifest)
    hyp = hyp_changes_from_rttm(args.rttm)
    results = [m.as_dict() for m in
               evaluate_speaker_change(ref, hyp, args.tolerances)]
    for m in results:
        print(
            f"tol={m['tolerance']:.2f}s  P={m['precision']:.3f} "
            f"R={m['recall']:.3f} F1={m['f1']:.3f} "
            f"MDR={m['MDR']:.3f} FAR={m['FAR']:.3f}"
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
