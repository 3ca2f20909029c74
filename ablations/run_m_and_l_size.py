#!/usr/bin/env python3
"""Model-size ablation driver (reference ``ablations/run_m_and_l_size.sh``).

Size presets (reference table at :72-97; the shell script's trailing-``else``
d_ffn bug is fixed here — SURVEY.md §7.4):

    small:  d_model 256,  4 heads, 12 enc + 6 dec, d_ffn 1024, lr 1e-3
    medium: d_model 512,  8 heads, 16 enc + 6 dec, d_ffn 2048, lr 1e-3
    large:  d_model 1024, 16 heads, 14 enc + 6 dec, d_ffn 4096, lr 5e-4

    python ablations/run_m_and_l_size.py --size medium \
        --data_folder ... --tokenizer_file ... [extra overrides...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PRESETS = {
    "small": dict(d_model=256, nhead=4, num_encoder_layers=12,
                  num_decoder_layers=6, d_ffn=1024, lr_adam=1e-3,
                  max_batch_len=500, grad_accumulation_factor=8,
                  scheduler_step_limit=100000, n_warmup_steps=10000,
                  cooldown=10000),
    "medium": dict(d_model=512, nhead=8, num_encoder_layers=16,
                   num_decoder_layers=6, d_ffn=2048, lr_adam=1e-3,
                   max_batch_len=350, grad_accumulation_factor=12,
                   scheduler_step_limit=150000, n_warmup_steps=15000,
                   cooldown=15000),
    # pipeline_stages > 1 shards the encoder stack over a `pipe` mesh axis
    # (stac_st_tpu.parallel.pipeline_encoder) — the TPU-native scale-out for
    # the large preset; ignored when the mesh has no pipe axis.
    "large": dict(d_model=1024, nhead=16, num_encoder_layers=14,
                  num_decoder_layers=6, d_ffn=4096, lr_adam=5e-4,
                  max_batch_len=250, grad_accumulation_factor=24,
                  scheduler_step_limit=200000, n_warmup_steps=20000,
                  cooldown=20000, pipeline_stages=2),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", required=True, choices=sorted(PRESETS))
    parser.add_argument("--hparams", default=os.path.join(
        os.path.dirname(__file__), "..", "recipes", "hparams",
        "transformer_multitask.yaml",
    ))
    args, extra = parser.parse_known_args()

    preset = PRESETS[args.size]
    argv = [args.hparams]
    argv += [f"--{k}={v}" for k, v in preset.items()]
    argv += [f"--output_folder_name=results/transformer_{args.size}/"]
    argv += extra

    from recipes.train_multitask import main as train_main

    train_main(argv)


if __name__ == "__main__":
    main()
