#!/usr/bin/env python3
"""Standalone inference: encode once, decode ASR+ST, emit speaker-turn RTTM.

Mirrors the reference recipe (``/root/reference/stac-st/inference.py``)::

    python recipes/inference.py recipes/hparams/transformer_inference.yaml \
        --pretrained_path=... --inference_splits="path/a/data-asr path/b/data-st"

Flow per split (reference call stack, SURVEY.md §3.2): encoder runs ONCE per
batch; the CTC head's frame posteriors are scanned for ``[turn]``/``[xt]``
spikes → RTTM at 25 fps; the same encoder output is decoded twice with
different prompts (ASR ``[src][src]``, ST ``[src][tgt]``); outputs are
re-merged per conversation with ``[turn]`` joins.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from stac_st_tpu.config import (
    create_experiment_directory,
    load_hyperpyyaml,
    parse_arguments,
)
from stac_st_tpu.data.dataset import SpeechDataset
from stac_st_tpu.data.loader import BatchLoader
from stac_st_tpu.training.trainer import STTrainer
from stac_st_tpu.utils.recipe_io import append_gt_preds, print_inference_output
from stac_st_tpu.utils.rttm import extract_turn_events

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def run_split(trainer, hparams, json_path: str) -> None:
    dataset_id = json_path.split("/")[-2] if "/" in json_path else json_path
    out = hparams["output_folder"]
    bleu_file = os.path.join(out, f"bleu_{dataset_id}-st.csv")
    wer_file = os.path.join(out, f"wer_{dataset_id}-asr.csv")
    if os.path.isfile(bleu_file) or os.path.isfile(wer_file):
        print(f"File present, not decoding again: {bleu_file}")
        return

    dataset = SpeechDataset(
        f"{json_path}.json",
        tokenizer=hparams["tokenizer"],
        sample_rate=hparams.get("sample_rate", 16000),
        replacements={"data_root": hparams.get("data_folder", "")},
    )
    loader = BatchLoader(
        dataset, batch_size=hparams.get("test_batch_size", 1)
    )
    tokenizer = hparams["tokenizer"]
    special = {"[turn]": hparams.get("turn", 7), "[xt]": hparams.get("xt", 8)}
    searcher = hparams["test_search"]

    ids_list, asr_list, st_list = [], [], []
    turn_events = {"turn": [], "xt": []}
    bound = False
    for batch in loader:
        dev = trainer._device_batch(batch)
        trainer.ensure_state(dev)
        if not bound:
            # checkpoint-average the kept top-k into eval weights
            # (reference on_evaluate_start, inference.py:224-235)
            trainer.on_evaluate_start()
            trainer._bind_searcher(searcher)
            bound = True
        # the reference's standalone inference uses the FLOOR-mask encode
        # path with no decoder pass (inference.py:88-110), unlike the
        # valid/test loop inside train_multitask.py (round-mask forward)
        p_ctc, enc_out = trainer.encode_forward(
            trainer.state.params, trainer.state.cmvn, dev
        )
        n = len(batch.id)

        if hparams.get("get_rttm_files", False) and p_ctc is not None:
            from stac_st_tpu.parallel.distributed import gather_to_host

            # p_ctc is batch-sharded across processes on multi-host
            # runs; plain np.asarray would raise (not fully addressable)
            ctc_argmax = gather_to_host(p_ctc.argmax(-1))[:n]
            events = extract_turn_events(
                batch.id, ctc_argmax,
                {"turn": special["[turn]"], "xt": special["[xt]"]},
            )
            for key in turn_events:
                turn_events[key].extend(events[key])

        src, tgt = batch.source_lang[0], batch.target_lang[0]
        if hparams.get("number_of_tasks", 2) >= 2:
            # encode once, decode BOTH prompts in one fused search
            # (reference decodes twice sequentially, inference.py:100-129)
            hyps_asr, hyps_st = trainer._run_search_dual(
                searcher, enc_out, dev["sig_len"], src, tgt
            )
            decoded = [
                ("transcription", src, src, hyps_asr),
                ("translation", src, tgt, hyps_st),
            ]
        else:
            task = batch.task[0]
            t_lang = src if task == "transcription" else tgt
            decoded = [(task, src, t_lang, trainer._run_search(
                searcher, enc_out, dev["sig_len"], src, t_lang))]
        for task, s_lang, t_lang, hyps in decoded:
            hyps = hyps[:n]
            refs = (
                batch.extras.get("translation_0")
                if task == "translation"
                else batch.extras.get("transcription")
            )
            ids, _, preds = append_gt_preds(
                batch.id, refs, hyps, t_lang, tokenizer,
                remove_special_chars=True, chars_dict=special,
            )
            for utt_id, pred in zip(ids, preds):
                if utt_id not in ids_list:
                    ids_list.append(utt_id)
                (st_list if task == "translation" else asr_list).append(pred)

    ground_truth = os.path.join(os.path.dirname(json_path), "data.json")
    if not os.path.isfile(ground_truth):
        ground_truth = f"{json_path}.json"
    if asr_list:
        print_inference_output(ids_list, ground_truth, asr_list, wer_file)
    if st_list:
        print_inference_output(ids_list, ground_truth, st_list, bleu_file)

    for name in ("turn", "xt"):
        path = os.path.join(out, f"RTTM_{dataset_id}_{name}.csv")
        with open(path, "w") as f:
            for line in turn_events[name]:
                f.write(line + "\n")


def main(argv):
    hparams_file, run_opts, overrides = parse_arguments(argv)
    with open(hparams_file) as fin:
        hparams = load_hyperpyyaml(fin, overrides)
    create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    hparams["pretrainer"].collect_files()
    hparams["pretrainer"].load_collected()

    trainer = STTrainer(
        modules=hparams["modules"],
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=hparams.get("checkpointer"),
    )
    for json_path in hparams["inference_splits"].split(" "):
        if json_path:
            run_split(trainer, hparams, json_path)
    return trainer


if __name__ == "__main__":
    main(sys.argv[1:])
