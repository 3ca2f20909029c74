"""Recipe-level integration: the real CLIs on a synthetic corpus.

Exercises the full composition root: hparams YAML (frozen key surface) →
registry-instantiated TPU modules → tokenizer pretraining → bucketed loaders
→ trainer.fit → checkpointing, and the inference recipe's
encoder-once/decode-twice + RTTM flow.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fixtures import make_corpus, train_fixture_tokenizer

TINY_OVERRIDES = {
    "d_model": "32",
    "nhead": "4",
    "num_encoder_layers": "2",
    "num_decoder_layers": "2",
    "d_ffn": "64",
    "output_neurons": "150",
    "number_of_epochs": "2",
    "scheduler_step_limit": "50",
    "n_warmup_steps": "5",
    "cooldown": "5",
    "grad_accumulation_factor": "1",
    "dynamic_batching": "True",
    "max_batch_len": "4",
    "max_batch_len_val": "4",
    "num_bucket": "2",
    "valid_search_interval": "100",  # skip beam search during fit (CPU)
    "batch_size": "4",
    "num_workers": "0",
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    asr_json, st_json, joint_json = make_corpus(root, n_utts=8, seconds=0.5)
    sp, model_path = train_fixture_tokenizer(root, joint_json, vocab=150)
    # recipe expects {data_folder}/{split}.json layout
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "dev"), exist_ok=True)
    for split in ("train", "dev"):
        with open(st_json) as f:
            data = json.load(f)
        out = os.path.join(root, split, "data-st.json")
        with open(out, "w") as f:
            json.dump(data, f)
    return dict(root=root, tok=model_path)


class TestTrainRecipe:
    def test_train_main_runs(self, corpus, tmp_path_factory):
        out_dir = str(tmp_path_factory.mktemp("exp"))
        from recipes.train_multitask import main

        argv = ["recipes/hparams/transformer_multitask.yaml"]
        overrides = dict(TINY_OVERRIDES)
        overrides["train_splits"] = "train/data-st"
        overrides["dev_splits"] = "dev/data-st"
        overrides["test_splits_4_translations"] = "[]"
        overrides["test_splits_1_translations"] = "[]"
        overrides["output_folder_name"] = out_dir
        overrides["data_folder"] = corpus["root"]
        overrides["tokenizer_file"] = corpus["tok"]
        # the default CNN (256 ch) flattens to input_size 5120 as configured
        argv += [f"--{k}={v}" for k, v in overrides.items()]

        trainer = main(argv)
        assert trainer.state is not None
        assert int(trainer.state.optimizer_step) > 0
        # train log written
        log = os.path.join(out_dir, str(8886), "train_log.txt")
        assert os.path.isfile(log)
        # checkpoints kept with ACC key
        ckpts = trainer.checkpointer.list_checkpoints()
        assert len(ckpts) >= 1
        assert "ACC" in ckpts[0].meta


class TestInferenceRecipe:
    def test_inference_main_runs(self, corpus, tmp_path_factory):
        pre_dir = str(tmp_path_factory.mktemp("pretrained"))
        os.makedirs(os.path.join(pre_dir, "save"), exist_ok=True)
        from recipes.inference import main

        split_path = os.path.join(corpus["root"], "dev", "data-st")
        argv = [
            "recipes/hparams/transformer_inference.yaml",
            f"--pretrained_path={pre_dir}",
            f"--tokenizer_file={corpus['tok']}",
            f"--inference_splits={split_path}",
            "--d_model=32", "--nhead=4",
            "--num_encoder_layers=2", "--num_decoder_layers=2",
            "--d_ffn=64", "--output_neurons=150",
            "--test_beam_size=2",
            f"--data_folder={corpus['root']}",
        ]
        main(argv)
        out = os.path.join(pre_dir, "inference")
        files = os.listdir(out)
        assert any(f.startswith("RTTM_") for f in files)
        assert any(f.startswith("bleu_") for f in files)
        assert any(f.startswith("wer_") for f in files)
        # the per-conversation merge file has [turn] joins
        bleu_csv = [f for f in files if f.startswith("bleu_")][0]
        content = open(os.path.join(out, bleu_csv)).read()
        assert content.startswith("ID|gt|prediction")
