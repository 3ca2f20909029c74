#!/usr/bin/env python3
"""Train the multitask ASR+ST Transformer (TPU-native recipe).

Mirrors the reference CLI surface
(``/root/reference/stac-st/train_multitask.py``)::

    python recipes/train_multitask.py recipes/hparams/transformer_multitask.yaml \
        --data_folder=/path/to/data --tokenizer_file=/path/to/5000_bpe.model \
        [--key=value overrides ...]

The hparams YAML is the composition root (same key surface as the
reference's ``transformer_multitask.yaml``; the reference file itself loads
unchanged through the registry). GPU-era flags (``--distributed_launch``,
``--distributed_backend``) are accepted and ignored — distribution comes
from the TPU device mesh.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stac_st_tpu.config import (
    create_experiment_directory,
    load_hyperpyyaml,
    parse_arguments,
)
from stac_st_tpu.data import (
    DynamicBatchSampler,
    SpeechDataset,
    split_name,
)
from stac_st_tpu.data.loader import BatchLoader
from stac_st_tpu.training.trainer import STTrainer
from stac_st_tpu.utils.seeding import manual_seed

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(name)s %(levelname)s %(message)s",
)
logger = logging.getLogger(__name__)


def make_dataset(hparams, split: str, train: bool) -> SpeechDataset:
    json_path = os.path.join(hparams["data_folder"], f"{split}.json")
    sp = hparams.get("speed_perturb") if train else None
    return SpeechDataset(
        json_path,
        tokenizer=hparams["tokenizer"],
        sample_rate=hparams.get("sample_rate", 16000),
        replacements={"data_root": hparams["data_folder"]},
        speed_perturb=sp,
        bos_index=hparams.get("bos_index", 1),
        eos_index=hparams.get("eos_index", 2),
        include_xt=hparams.get("use_xt_token", True),
        include_turn=hparams.get("use_turn_token", True),
    )


def dataio_prepare(hparams):
    """Datasets + loaders for train/valid/test (reference dataio_prepare,
    ``train_multitask.py:481-621``)."""
    seed = int(hparams.get("seed", 8886))
    datasets, loaders = {}, {}

    train_ds = make_dataset(hparams, hparams["train_splits"], train=True)
    valid_ds = make_dataset(hparams, hparams["dev_splits"], train=False)
    datasets["train"], datasets["valid"] = train_ds, valid_ds

    sorting = hparams.get("sorting", "random")
    shuffle = sorting == "random"

    if hparams.get("dynamic_batching", False):
        dyn = hparams["dynamic_batch_sampler"]
        # NB: the sampler keeps SB's own default seed (42) — the reference
        # does not thread the experiment seed into DynamicBatchSampler
        # (dataio_and_utils.py:212-230), so neither do we.
        train_sampler = DynamicBatchSampler(
            train_ds.durations(),
            dyn["max_batch_len"],
            num_buckets=dyn.get("num_buckets", 50),
            shuffle=dyn.get("shuffle_ex", True) and shuffle,
            batch_ordering=dyn.get("batch_ordering", "random"),
            max_batch_ex=dyn.get("max_batch_ex", 128),
            # drop_last=True bounds the compile set: leftover partial
            # batches otherwise add a fresh (rows, width) step shape per
            # bucket per epoch (the reference's GPU sampler pays no such
            # cost; XLA's static shapes do)
            drop_last=dyn.get("drop_last", False),
            # 'quantile' fits bucket boundaries to THIS corpus's duration
            # distribution; SB's warped default assumes durations spread
            # up to max_batch_len and collapses short-utterance corpora
            # into one over-padded bucket
            boundaries=dyn.get("boundaries", "sb_warped"),
        )
        valid_sampler = DynamicBatchSampler(
            valid_ds.durations(),
            dyn.get("max_batch_len_val", dyn["max_batch_len"]),
            num_buckets=dyn.get("num_buckets", 50),
            shuffle=dyn.get("shuffle_ex", True),
            batch_ordering=dyn.get("batch_ordering", "random"),
            boundaries=dyn.get("boundaries", "sb_warped"),
        )
        nw = int(hparams.get("train_dataloader_opts", {})
                 .get("num_workers", hparams.get("num_workers", 1)) or 1)
        tpm = int(hparams.get("token_pad_multiple", 32))
        loaders["train"] = BatchLoader(train_ds, sampler=train_sampler,
                                       seed=seed, num_workers=nw,
                                       token_pad_multiple=tpm)
        loaders["valid"] = BatchLoader(valid_ds, sampler=valid_sampler,
                                       seed=seed, num_workers=nw,
                                       token_pad_multiple=tpm)
    else:
        loaders["train"] = BatchLoader(
            train_ds, batch_size=hparams.get("batch_size", 4),
            shuffle=shuffle, seed=seed,
        )
        loaders["valid"] = BatchLoader(
            valid_ds, batch_size=hparams.get("batch_size", 4), seed=seed,
        )
        if sorting in ("ascending", "descending"):
            from stac_st_tpu.data.dataset import sort_ids

            loaders["train"].order = sort_ids(train_ds, sorting)
            loaders["valid"].order = sort_ids(valid_ds, sorting)

    test_splits = list(hparams.get("test_splits_4_translations", [])) + list(
        hparams.get("test_splits_1_translations", [])
    )
    for split in test_splits:
        name = split_name(split)
        datasets[name] = make_dataset(hparams, split, train=False)
        loaders[name] = BatchLoader(
            datasets[name], batch_size=hparams.get("test_batch_size", 4),
            seed=seed,
        )
    return datasets, loaders


def main(argv):
    hparams_file, run_opts, overrides = parse_arguments(argv)
    with open(hparams_file) as fin:
        hparams = load_hyperpyyaml(fin, overrides)

    manual_seed(int(hparams.get("seed", 8886)))
    create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    logger.info("training for %s epochs (optimizer_step_limit %s)",
                hparams.get("number_of_epochs"),
                hparams.get("optimizer_step_limit"))

    hparams["pretrainer"].collect_files()
    hparams["pretrainer"].load_collected()

    datasets, loaders = dataio_prepare(hparams)

    trainer = STTrainer(
        modules=hparams["modules"],
        opt_class=hparams["Adam"],
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=hparams.get("checkpointer"),
    )
    import jax

    if jax.process_count() > 1:
        # multi-host pods: every process iterates the same global batch
        # composition but decodes audio only for its own row block (the
        # block _device_batch ships to its local devices)
        for name in ("train", "valid"):
            loaders[name].set_shard(
                jax.process_index(), jax.process_count(),
                trainer._row_multiple,
            )
    trainer.fit(
        hparams["epoch_counter"], loaders["train"], loaders["valid"]
    )

    if hparams.get("no_eval", True):
        logger.info("no_eval=True: training round only, skipping evaluation")
        return trainer

    test_splits = list(hparams.get("test_splits_4_translations", [])) + list(
        hparams.get("test_splits_1_translations", [])
    )
    for split in test_splits:
        name = split_name(split)
        out = hparams["output_folder"]
        hparams["bleu_file"] = os.path.join(out, f"bleu_{name}.txt")
        hparams["bleu_file_no_turn"] = os.path.join(
            out, f"bleu_{name}_no_turn.txt"
        )
        hparams["wer_file"] = os.path.join(out, f"wer_{name}.txt")
        hparams["wer_file_no_turn"] = os.path.join(
            out, f"wer_{name}_no_turn.txt"
        )
        if os.path.isfile(hparams["bleu_file"]) or os.path.isfile(
            hparams["wer_file"]
        ):
            print(f"File present, not decoding again: {hparams['bleu_file']}")
            continue
        trainer.hparams.update(hparams)
        trainer.evaluate(loaders[name])
    return trainer


if __name__ == "__main__":
    main(sys.argv[1:])
