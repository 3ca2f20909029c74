"""Worker for the multi-process TRAINING LIFECYCLE test (VERDICT r3 item 2).

Launched by ``tests/test_distributed_lifecycle.py`` as::

    python distributed_lifecycle_worker.py <coordinator> <nprocs> <pid> \
        <workdir> <phase>
    python distributed_lifecycle_worker.py --single <workdir> <phase>

Each multi-process worker owns TWO CPU devices, so 2 processes form a
4-device global ``data`` mesh — the smallest shape where both the
cross-host (DCN) and the intra-host boundary exist. Phases:

* ``fit``      — full STTrainer.fit(): train epochs + validation with the
                 real beam search, metric aggregation (BLEU/WER/ACC) and
                 the ACC-keyed checkpoint keep, all under
                 ``jax.process_count() == 2`` (trainer.py multi-host
                 branches: _device_batch shard assembly, gather_to_host
                 valid fetches, process-0 checkpoint writes).
* ``preempt``  — fit() under a long epoch budget; the driver SIGTERMs both
                 processes mid-epoch. The coordinated preemption flag
                 (``_preemption_stop``: a one-step-delayed psum every host
                 reads identically) makes both processes stop at the SAME
                 optimizer step, save a 'preempted' checkpoint and exit 0.
* ``resume``   — a fresh trainer recovers from the preemption checkpoint
                 via ensure_state()->_maybe_resume (sharded params + opt
                 state + CMVN + counters) and finishes fit() to the epoch
                 limit.

The driver runs ``--single`` (one process, 4 devices) through the same
phases and asserts the final parameter fingerprint/metrics match the
2-process runs exactly (dropout 0 => bit-deterministic semantics).
"""

import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

WORKDIR = None


def log(msg):
    print(msg, flush=True)


def build_trainer(workdir, save_name):
    import numpy as np  # noqa: F401

    from stac_st_tpu.data.dataset import SpeechDataset
    from stac_st_tpu.data.loader import BatchLoader
    from stac_st_tpu.decoding.beam_search import MultiTaskBeamSearch
    from stac_st_tpu.models import (
        ConvolutionFrontEnd,
        LinearHead,
        TransformerMultiTask,
    )
    from stac_st_tpu.ops import Fbank, InputNormalization
    from stac_st_tpu.tokenizer.sentencepiece_compat import (
        SentencePieceProcessor,
    )
    from stac_st_tpu.training.checkpoint import Checkpointer
    from stac_st_tpu.training.lifecycle import EpochCounter
    from stac_st_tpu.training.optim import AdamW
    from stac_st_tpu.training.schedulers import WarmCoolDecayLRSchedule
    from stac_st_tpu.training.trainer import STTrainer
    from stac_st_tpu.utils.metrics import (
        AccuracyStats,
        BLEUStats,
        ErrorRateStats,
    )

    sp = SentencePieceProcessor(os.path.join(workdir, "tok.model"))
    vocab = sp.get_piece_size()
    cnn = ConvolutionFrontEnd(out_channels=(8, 8), dropout=0.0)
    transformer = TransformerMultiTask(
        tgt_vocab=vocab, input_size=20 * 8, d_model=16, nhead=2,
        num_encoder_layers=1, num_decoder_layers=1, d_ffn=32,
        dropout=0.0, normalize_before=True, causal=False,
    )
    seq_lin = LinearHead(input_size=16, n_neurons=vocab)
    ctc_lin = LinearHead(input_size=16, n_neurons=vocab)
    searcher = MultiTaskBeamSearch(
        [transformer, seq_lin, ctc_lin], bos_index=1, eos_index=2,
        blank_index=0, min_decode_ratio=0.0, max_decode_ratio=1.0,
        beam_size=2,
    )
    hparams = {
        "compute_features": Fbank(),
        "ctc_weight": 0.3, "label_smoothing": 0.1,
        "loss_reduction": "batchmean",
        "pad_index": 0, "blank_index": 0, "bos_index": 1, "eos_index": 2,
        "turn": sp.piece_to_id("[turn]"), "xt": sp.piece_to_id("[xt]"),
        "grad_accumulation_factor": 1,
        "nonfinite_patience": 10,
        "lr_adam": 1e-3, "seed": 0, "n_mels": 80,
        "optimizer_step_limit": 10_000,
        "valid_search_interval": 1,
        "lr_scheduler": WarmCoolDecayLRSchedule(
            lr=1e-3, warmup=5, cooldown=10, total_steps=1000,
            decay_every=100,
        ),
        "Adam": AdamW(lr=1e-3),
        "tokenizer": sp,
        "valid_search": searcher,
        "acc_computer": AccuracyStats,
        "bleu_computer": BLEUStats,
        "error_rate_computer": ErrorRateStats,
    }
    modules = {"CNN": cnn, "Transformer": transformer, "seq_lin": seq_lin,
               "ctc_lin": ctc_lin, "normalize": InputNormalization()}
    checkpointer = Checkpointer(os.path.join(workdir, save_name))
    trainer = STTrainer(
        modules=modules, opt_class=hparams["Adam"], hparams=hparams,
        run_opts={"data_parallel_count": -1, "precision": "fp32",
                  "rng_impl": "threefry"},
        checkpointer=checkpointer,
    )
    dataset = SpeechDataset(
        os.path.join(workdir, "data-st.json"), tokenizer=sp,
        replacements={"data_root": workdir},
    )
    train_loader = BatchLoader(dataset, batch_size=8, token_pad_multiple=16)
    valid_loader = BatchLoader(dataset, batch_size=8, token_pad_multiple=16,
                               shuffle=False)
    return trainer, train_loader, valid_loader


def fingerprint(trainer):
    import jax
    import numpy as np

    total = 0.0
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        total += float(np.sum(np.abs(np.asarray(jax.device_get(leaf)))))
    return (
        f"FP step={int(trainer.state.optimizer_step)}"
        f" micro={int(trainer.state.micro_step)}"
        f" params={total:.6f}"
        f" cmvn={float(jax.device_get(trainer.state.cmvn.count)):.1f}"
    )


def run_phase(phase, workdir, proc_tag):
    import jax

    from stac_st_tpu.training.lifecycle import EpochCounter

    if phase == "fit":
        # separate save dirs: the single-process parity run must not
        # _maybe_resume from the multi-process run's checkpoints
        save = "save_fit_single" if proc_tag == "single" else "save_fit"
        trainer, train_loader, valid_loader = build_trainer(workdir, save)
        counter = EpochCounter(limit=2)
        trainer.hparams["epoch_counter"] = counter
        trainer.fit(counter, train_loader, valid_loader, progress_every=0)
        log(f"{proc_tag} FIT_DONE {fingerprint(trainer)}")
        stats = trainer.last_valid_stats if hasattr(
            trainer, "last_valid_stats") else {}
        log(f"{proc_tag} VALID {sorted(stats.items())}")
        return

    if phase == "preempt":
        trainer, train_loader, valid_loader = build_trainer(
            workdir, "save_preempt")
        counter = EpochCounter(limit=50)
        trainer.hparams["epoch_counter"] = counter

        # mark readiness for the driver's SIGTERM after the first step:
        # wrap the loader so each batch touches a marker file
        marker = os.path.join(workdir, f"fitting_{proc_tag}")

        class MarkingLoader:
            def __init__(self, inner):
                self.inner = inner

            def set_epoch(self, e):
                self.inner.set_epoch(e)

            def __iter__(self):
                for i, b in enumerate(self.inner):
                    yield b
                    with open(marker, "w") as f:
                        f.write("x")
                    # slow the loop so the signal lands mid-epoch
                    time.sleep(0.3)

        trainer.fit(counter, MarkingLoader(train_loader), None,
                    progress_every=0)
        # fit returned: either preempted (expected) or the epoch budget ran
        # out (test will catch the missing marker)
        log(f"{proc_tag} PREEMPT_STOPPED {fingerprint(trainer)}")
        return

    if phase == "resume":
        trainer, train_loader, valid_loader = build_trainer(
            workdir, "save_preempt")
        counter = EpochCounter(limit=4)
        trainer.hparams["epoch_counter"] = counter
        # ensure_state on one real batch triggers _maybe_resume
        train_loader.set_epoch(1)
        first = next(iter(train_loader))
        trainer.ensure_state(trainer._device_batch(first))
        log(f"{proc_tag} RESUMED {fingerprint(trainer)}")
        trainer.fit(counter, train_loader, None, progress_every=0)
        log(f"{proc_tag} RESUME_DONE {fingerprint(trainer)}")
        return

    raise SystemExit(f"unknown phase {phase}")


def main():
    if sys.argv[1] == "--single":
        workdir, phase = sys.argv[2], sys.argv[3]
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 4)
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        run_phase(phase, workdir, "single")
        return

    coordinator, nprocs, pid, workdir, phase = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5],
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from stac_st_tpu.parallel.distributed import init_distributed

    init_distributed(coordinator_address=coordinator, num_processes=nprocs,
                     process_id=pid)
    assert jax.device_count() == 2 * nprocs, jax.device_count()
    run_phase(phase, workdir, f"proc{pid}")


if __name__ == "__main__":
    main()
