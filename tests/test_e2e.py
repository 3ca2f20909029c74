"""End-to-end slice test (the PR1 gate, SURVEY.md §7.2 step 6):

synthetic Fisher-style corpus → tokenizer → a few train steps on the tiny
multitask model → loss decreases → prompted beam search decodes → checkpoint
save/average/resume.
"""


import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fixtures import make_corpus, train_fixture_tokenizer

from stac_st_tpu.data.dataset import SpeechDataset
from stac_st_tpu.data.loader import BatchLoader
from stac_st_tpu.decoding.beam_search import MultiTaskBeamSearch
from stac_st_tpu.models import (
    ConvolutionFrontEnd,
    LinearHead,
    TransformerMultiTask,
)
from stac_st_tpu.ops import Fbank, InputNormalization
from stac_st_tpu.training.checkpoint import Checkpointer
from stac_st_tpu.training.lifecycle import EpochCounter
from stac_st_tpu.training.optim import AdamW
from stac_st_tpu.training.schedulers import WarmCoolDecayLRSchedule
from stac_st_tpu.training.trainer import STTrainer
from stac_st_tpu.utils.metrics import AccuracyStats, BLEUStats, ErrorRateStats

VOCAB = 150


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    asr_json, st_json, joint_json = make_corpus(root, n_utts=12, seconds=0.5)
    sp, model_path = train_fixture_tokenizer(root, joint_json, vocab=VOCAB)
    return dict(root=root, asr=asr_json, st=st_json, sp=sp,
                model_path=model_path)


def tiny_hparams(corpus, tmp_path):
    cnn = ConvolutionFrontEnd(out_channels=(16, 16))
    transformer = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=20 * 16, d_model=32, nhead=4,
        num_encoder_layers=2, num_decoder_layers=2, d_ffn=64, dropout=0.1,
        normalize_before=True, causal=False,
    )
    seq_lin = LinearHead(input_size=32, n_neurons=VOCAB)
    ctc_lin = LinearHead(input_size=32, n_neurons=VOCAB)
    searcher = lambda beam, **kw: MultiTaskBeamSearch(
        [transformer, seq_lin, ctc_lin], bos_index=1, eos_index=2,
        blank_index=0, min_decode_ratio=0.0, max_decode_ratio=1.0,
        beam_size=beam, **kw,
    )
    return {
        "compute_features": Fbank(),
        "ctc_weight": 0.3,
        "label_smoothing": 0.1,
        "loss_reduction": "batchmean",
        "pad_index": 0,
        "blank_index": 0,
        "bos_index": 1,
        "eos_index": 2,
        "turn": corpus["sp"].piece_to_id("[turn]"),
        "xt": corpus["sp"].piece_to_id("[xt]"),
        "grad_accumulation_factor": 1,
        "max_grad_norm": 5.0,
        "nonfinite_patience": 10,
        "lr_adam": 3e-3,
        "seed": 0,
        "n_mels": 80,
        "optimizer_step_limit": 10_000,
        "valid_search_interval": 1,
        "lr_scheduler": WarmCoolDecayLRSchedule(
            lr=3e-3, warmup=5, cooldown=10, total_steps=1000,
            decay_every=100,
        ),
        "Adam": AdamW(lr=3e-3),
        "tokenizer": corpus["sp"],
        "valid_search": searcher(2),
        "test_search": searcher(3, using_eos_threshold=True,
                                length_normalization=True, temperature=1.15),
        "acc_computer": AccuracyStats,
        "bleu_computer": BLEUStats,
        "error_rate_computer": ErrorRateStats,
        "epoch_counter": EpochCounter(limit=3),
        "checkpointer": Checkpointer(str(tmp_path / "save")),
    }, {"CNN": cnn, "Transformer": transformer, "seq_lin": seq_lin,
        "ctc_lin": ctc_lin, "normalize": InputNormalization()}


@pytest.fixture(scope="module")
def trained(corpus, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("exp")
    hparams, modules = tiny_hparams(corpus, tmp_path)
    dataset = SpeechDataset(
        corpus["st"], tokenizer=corpus["sp"],
        replacements={"data_root": corpus["root"]},
    )
    loader = BatchLoader(dataset, batch_size=4, token_pad_multiple=16)
    trainer = STTrainer(
        modules=modules, opt_class=hparams["Adam"], hparams=hparams,
        run_opts={"data_parallel_count": -1},
        checkpointer=hparams["checkpointer"],
    )
    losses = []
    rng = jax.random.PRNGKey(0)
    for epoch in range(10):
        loader.set_epoch(epoch)
        for batch in loader:
            dev = trainer._device_batch(batch)
            trainer.ensure_state(dev)
            rng, k = jax.random.split(rng)
            trainer.state, metrics = trainer.train_step(
                trainer.state, dev, k, update_cmvn=(epoch < 2)
            )
            losses.append(float(metrics["loss"]))
    return dict(trainer=trainer, losses=losses, loader=loader,
                dataset=dataset, hparams=hparams, corpus=corpus)


class TestEndToEnd:
    def test_loss_decreases(self, trained):
        losses = trained["losses"]
        assert all(np.isfinite(losses))
        first = np.mean(losses[:4])
        last = np.mean(losses[-4:])
        assert last < first * 0.8, (first, last)

    def test_optimizer_steps_counted(self, trained):
        trainer = trained["trainer"]
        assert int(trainer.state.optimizer_step) == len(trained["losses"])

    def test_cmvn_stats_updated_then_frozen(self, trained):
        cmvn = trained["trainer"].state.cmvn
        assert float(cmvn.count) > 0
        assert np.all(np.isfinite(np.asarray(cmvn.mean)))

    def test_beam_search_decodes(self, trained):
        trainer = trained["trainer"]
        hparams = trained["hparams"]
        batch = next(iter(trained["loader"]))
        dev = trainer._device_batch(batch)
        _, _, enc_out = trainer.eval_forward(
            trainer.state.params, trainer.state.cmvn, dev
        )
        searcher = hparams["valid_search"]
        trainer._bind_searcher(searcher)
        sp = trained["corpus"]["sp"]
        searcher.set_decoder_prefix_tokens(
            sp.piece_to_id("[es]"), sp.piece_to_id("[en]")
        )
        hyps, scores = searcher(enc_out, dev["sig_len"])
        # the searcher returns one hyp per (possibly mesh-padded) row;
        # callers slice to the true batch size
        assert len(hyps) >= len(batch.id)
        hyps = hyps[: len(batch.id)]
        assert all(isinstance(h, list) for h in hyps)
        assert np.all(np.isfinite(scores[: len(batch.id)]))
        texts = [sp.decode_ids(h) for h in hyps]
        assert all(isinstance(t, str) for t in texts)

    def test_language_switch_no_recompile(self, trained):
        """ASR↔ST prompt switch must reuse the compiled search kernel."""
        import sys

        bs = sys.modules["stac_st_tpu.decoding.beam_search"]

        trainer = trained["trainer"]
        hparams = trained["hparams"]
        batch = next(iter(trained["loader"]))
        dev = trainer._device_batch(batch)
        _, _, enc_out = trainer.eval_forward(
            trainer.state.params, trainer.state.cmvn, dev
        )
        searcher = hparams["valid_search"]
        trainer._bind_searcher(searcher)
        sp = trained["corpus"]["sp"]
        es, en = sp.piece_to_id("[es]"), sp.piece_to_id("[en]")

        searcher.set_decoder_prefix_tokens(es, en)
        searcher(enc_out, dev["sig_len"])
        size_before = bs.beam_search._cache_size()
        searcher.set_decoder_prefix_tokens(es, es)  # switch to ASR
        searcher(enc_out, dev["sig_len"])
        assert bs.beam_search._cache_size() == size_before

    def test_checkpoint_save_restore_roundtrip(self, trained):
        trainer = trained["trainer"]
        ckpt = trainer.checkpointer.save_and_keep_only(
            meta={"ACC": 0.5, "epoch": 1},
            trees=trainer._checkpoint_trees(epoch=1),
            max_keys=["ACC"], num_to_keep=5,
        )
        before = jax.device_get(trainer.state.params)
        step_before = int(trainer.state.optimizer_step)
        # perturb then restore
        trainer.state = trainer.state._replace(
            params=jax.tree_util.tree_map(lambda x: x * 0, trainer.state.params)
        )
        trainer.load_from_checkpoint(ckpt)
        after = jax.device_get(trainer.state.params)
        flat_b = jax.tree_util.tree_leaves(before)
        flat_a = jax.tree_util.tree_leaves(after)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(trainer.state.optimizer_step) == step_before

    def test_checkpoint_averaging(self, trained):
        trainer = trained["trainer"]
        for i in range(2):
            trainer.checkpointer.save_and_keep_only(
                meta={"ACC": 0.6 + 0.01 * i, "epoch": 2 + i},
                trees=trainer._checkpoint_trees(epoch=2 + i),
                max_keys=["ACC"], num_to_keep=5,
            )
        trainer.on_evaluate_start()
        assert all(
            np.all(np.isfinite(np.asarray(x)))
            for x in jax.tree_util.tree_leaves(trainer.state.params)
        )

    def test_eval_accuracy_reasonable(self, trained):
        """After overfitting 12 utts, teacher-forced ACC should be high."""
        trainer = trained["trainer"]
        acc = AccuracyStats()
        for batch in trained["loader"]:
            dev = trainer._device_batch(batch)
            _, p_seq, _ = trainer.eval_forward(
                trainer.state.params, trainer.state.cmvn, dev
            )
            acc.append(np.asarray(p_seq), dev["tokens_eos"],
                       dev["tokens_eos_len"])
        assert acc.summarize() > 0.5


class TestEvaluate:
    def test_four_ref_test_split(self, trained, tmp_path_factory):
        """trainer.evaluate on a 4-reference ST split: BLEU computed via
        append_4gt, stats + CSV files written (reference test loop,
        train_multitask.py:694-726)."""
        import json

        trainer = trained["trainer"]
        corpus = trained["corpus"]
        tmp = tmp_path_factory.mktemp("eval4")

        with open(corpus["st"]) as f:
            data = json.load(f)
        for entry in data.values():
            for i in range(1, 4):
                entry[f"translation_{i}"] = entry["translation_0"]
        manifest = tmp / "data-st.json"
        manifest.write_text(json.dumps(data))

        dataset = SpeechDataset(
            str(manifest), tokenizer=corpus["sp"],
            replacements={"data_root": corpus["root"]},
        )
        loader = BatchLoader(dataset, batch_size=4, token_pad_multiple=16)
        trainer.hparams["bleu_file"] = str(tmp / "bleu_test.txt")
        trainer.hparams["bleu_file_no_turn"] = str(tmp / "bleu_nt.txt")
        stats = trainer.evaluate(loader, average_first=False)
        assert "BLEU" in stats and np.isfinite(stats["BLEU"])
        assert (tmp / "bleu_test.txt").exists()
        content = (tmp / "bleu_test.txt").read_text()
        assert content.startswith("BLEU:")
        assert (tmp / "bleu_test.csv").exists()


class TestValidationSearch:
    def test_dual_asr_st_validation(self, trained):
        """_validate with search: dual prompted decoding feeds BLEU (ST) and
        WER (ASR) accumulators (reference compute_forward VALID branch,
        train_multitask.py:91-136)."""
        trainer = trained["trainer"]
        hparams = trained["hparams"]
        hparams["valid_search_interval"] = 1
        stats = trainer._validate(trained["loader"], epoch=1)
        assert "ACC" in stats
        assert "BLEU" in stats and np.isfinite(stats["BLEU"])
        assert "WER" in stats and np.isfinite(stats["WER"])
        assert "BLEU_no_turn" in stats and "WER_no_turn" in stats


class TestDeviceSpeedPerturbTraining:
    def test_trainer_path_with_device_perturb(self, corpus, tmp_path_factory):
        """Full trainer plumbing: dataset samples speed_idx, collate carries
        it through extras, _device_batch ships the array, the jitted step
        resamples on device; loss finite and decreasing-ish."""
        from stac_st_tpu.ops.speed_perturb import DeviceSpeedPerturb

        tmp_path = tmp_path_factory.mktemp("exp_devsp")
        hparams, modules = tiny_hparams(corpus, tmp_path)
        hparams["speed_perturb"] = DeviceSpeedPerturb(16000, [90, 100, 110])
        hparams["speed_perturb"].seed(0)
        dataset = SpeechDataset(
            corpus["st"], tokenizer=corpus["sp"],
            replacements={"data_root": corpus["root"]},
            speed_perturb=hparams["speed_perturb"],
        )
        sample = dataset[0]
        assert "speed_idx" in sample and sample["speed_idx"] in (0, 1, 2)
        # host signal untouched (device path)
        entry = dataset.entry(0)
        assert abs(
            len(sample["sig"]) / 16000.0 - float(entry["duration"])
        ) < 0.05

        loader = BatchLoader(dataset, batch_size=4, token_pad_multiple=16)
        trainer = STTrainer(
            modules=modules, opt_class=hparams["Adam"], hparams=hparams,
            run_opts={"data_parallel_count": -1},
        )
        assert trainer.cfg.device_speed is hparams["speed_perturb"]
        rng = jax.random.PRNGKey(0)
        losses = []
        for epoch in range(2):
            loader.set_epoch(epoch)
            for batch in loader:
                dev = trainer._device_batch(batch)
                assert "speed_idx" in dev
                trainer.ensure_state(dev)
                rng, k = jax.random.split(rng)
                trainer.state, metrics = trainer.train_step(
                    trainer.state, dev, k, update_cmvn=(epoch < 1)
                )
                losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]


class TestMixedPrecisionTraining:
    def test_bf16_step_matches_fp32_and_trains(self, corpus, tmp_path_factory):
        """auto_mix_prec -> bf16 network compute with fp32 params/optimizer
        (the reference's AMP fit_batch, train_multitask.py:321-347):
        parameters stay fp32, the first-step loss tracks the fp32 loss to
        bf16 tolerance, and training converges."""
        tmp_path = tmp_path_factory.mktemp("exp_bf16")
        hparams, modules = tiny_hparams(corpus, tmp_path)
        hparams["auto_mix_prec"] = True
        dataset = SpeechDataset(
            corpus["st"], tokenizer=corpus["sp"],
            replacements={"data_root": corpus["root"]},
        )
        loader = BatchLoader(dataset, batch_size=4, token_pad_multiple=16)
        trainer = STTrainer(
            modules=modules, opt_class=hparams["Adam"], hparams=hparams,
            run_opts={"data_parallel_count": -1},
        )
        assert trainer.cfg.compute_dtype == jnp.bfloat16
        # fp32 twin (--precision run-opt overrides the YAML flag)
        hparams32, modules32 = tiny_hparams(corpus, tmp_path)
        hparams32["auto_mix_prec"] = True
        trainer32 = STTrainer(
            modules=modules32, opt_class=hparams32["Adam"], hparams=hparams32,
            run_opts={"data_parallel_count": -1, "precision": "fp32"},
        )
        assert trainer32.cfg.compute_dtype is None

        rng = jax.random.PRNGKey(0)
        losses = []
        first_losses = {}
        for name, tr in (("bf16", trainer), ("fp32", trainer32)):
            loader.set_epoch(0)
            batch = next(iter(loader))
            dev = tr._device_batch(batch)
            tr.ensure_state(dev)
            # train_step donates the state — keep the returned one
            tr.state, metrics = tr.train_step(
                tr.state, dev, jax.random.PRNGKey(1), update_cmvn=True
            )
            first_losses[name] = float(metrics["loss"])
        assert np.isfinite(first_losses["bf16"])
        assert abs(first_losses["bf16"] - first_losses["fp32"]) < 0.05 * (
            abs(first_losses["fp32"]) + 1.0
        )

        rng = jax.random.PRNGKey(0)
        for epoch in range(4):
            loader.set_epoch(epoch)
            for batch in loader:
                dev = trainer._device_batch(batch)
                rng, k = jax.random.split(rng)
                trainer.state, metrics = trainer.train_step(
                    trainer.state, dev, k, update_cmvn=(epoch < 2)
                )
                losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]
        # parameters and Adam moments stay fp32 under the bf16 policy
        for leaf in jax.tree_util.tree_leaves(trainer.state.params):
            if hasattr(leaf, "dtype") and jnp.issubdtype(
                leaf.dtype, jnp.floating
            ):
                assert leaf.dtype == jnp.float32


class TestPreemptionCheckpoint:
    """SIGTERM during fit(): TPU VMs are evicted with a short grace
    window — the trainer must finish the in-flight step, save a
    resumable checkpoint, and return; a fresh trainer resumes exactly."""

    class _SignalingLoader:
        """Forwards a BatchLoader; raises SIGTERM in-process after the
        Nth batch of the first epoch (deterministic preemption)."""

        def __init__(self, loader, after_batches=2):
            self.loader = loader
            self.after = after_batches
            self.fired = False

        def set_epoch(self, epoch):
            self.loader.set_epoch(epoch)

        def __iter__(self):
            import signal as _signal

            for i, batch in enumerate(self.loader):
                yield batch
                if not self.fired and i + 1 >= self.after:
                    self.fired = True
                    _signal.raise_signal(_signal.SIGTERM)

    def test_sigterm_saves_and_resumes(self, corpus, tmp_path):
        hparams, modules = tiny_hparams(corpus, tmp_path)
        dataset = SpeechDataset(
            corpus["st"], tokenizer=corpus["sp"],
            replacements={"data_root": corpus["root"]},
        )
        loader = self._SignalingLoader(
            BatchLoader(dataset, batch_size=4, token_pad_multiple=16))
        trainer = STTrainer(
            modules=modules, opt_class=hparams["Adam"], hparams=hparams,
            run_opts={"data_parallel_count": -1},
            checkpointer=hparams["checkpointer"],
        )
        trainer.fit(EpochCounter(limit=50), loader, valid_set=None)
        assert loader.fired
        ckpts = hparams["checkpointer"].list_checkpoints()
        pre = [c for c in ckpts if c.meta.get("preempted")]
        assert pre, [c.meta for c in ckpts]
        step_at_save = int(trainer.state.optimizer_step)
        assert step_at_save >= 2

        # a fresh trainer over the same save dir resumes the counters
        hp2, mod2 = tiny_hparams(corpus, tmp_path)
        hp2["checkpointer"] = hparams["checkpointer"]
        t2 = STTrainer(
            modules=mod2, opt_class=hp2["Adam"], hparams=hp2,
            run_opts={"data_parallel_count": -1},
            checkpointer=hparams["checkpointer"],
        )
        inner = BatchLoader(dataset, batch_size=4, token_pad_multiple=16)
        inner.set_epoch(0)
        batch = next(iter(inner))
        t2.ensure_state(t2._device_batch(batch))
        assert int(t2.state.optimizer_step) == step_at_save

    def test_handler_restored_after_fit(self, corpus, tmp_path):
        import signal as _signal

        prev = _signal.getsignal(_signal.SIGTERM)
        hparams, modules = tiny_hparams(corpus, tmp_path)
        dataset = SpeechDataset(
            corpus["st"], tokenizer=corpus["sp"],
            replacements={"data_root": corpus["root"]},
        )
        loader = self._SignalingLoader(
            BatchLoader(dataset, batch_size=4, token_pad_multiple=16))
        trainer = STTrainer(
            modules=modules, opt_class=hparams["Adam"], hparams=hparams,
            run_opts={"data_parallel_count": -1},
            checkpointer=hparams["checkpointer"],
        )
        trainer.fit(EpochCounter(limit=50), loader, valid_set=None)
        assert _signal.getsignal(_signal.SIGTERM) == prev


class TestShardedLoader:
    """Multi-host IO sharding (BatchLoader.set_shard): every process
    builds the same global batch composition but decodes audio only for
    its own row block — the block _device_batch ships to local devices."""

    @staticmethod
    def _loaders(corpus, shard=None):
        from stac_st_tpu.data.sampler import DynamicBatchSampler

        ds = SpeechDataset(
            corpus["st"], tokenizer=corpus["sp"],
            replacements={"data_root": corpus["root"]},
        )
        sampler = DynamicBatchSampler(
            ds.durations(), max_batch_length=4.0, num_buckets=4,
            shuffle=False, batch_ordering="ascending",
        )
        loader = BatchLoader(ds, sampler=sampler)
        if shard is not None:
            loader.set_shard(*shard)
        loader.set_epoch(0)
        return loader

    def test_shard_blocks_reassemble_the_full_batch(self, corpus):
        full = list(self._loaders(corpus))
        mult = 2  # trainer row multiple for a 2-process run
        shard0 = list(self._loaders(corpus, shard=(0, 2, mult)))
        shard1 = list(self._loaders(corpus, shard=(1, 2, mult)))
        assert len(full) == len(shard0) == len(shard1) > 0
        for b, s0, s1 in zip(full, shard0, shard1):
            # identical composition and static shapes everywhere
            assert s0.id == s1.id == b.id
            assert s0.sig.data.shape == s1.sig.data.shape == b.sig.data.shape
            np.testing.assert_array_equal(s0.tokens.data, b.tokens.data)
            np.testing.assert_array_equal(s1.tokens_eos.data,
                                          b.tokens_eos.data)
            # each process's block carries the REAL audio; the union of
            # blocks covers every real row
            n = len(b.id)
            padded = -(-n // mult) * mult
            per = padded // 2
            for pos in range(n):
                owner = s0 if pos < per else s1
                other = s1 if pos < per else s0
                np.testing.assert_array_equal(
                    owner.sig.data[pos], b.sig.data[pos])
                # non-owner rows are zero audio (decode skipped)
                assert float(np.abs(other.sig.data[pos]).max()) == 0.0

    def test_shard_validation(self, corpus):
        loader = self._loaders(corpus)
        with pytest.raises(ValueError):
            loader.set_shard(2, 2, 4)
        with pytest.raises(ValueError):
            loader.set_shard(0, 3, 4)  # multiple not divisible

    @staticmethod
    def _perturbed_loaders(corpus, shard=None, num_workers=1, epoch=0):
        from stac_st_tpu.data.sampler import DynamicBatchSampler
        from stac_st_tpu.ops.speed_perturb import SpeedPerturb

        perturb = SpeedPerturb(16000, speeds=[90, 100, 110])
        perturb.seed(1234)
        ds = SpeechDataset(
            corpus["st"], tokenizer=corpus["sp"],
            replacements={"data_root": corpus["root"]},
            speed_perturb=perturb,
        )
        sampler = DynamicBatchSampler(
            ds.durations(), max_batch_length=4.0, num_buckets=4,
            shuffle=False, batch_ordering="ascending",
        )
        loader = BatchLoader(ds, sampler=sampler, num_workers=num_workers)
        if shard is not None:
            loader.set_shard(*shard)
        loader.set_epoch(epoch)
        return loader

    def test_speed_perturb_keyed_draw_survives_sharding(self, corpus):
        """The per-utterance speed draw is keyed by (epoch, row), not a
        sequential stream, so skipping non-owned audio decodes (or
        decoding under worker threads) cannot desync augmentation: the
        owned blocks carry bit-identical perturbed audio and every host
        computes the same padded width."""
        full = list(self._perturbed_loaders(corpus))
        full_workers = list(self._perturbed_loaders(corpus, num_workers=3))
        mult = 2
        shard0 = list(self._perturbed_loaders(corpus, shard=(0, 2, mult)))
        shard1 = list(self._perturbed_loaders(corpus, shard=(1, 2, mult)))
        assert len(full) == len(shard0) == len(shard1) > 0
        for b, bw, s0, s1 in zip(full, full_workers, shard0, shard1):
            # multi-worker decode == single-worker decode, bit-exact
            np.testing.assert_array_equal(bw.sig.data, b.sig.data)
            # identical padded width on every "host"
            assert s0.sig.data.shape == s1.sig.data.shape == b.sig.data.shape
            n = len(b.id)
            padded = -(-n // mult) * mult
            per = padded // 2
            for pos in range(n):
                owner = s0 if pos < per else s1
                np.testing.assert_array_equal(
                    owner.sig.data[pos], b.sig.data[pos])

    def test_speed_perturb_redraws_per_epoch(self, corpus):
        e0 = list(self._perturbed_loaders(corpus, epoch=0))
        e0b = list(self._perturbed_loaders(corpus, epoch=0))
        e1 = list(self._perturbed_loaders(corpus, epoch=1))
        same = all(
            a.sig.data.shape == b.sig.data.shape
            and np.array_equal(a.sig.data, b.sig.data)
            for a, b in zip(e0, e1))
        assert not same  # epoch changes the draw...
        for a, b in zip(e0, e0b):  # ...same epoch is reproducible
            np.testing.assert_array_equal(a.sig.data, b.sig.data)


class TestScopedRngImpl:
    def test_rbg_scoped_leaves_global_impl_untouched(
        self, corpus, tmp_path_factory
    ):
        """run_opt rng_impl=rbg_scoped threads a TYPED rbg key through the
        trainer (impl travels with the key) instead of mutating the
        process-global jax_default_prng_impl (VERDICT r3 weak #4; the
        global flip stays the default for its measured −7.5% step cost —
        docs/PERF.md round 4)."""
        tmp_path = tmp_path_factory.mktemp("exp_scoped_rng")
        prev_impl = jax.config.jax_default_prng_impl
        hparams, modules = tiny_hparams(corpus, tmp_path)
        trainer = STTrainer(
            modules=modules, opt_class=hparams["Adam"], hparams=hparams,
            run_opts={"data_parallel_count": -1, "rng_impl": "rbg_scoped"},
        )
        assert jax.config.jax_default_prng_impl == prev_impl
        # typed key: extended PRNG key dtype, not a raw uint32 vector
        assert jnp.issubdtype(trainer._rng.dtype, jax.dtypes.prng_key)

        dataset = SpeechDataset(
            corpus["st"], tokenizer=corpus["sp"],
            replacements={"data_root": corpus["root"]},
        )
        loader = BatchLoader(dataset, batch_size=4, token_pad_multiple=16)
        batch = next(iter(loader))
        dev = trainer._device_batch(batch)
        trainer.ensure_state(dev)
        key = jax.random.split(trainer._rng)[0]
        trainer.state, metrics = trainer.train_step(
            trainer.state, dev, key, update_cmvn=True
        )
        assert np.isfinite(float(metrics["loss"]))
        assert jax.config.jax_default_prng_impl == prev_impl


class TestInt16Transfer:
    def test_pcm16_transfer_is_loss_exact(self, corpus, tmp_path_factory):
        """run_opt transfer_int16 ships audio H2D as PCM16; because the
        source wavs are 16-bit on disk, the pack/unpack round trip is
        bit-exact and the training loss must be IDENTICAL to the fp32
        transfer path."""
        tmp_path = tmp_path_factory.mktemp("i16")
        dataset = SpeechDataset(
            corpus["st"], tokenizer=corpus["sp"],
            replacements={"data_root": corpus["root"]},
        )
        loader = BatchLoader(dataset, batch_size=4, token_pad_multiple=16)
        losses = {}
        for name, opts in (("fp32", {}), ("int16", {"transfer_int16": True})):
            hparams, modules = tiny_hparams(corpus, tmp_path)
            trainer = STTrainer(
                modules=modules, opt_class=hparams["Adam"],
                hparams=hparams, run_opts=dict(opts),
            )
            loader.set_epoch(0)
            batch = next(iter(loader))
            dev = trainer._device_batch(batch)
            if name == "int16":
                assert dev["sig"].dtype == jnp.int16
            trainer.ensure_state(dev)
            _, metrics = trainer.train_step(
                trainer.state, dev, jax.random.PRNGKey(5),
                update_cmvn=True,
            )
            losses[name] = float(metrics["loss"])
        assert losses["int16"] == pytest.approx(losses["fp32"], rel=1e-6)
