"""The ST trainer: stage lifecycle, fit/evaluate loops, checkpoint policy.

TPU-native re-own of the SpeechBrain ``Brain`` surface the reference builds
on (``train_multitask.py:50-478``): TRAIN/VALID/TEST stages, per-epoch
validation with dual prompted ASR+ST beam search every
``valid_search_interval`` epochs, ACC-keyed top-5 checkpointing, checkpoint
averaging at evaluation start, and test-split evaluation with BLEU/WER file
outputs — driving the compiled step from :mod:`stac_st_tpu.training.step`.

Key TPU-native differences from the reference Brain:
* the hot path is one jitted function per bucket shape (no per-batch Python
  in the device loop); gradient accumulation/nonfinite skipping live inside
  the optax chain (``make_optimizer``);
* distribution is a device mesh (batch sharded on ``data``), not DDP
  process groups; rank-0-only sections become ``jax.process_index()==0``;
* CMVN stats, optimizer state and counters are one checkpointable train
  state — preemption-safe resume restores training exactly (SURVEY.md §5.3).
"""

from __future__ import annotations

import logging
import signal
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..data.loader import BatchLoader
from ..ops.cmvn import CmvnState
from ..parallel.distributed import gather_to_host
from ..parallel.mesh import batch_sharding, make_mesh
from ..utils.recipe_io import append_4gt, append_gt_preds, print_bleu_or_wer
from .checkpoint import average_checkpoints
from .step import (
    StepConfig,
    TrainState,
    init_train_state,
    make_encode_forward,
    make_eval_forward,
    make_optimizer,
    make_train_step,
)

logger = logging.getLogger(__name__)

__all__ = ["STTrainer"]


def _specaug_opts(hparams) -> Optional[tuple]:
    aug = hparams.get("augmentation")
    if aug is None or not hasattr(aug, "opts"):
        return None
    return tuple(sorted(aug.opts.items()))


class STTrainer:
    """Drives training/eval for the multitask ASR+ST model."""

    def __init__(
        self,
        modules: Dict[str, Any],
        opt_class=None,
        hparams: Optional[Dict[str, Any]] = None,
        run_opts: Optional[Dict[str, Any]] = None,
        checkpointer=None,
    ):
        self.hparams = dict(hparams or {})
        self.run_opts = dict(run_opts or {})
        self.checkpointer = checkpointer
        self.modules = modules

        h = self.hparams
        # mesh first: pipeline_stages > 1 switches to a (data, pipe) mesh
        # and the StepConfig carries the PipelineSpec into the jitted step
        stages = int(
            self.run_opts.get("pipeline_stages",
                              h.get("pipeline_stages", 1)) or 1
        )
        pipeline_spec = None
        if stages > 1:
            from ..parallel.pipeline import PipelineSpec, make_pipe_mesh

            data = int(self.run_opts.get("data_parallel_count", -1))
            if data == -1:
                n = jax.device_count()
                if n % stages:
                    raise ValueError(
                        f"{n} devices not divisible by "
                        f"pipeline_stages={stages}"
                    )
                data = n // stages
            self.mesh = make_pipe_mesh(data=data, pipe=stages)
            pipeline_spec = PipelineSpec(
                self.mesh, "pipe", "data",
                num_microbatches=(
                    int(h["pipeline_microbatches"])
                    if h.get("pipeline_microbatches") else None
                ),
            )
        else:
            self.mesh = make_mesh(
                data=int(self.run_opts.get("data_parallel_count", -1))
            )
        self._batch_sharding = batch_sharding(self.mesh)
        self._row_multiple = (
            pipeline_spec.row_multiple if pipeline_spec is not None
            else self.mesh.shape["data"]
        )
        # Coordinated preemption (multi-host): one flag element per device,
        # sharded over the whole mesh; jitted sum = a psum all hosts read
        # identically (see _preemption_stop).
        from jax.sharding import NamedSharding, PartitionSpec

        self._flag_sharding = NamedSharding(
            self.mesh, PartitionSpec(tuple(self.mesh.axis_names))
        )
        self._flag_sum = jax.jit(jnp.sum)

        # precision: --precision run-opt (arguments.py: bf16 | fp32) wins;
        # otherwise the YAML's auto_mix_prec selects bf16 — the TPU-native
        # reading of the reference's AMP fit_batch
        # (train_multitask.py:321-347). fp32 disables the cast entirely.
        precision = str(self.run_opts.get("precision", "") or "").lower()
        if precision == "fp32":
            compute_dtype = None
        elif precision == "bf16":
            compute_dtype = jnp.bfloat16
        else:
            compute_dtype = jnp.bfloat16 if h.get("auto_mix_prec") else None

        self.cfg = StepConfig(
            fbank=h["compute_features"],
            cnn=modules["CNN"],
            transformer=modules["Transformer"],
            seq_lin=modules["seq_lin"],
            ctc_lin=modules.get("ctc_lin", modules["seq_lin"]),
            specaug_opts=_specaug_opts(h),
            ctc_weight=float(h.get("ctc_weight", 0.0)),
            label_smoothing=float(h.get("label_smoothing", 0.0)),
            loss_reduction=h.get("loss_reduction", "batchmean"),
            pad_index=int(h.get("pad_index", 0)),
            blank_index=int(h.get("blank_index", 0)),
            device_speed=(
                h.get("speed_perturb")
                if getattr(h.get("speed_perturb"), "device", False) else None
            ),
            pipeline=pipeline_spec,
            compute_dtype=compute_dtype,
        )
        self.normalize = modules.get("normalize")
        scheduler = h.get("lr_scheduler")
        factory = opt_class if opt_class is not None else h.get("Adam")
        if factory is not None:
            self.tx = make_optimizer(
                factory,
                scheduler.value if scheduler is not None
                else (lambda step: h.get("lr_adam", 1e-3)),
                grad_accumulation_factor=int(
                    h.get("grad_accumulation_factor", 1)
                ),
                # The reference's overridden fit_batch swapped check_gradients
                # (which clips to max_grad_norm) for check_loss_isfinite
                # (train_multitask.py:331-332) — it NEVER clips despite
                # yaml:71. Clipping is opt-in via use_grad_clipping for
                # parity with the shipped recipe.
                max_grad_norm=(
                    h.get("max_grad_norm")
                    if h.get("use_grad_clipping") else None
                ),
                nonfinite_patience=int(h.get("nonfinite_patience", 100)),
            )
            self.train_step = make_train_step(self.cfg, self.tx)
        else:
            # eval-only construction (the inference recipe passes no
            # optimizer — reference inference.py:330-335)
            import optax

            self.tx = optax.identity()
            self.train_step = None
        self.eval_forward = make_eval_forward(self.cfg)
        # the standalone-inference path (reference inference.py:88-110):
        # floor-mask Transformer.encode, CTC head only, no decoder pass
        self.encode_forward = make_encode_forward(self.cfg)

        self.state: Optional[TrainState] = None
        self.optimizer_step_limit = int(h.get("optimizer_step_limit", 10**9))
        self.avg_checkpoints = int(h.get("avg_checkpoints", 5))
        # Dropout RNG: threefry (JAX default) generates ~1 GB of random
        # bits per train step at bench shapes and was measured as the
        # single largest step cost (22.7 -> 4.0 ms forward without it;
        # docs/PERF.md). TPU's hardware RngBitGenerator ('rbg') cuts the
        # full step 53 -> 30 ms with identical i.i.d. dropout statistics.
        # The impl must be selected via jax.config BEFORE key creation —
        # typed per-key impl (jax.random.key(..., impl='rbg')) measured 3x
        # SLOWER than threefry here (158 ms/step), so keys stay raw.
        # run_opt rng_impl: rbg (default) | unsafe_rbg | threefry, or
        # rbg_scoped | unsafe_rbg_scoped.
        # NOTE: the default mutates the PROCESS-GLOBAL default PRNG impl —
        # any other JAX code in this process (and keys it creates
        # afterwards) switches impl too. The *_scoped variants instead
        # thread a TYPED key (jax.random.key(seed, impl=...)) through the
        # trainer — the impl travels with the key, nothing global changes
        # — at a measured +7.5% step cost at the production batch
        # (55.6 vs 51.7 ms/step, B32×15 s small preset on chip — round 4;
        # the round-2 "3× slower" typed-key figure did not reproduce).
        # Pass rng_impl: threefry to opt out of hardware RNG entirely.
        # run_opt transfer_int16: ship training audio host->device as
        # PCM16 (see _device_batch); exact and ~2x cheaper on H2D-bound
        # hosts (dev tunnels, thin NICs)
        self._transfer_int16 = bool(self.run_opts.get("transfer_int16"))
        rng_impl = str(self.run_opts.get("rng_impl", "rbg")).lower()
        self._rng_scoped = rng_impl.endswith("_scoped")
        base_impl = rng_impl[:-len("_scoped")] if self._rng_scoped \
            else rng_impl
        self._rng_base_impl = base_impl
        if base_impl != "threefry" and not self._rng_scoped:
            prev = jax.config.jax_default_prng_impl
            if prev != base_impl:
                jax.config.update("jax_default_prng_impl", base_impl)
                logger.info(
                    "switched process-global jax_default_prng_impl "
                    "%s -> %s for dropout throughput (docs/PERF.md); "
                    "run_opt rng_impl=threefry reverts, "
                    "rng_impl=%s_scoped scopes it to the trainer's keys "
                    "(+7.5%% step cost)", prev, base_impl, base_impl,
                )
        # run_opt train_attn_kernel: auto (default) | on | off.
        # auto = flash-attention training kernel on real TPU backends
        # only: at the reference's 450-500 audio-s batch budget the XLA
        # attention path hits an HBM spill valley (docs/PERF.md round-3
        # sweep: 6.8k vs 9.3k audio-s/s); on CPU the kernel would need
        # interpret mode, which is far slower than XLA.
        tak = str(self.run_opts.get("train_attn_kernel", "auto")).lower()
        from ..ops import pallas as _pallas

        if tak == "on" or (
            # strictly 'tpu': the kernel's Mosaic/SMEM primitives do
            # not lower on GPU, and CPU would need interpret mode
            tak == "auto" and jax.default_backend() == "tpu"
        ):
            _pallas.enable_train()
            logger.info("flash-attention training kernel enabled "
                        "(train_attn_kernel=%s)", tak)
        # run_opt compile_cache_dir: persistent XLA compilation cache so
        # a preemption-resume restart (the SIGTERM trap below) re-enters
        # the hot loop without repaying the per-bucket step compiles.
        cache_dir = self.run_opts.get("compile_cache_dir")
        if cache_dir:
            from ..utils.compile_cache import enable_compile_cache

            enable_compile_cache(str(cache_dir))
        seed = int(h.get("seed", 8886))
        if self._rng_scoped:
            # typed key: the impl is carried BY the key through every
            # split/fold downstream — no process-global state touched.
            # threefry_scoped must build a typed key too: PRNGKey follows
            # the process-global default impl, so another trainer that
            # flipped the global default to rbg would silently leak into
            # a 'scoped threefry' request (ADVICE r4 item 2).
            self._rng = jax.random.key(seed, impl=self._rng_base_impl)
        else:
            self._rng = jax.random.PRNGKey(seed)
        self.train_stats: Dict[str, float] = {}
        self.debug = bool(self.run_opts.get("debug", False))
        self.debug_batches = int(self.run_opts.get("debug_batches", 2))

    # ------------------------------------------------------------ state mgmt
    def ensure_state(self, sample_batch) -> TrainState:
        if self.state is None:
            n_mels = int(self.hparams.get("n_mels", 80))
            self._rng, init_key = jax.random.split(self._rng)
            self.state = init_train_state(
                self.cfg, self.tx, init_key, sample_batch, n_mels
            )
            n_params = sum(
                int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(self.state.params)
            )
            logger.info("initialized %d parameters", n_params)
            self._maybe_resume()
        return self.state

    def _maybe_resume(self) -> None:
        if self.checkpointer is None:
            return
        latest = self.checkpointer.recover_if_possible()
        if latest is None:
            return
        self.load_from_checkpoint(latest)
        logger.info("resumed from %s", latest.path)

    def load_from_checkpoint(self, ckpt) -> None:
        state = self.state
        params = serialization.from_state_dict(
            state.params, ckpt.load("model")
        )
        opt_state = state.opt_state
        if "opt" in ckpt.names():
            opt_state = serialization.from_state_dict(
                state.opt_state, ckpt.load("opt")
            )
        cmvn = state.cmvn
        if "normalizer" in ckpt.names():
            raw = ckpt.load("normalizer")
            cmvn = CmvnState(
                mean=jnp.asarray(raw["mean"]),
                std=jnp.asarray(raw["std"]),
                count=jnp.asarray(raw["count"]),
            )
        counters = (
            ckpt.load("counters") if "counters" in ckpt.names() else {}
        )
        self.state = TrainState(
            params=params,
            opt_state=opt_state,
            cmvn=cmvn,
            optimizer_step=jnp.asarray(
                counters.get("optimizer_step", 0), jnp.int32
            ),
            micro_step=jnp.asarray(counters.get("micro_step", 0), jnp.int32),
        )
        epoch_counter = self.hparams.get("epoch_counter")
        if epoch_counter is not None and "epoch" in counters:
            epoch_counter.current = int(counters["epoch"])

    def _cleanup_timed_checkpoints(self, keep: int = 1) -> None:
        """Keep only the newest `keep` timed checkpoints (ACC-keyed saves
        are managed separately by save_and_keep_only)."""
        import shutil

        timed = [
            c for c in self.checkpointer.list_checkpoints()
            if c.meta.get("timed")
        ]
        timed.sort(key=lambda c: c.meta.get("unixtime", 0), reverse=True)
        for old in timed[keep:]:
            shutil.rmtree(old.path, ignore_errors=True)

    def _checkpoint_trees(self, epoch: int) -> Dict[str, Any]:
        state = self.state
        return {
            "model": state.params,
            "opt": state.opt_state,
            "normalizer": {
                "mean": state.cmvn.mean,
                "std": state.cmvn.std,
                "count": state.cmvn.count,
            },
            "counters": {
                "optimizer_step": int(state.optimizer_step),
                "micro_step": int(state.micro_step),
                "epoch": int(epoch),
            },
        }

    # --------------------------------------------------------------- batches
    def _device_batch(self, batch) -> Dict[str, jnp.ndarray]:
        from ..data.dataset import pad_batch_rows

        sig = batch.sig.data
        if self._transfer_int16 and sig.dtype == np.float32:
            # ship PCM16 and convert on device (run_opt transfer_int16):
            # halves the dominant H2D bytes of a 450 audio-s microbatch
            # (~29 MB fp32 -> 14.4 MB). Exact: source audio is 16-bit on
            # disk, so round(f32*32768) inverts the loader's /32768 and
            # the on-device unpack reproduces the fp32 values bit-for-bit
            # (the serving engine's transfer_dtype='int16' contract,
            # serving.py).
            sig = np.clip(np.rint(sig * 32768.0), -32768, 32767).astype(
                np.int16
            )
        arrays = {
            "sig": sig,
            "sig_len": batch.sig.lengths,
            "tokens": batch.tokens.data,
            "tokens_len": batch.tokens.lengths,
            "tokens_bos": batch.tokens_bos.data,
            "tokens_eos": batch.tokens_eos.data,
            "tokens_eos_len": batch.tokens_eos.lengths,
        }
        if "speed_idx" in getattr(batch, "extras", {}):
            import numpy as _np

            arrays["speed_idx"] = _np.asarray(
                batch.extras["speed_idx"], _np.int32
            )
        # zero-length row padding so the batch divides the mesh data axis
        # (times the microbatch count when the encoder is pipelined)
        arrays = pad_batch_rows(arrays, self._row_multiple)
        n_procs = jax.process_count()
        if n_procs > 1:
            # Multi-host (DCN) path: device_put cannot address other
            # hosts' devices, so every process builds the SAME global
            # batch (loaders are seeded identically), keeps only its
            # process-local row slice, and assembles the global array
            # from local shards. jax.devices() — and therefore the mesh
            # data axis — is process-major, so process p owns the p-th
            # contiguous row block.
            from ..parallel.distributed import process_row_block

            pi = jax.process_index()

            def put(v):
                # rows were just padded to _row_multiple, so this block
                # matches the one BatchLoader.set_shard decoded audio
                # for (process_row_block is the shared source of truth)
                lo, hi = process_row_block(
                    v.shape[0], self._row_multiple, pi, n_procs)
                return jax.make_array_from_process_local_data(
                    self._batch_sharding, v[lo:hi], v.shape,
                )

            return {k: put(v) for k, v in arrays.items()}
        return {
            k: jax.device_put(v, self._batch_sharding)
            for k, v in arrays.items()
        }

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        epoch_counter,
        train_set: BatchLoader,
        valid_set: Optional[BatchLoader] = None,
        train_loader_kwargs=None,
        valid_loader_kwargs=None,
        progress_every: int = 50,
    ) -> None:
        from ..utils.profiling import StepTimer

        timer = StepTimer()
        ckpt_interval = float(
            self.hparams.get("ckpt_interval_minutes", 0) or 0
        ) * 60.0
        last_timed_ckpt = time.time()
        # Preemption safety: TPU VMs get SIGTERM with a short grace window
        # before eviction. Trap it for the duration of fit(): finish the
        # in-flight step, save a resumable checkpoint, and return cleanly
        # (resume restores params/opt state/CMVN/counters exactly —
        # SURVEY.md §5.3). Only the main thread can set signal handlers;
        # fit() from a worker thread keeps the previous behavior.
        self._preempted = False

        def _on_sigterm(signum, frame):
            logger.warning("SIGTERM received — checkpointing and stopping")
            self._preempted = True
            if callable(prev_handler):
                prev_handler(signum, frame)

        prev_handler = None
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not in the main thread
            prev_handler = None
        try:
            self._fit_epochs(
                epoch_counter, train_set, valid_set, timer,
                ckpt_interval, last_timed_ckpt, progress_every)
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def _save_preemption_checkpoint(self, epoch: int) -> None:
        if self.checkpointer is not None and jax.process_index() == 0:
            self.checkpointer.save_checkpoint(
                meta={"preempted": True, "epoch": epoch},
                trees=self._checkpoint_trees(epoch),
            )
        logger.warning(
            "stopped by SIGTERM at epoch %d opt step %d "
            "(checkpoint saved — resume restores exactly)",
            epoch, int(self.state.optimizer_step),
        )

    def _dispatch_preempt_flag(self):
        """Dispatch (async) the global sum of every host's preemption flag."""
        flag = np.full(
            (jax.local_device_count(),),
            1.0 if self._preempted else 0.0, np.float32,
        )
        arr = jax.make_array_from_process_local_data(
            self._flag_sharding, flag, (jax.device_count(),)
        )
        return self._flag_sum(arr)

    def _preemption_stop(self, pending) -> bool:
        """Coordinated stop decision.

        Single-process: the host flag directly. Multi-process: every host
        dispatches a tiny all-reduce of its local flag each step and reads
        the reduction ONE STEP LATE (keeping dispatch pipelined) — all
        hosts read the SAME reduced value at the same loop index, so they
        agree on the exact stop step even when SIGTERM lands mid-step on
        only some hosts. Without this, one host could leave the loop while
        a peer is already blocked in the next step's gradient all-reduce —
        a distributed deadlock. (The reference's single-host trap has no
        such hazard; this is the multi-host-safe TPU-pod equivalent.)
        """
        if jax.process_count() == 1:
            return self._preempted
        pending.append(self._dispatch_preempt_flag())
        if len(pending) >= 2:
            return float(np.asarray(jax.device_get(pending.popleft()))) > 0.0
        return False

    def _drain_preempt_flags(self, pending) -> bool:
        """End-of-epoch agreement on any still-in-flight flags."""
        if jax.process_count() == 1:
            return self._preempted
        stop = False
        while pending:
            if float(np.asarray(jax.device_get(pending.popleft()))) > 0.0:
                stop = True
        return stop

    def _fit_epochs(self, epoch_counter, train_set, valid_set, timer,
                    ckpt_interval, last_timed_ckpt, progress_every) -> None:
        from collections import deque

        pending_flags: deque = deque()
        for epoch in epoch_counter:
            t_epoch = time.time()
            train_set.set_epoch(epoch)
            update_cmvn = (
                self.normalize is not None
                and self.normalize.should_update(epoch)
            )
            losses: List[float] = []
            for i, batch in enumerate(train_set):
                if self.debug and i >= self.debug_batches:
                    break
                dev_batch = self._device_batch(batch)
                self.ensure_state(dev_batch)
                self._rng, step_key = jax.random.split(self._rng)
                self.state, metrics = self.train_step(
                    self.state, dev_batch, step_key, update_cmvn=update_cmvn
                )
                losses.append(metrics["loss"])
                timer.tick(items=float(np.sum(batch.duration)))
                if self._preemption_stop(pending_flags):
                    self._save_preemption_checkpoint(epoch)
                    return
                if progress_every and (i + 1) % progress_every == 0:
                    stats = timer.stats()
                    logger.info(
                        "epoch %d batch %d loss %.4f (opt step %d, "
                        "%.1f steps/s, %.0f audio-s/s)",
                        epoch, i + 1, float(metrics["loss"]),
                        int(self.state.optimizer_step),
                        stats.get("steps_per_sec", 0.0),
                        stats.get("items_per_sec", 0.0),
                    )
                # timed intra-epoch checkpoints (ckpt_interval_minutes,
                # reference yaml:26) — preemption safety on long epochs
                if (
                    ckpt_interval > 0
                    and self.checkpointer is not None
                    and time.time() - last_timed_ckpt > ckpt_interval
                    and jax.process_index() == 0
                ):
                    self.checkpointer.save_checkpoint(
                        meta={"timed": True, "epoch": epoch},
                        trees=self._checkpoint_trees(epoch),
                    )
                    self._cleanup_timed_checkpoints()
                    last_timed_ckpt = time.time()
            if self._drain_preempt_flags(pending_flags):
                self._save_preemption_checkpoint(epoch)
                return
            if not losses:
                logger.warning("epoch %d: empty train loader", epoch)
                continue
            train_loss = float(np.mean([float(l) for l in losses]))
            self.train_stats = {"loss": train_loss}

            stage_stats = {"loss": train_loss}
            if valid_set is not None:
                stage_stats = self._validate(valid_set, epoch)
            self.last_valid_stats = stage_stats

            self._on_valid_end(epoch, stage_stats, time.time() - t_epoch)
            if int(self.state.optimizer_step) >= self.optimizer_step_limit:
                logger.info(
                    "optimizer_step_limit %d reached — stopping",
                    self.optimizer_step_limit,
                )
                break
            if self.debug and epoch >= int(
                self.run_opts.get("debug_epochs", 2)
            ):
                break

    # ------------------------------------------------------------ validation
    def _bind_searcher(self, searcher) -> None:
        searcher.bind(
            self.state.params["Transformer"], self.state.params["seq_lin"]
        )

    def _lang_id(self, lang: str) -> int:
        tokenizer = self.hparams["tokenizer"]
        return tokenizer.encode_as_ids(f"[{lang}]")[-1]

    def _run_search(self, searcher, enc_out, wav_lens, src: str, tgt: str):
        searcher.set_decoder_prefix_tokens(
            self._lang_id(src), self._lang_id(tgt)
        )
        hyps, _scores = searcher(enc_out, wav_lens)
        return hyps

    # Fused dual decode wins while the decode step is overhead-bound and
    # loses once it is HBM-bound. Measured on the real chip at full budget
    # (tools/exp_dual_decode.py, beam 10, int8 cache): B1 +26%, B4 +8%,
    # B8 -26%, B16 -10% -> fuse while total fused rows (2·B·beam) <= 80.
    DUAL_FUSE_MAX_ROWS = 80

    def _run_search_dual(self, searcher, enc_out, wav_lens,
                         src: str, tgt: str):
        """ASR + ST hypotheses off one encoder output; decodes BOTH prompts
        in ONE fused search (``call_multi``) when the fused row count is
        small enough to profit (see DUAL_FUSE_MAX_ROWS), else two
        sequential searches over the shared ``enc_out``. Exact either way
        (parity-tested), so the switch is purely a performance choice. The
        reference always decodes twice (``inference.py:100-129``).
        hparam/run_opt ``fused_dual_decode``: True forces fusion, False
        disables it, unset/'auto' applies the measured threshold."""
        mode = self.hparams.get("fused_dual_decode", "auto")
        rows = 2 * int(enc_out.shape[0]) * searcher.config.beam_size
        fuse = (rows <= self.DUAL_FUSE_MAX_ROWS) if mode == "auto" \
            else bool(mode)
        if not fuse:
            return (
                self._run_search(searcher, enc_out, wav_lens, src, src),
                self._run_search(searcher, enc_out, wav_lens, src, tgt),
            )
        s_id, t_id = self._lang_id(src), self._lang_id(tgt)
        bos = searcher.bos_token
        (asr, _), (st, _) = searcher.call_multi(
            enc_out, wav_lens,
            prompts=[[bos, s_id, s_id], [bos, s_id, t_id]],
        )
        return asr, st

    def _validate(self, valid_set: BatchLoader, epoch: int) -> Dict[str, Any]:
        h = self.hparams
        acc = h["acc_computer"]() if "acc_computer" in h else None
        do_search = (
            "valid_search" in h
            and epoch % int(h.get("valid_search_interval", 10)) == 0
        )
        bleu = h["bleu_computer"]() if do_search else None
        wer = h["error_rate_computer"]() if do_search else None
        bleu_nt = h["bleu_computer"]() if do_search else None
        wer_nt = h["error_rate_computer"]() if do_search else None
        special = {"[turn]": h.get("turn", 7), "[xt]": h.get("xt", 8)}
        if do_search:
            self._bind_searcher(h["valid_search"])

        losses = []
        for i, batch in enumerate(valid_set):
            if self.debug and i >= self.debug_batches:
                break
            dev_batch = self._device_batch(batch)
            self.ensure_state(dev_batch)
            p_ctc, p_seq, enc_out = self.eval_forward(
                self.state.params, self.state.cmvn, dev_batch
            )
            from .step import _objectives  # loss identical to train

            loss, _ = _objectives(p_ctc, p_seq, dev_batch, self.cfg)
            losses.append(float(loss))
            if acc is not None:
                acc.append(
                    gather_to_host(p_seq),
                    gather_to_host(dev_batch["tokens_eos"]),
                    gather_to_host(dev_batch["tokens_eos_len"]),
                )
            if do_search:
                src = batch.source_lang[0]
                tgt = batch.target_lang[0]
                wav_lens = dev_batch["sig_len"]
                hyps_asr, hyps_st = self._run_search_dual(
                    h["valid_search"], enc_out, wav_lens, src, tgt
                )
                self._append_dual_metrics(
                    batch, hyps_st, hyps_asr, bleu, wer, bleu_nt, wer_nt,
                    special,
                )

        stats: Dict[str, Any] = {"loss": float(np.mean(losses or [0.0]))}
        if acc is not None:
            stats["ACC"] = acc.summarize()
        if do_search and bleu is not None and bleu.ids:
            stats["BLEU"] = bleu.summarize("BLEU")
            stats["BLEU_no_turn"] = bleu_nt.summarize("BLEU")
        if do_search and wer is not None and wer.ids:
            stats["WER"] = wer.summarize("error_rate")
            stats["WER_no_turn"] = wer_nt.summarize("error_rate")
        return stats

    def _append_dual_metrics(self, batch, hyps_st, hyps_asr, bleu, wer,
                             bleu_nt, wer_nt, special) -> None:
        tokenizer = self.hparams["tokenizer"]
        tgt_lang = batch.target_lang[0]
        # ST stream vs translation_0
        refs_st = batch.extras.get("translation_0")
        if refs_st and refs_st[0] is not None:
            ids, tgts, preds = append_gt_preds(
                batch.id, refs_st, hyps_st, tgt_lang, tokenizer
            )
            bleu.append(ids, preds, [tgts])
            ids, tgts, preds = append_gt_preds(
                batch.id, refs_st, hyps_st, tgt_lang, tokenizer,
                remove_special_chars=True, chars_dict=special,
            )
            bleu_nt.append(ids, preds, [tgts])
        # ASR stream vs transcription (WER on space-split words)
        refs_asr = batch.extras.get("transcription")
        if refs_asr and refs_asr[0] is not None:
            ids, tgts, preds = append_gt_preds(
                batch.id, refs_asr, hyps_asr, tgt_lang, tokenizer
            )
            wer.append(ids, [p.split(" ") for p in preds],
                       [t.split(" ") for t in tgts])
            ids, tgts, preds = append_gt_preds(
                batch.id, refs_asr, hyps_asr, tgt_lang, tokenizer,
                remove_special_chars=True, chars_dict=special,
            )
            wer_nt.append(ids, [p.split(" ") for p in preds],
                          [t.split(" ") for t in tgts])

    def _on_valid_end(self, epoch: int, stage_stats: Dict[str, Any],
                      epoch_time: float) -> None:
        h = self.hparams
        scheduler = h.get("lr_scheduler")
        # lr the NEXT attempt will run at (reference stepping: attempt a
        # runs at value(a-1), the first at the optimizer construction lr)
        step = int(self.state.optimizer_step)
        lr = (
            float(scheduler.value(step)) if scheduler is not None and step >= 1
            else float(h.get("lr_adam", 0.0))
        )
        if jax.process_index() == 0:
            if "train_logger" in h:
                h["train_logger"].log_stats(
                    stats_meta={
                        "epoch": epoch,
                        "lr": lr,
                        "steps": int(self.state.optimizer_step),
                        "optimizer": "AdamW",
                        "epoch_time": round(epoch_time, 1),
                    },
                    train_stats=self.train_stats,
                    valid_stats=stage_stats,
                )
            if self.checkpointer is not None and "ACC" in stage_stats:
                self.checkpointer.save_and_keep_only(
                    meta={"ACC": float(stage_stats["ACC"]), "epoch": epoch},
                    trees=self._checkpoint_trees(epoch),
                    max_keys=["ACC"],
                    num_to_keep=5,
                )

    # ------------------------------------------------------------ evaluation
    def on_evaluate_start(self, max_key: str = "ACC") -> None:
        """Checkpoint-average the kept top-k into eval weights
        (reference ``on_evaluate_start``, ``train_multitask.py:460-471``)."""
        if self.checkpointer is None or self.state is None:
            return
        ckpts = self.checkpointer.find_checkpoints(max_key=max_key)
        if not ckpts:
            return
        avg = average_checkpoints(ckpts, recoverable_name="model")
        params = serialization.from_state_dict(self.state.params, avg)
        self.state = self.state._replace(params=params)
        logger.info("Loaded the average of %d checkpoints", len(ckpts))

    def evaluate(
        self,
        test_set: BatchLoader,
        test_loader_kwargs=None,
        average_first: bool = True,
    ) -> Dict[str, Any]:
        """Single-task test evaluation (reference ``__main__`` test loop,
        ``train_multitask.py:694-726``)."""
        h = self.hparams
        if average_first:
            self.on_evaluate_start()
        searcher = h["test_search"]
        acc = h["acc_computer"]() if "acc_computer" in h else None
        bleu = h["bleu_computer"]()
        wer = h["error_rate_computer"]()
        bleu_nt = h["bleu_computer"]()
        wer_nt = h["error_rate_computer"]()
        special = {"[turn]": h.get("turn", 7), "[xt]": h.get("xt", 8)}
        tokenizer = h["tokenizer"]

        first = True
        task = None
        for batch in test_set:
            dev_batch = self._device_batch(batch)
            self.ensure_state(dev_batch)
            if first:
                self._bind_searcher(searcher)
                first = False
            if task is None:
                task = batch.task[0]
            if len(set(batch.task)) != 1:
                raise AssertionError(
                    "test sets carry exactly one task per JSON "
                    "(train_multitask.py:115-117)"
                )
            p_ctc, p_seq, enc_out = self.eval_forward(
                self.state.params, self.state.cmvn, dev_batch
            )
            if acc is not None and "tokens_eos" in dev_batch:
                acc.append(
                    gather_to_host(p_seq),
                    gather_to_host(dev_batch["tokens_eos"]),
                    gather_to_host(dev_batch["tokens_eos_len"]),
                )
            src, tgt = batch.source_lang[0], batch.target_lang[0]
            if task == "transcription":
                hyps = self._run_search(
                    searcher, enc_out, dev_batch["sig_len"], src, src
                )
                refs = batch.extras.get("transcription")
                ids, tgts, preds = append_gt_preds(
                    batch.id, refs, hyps, src, tokenizer
                )
                wer.append(ids, [p.split(" ") for p in preds],
                           [t.split(" ") for t in tgts])
                ids, tgts, preds = append_gt_preds(
                    batch.id, refs, hyps, src, tokenizer,
                    remove_special_chars=True, chars_dict=special,
                )
                wer_nt.append(ids, [p.split(" ") for p in preds],
                              [t.split(" ") for t in tgts])
            else:
                hyps = self._run_search(
                    searcher, enc_out, dev_batch["sig_len"], src, tgt
                )
                refs = batch.extras.get("translation_0")
                has_4refs = (
                    batch.extras.get("translation_1") is not None
                    and batch.extras["translation_1"][0] is not None
                )
                ids, tgts, preds = append_gt_preds(
                    batch.id, refs, hyps, tgt, tokenizer
                )
                _, _, preds_nt = append_gt_preds(
                    batch.id, refs, hyps, tgt, tokenizer,
                    remove_special_chars=True, chars_dict=special,
                )
                if has_4refs:
                    four = [
                        batch.extras.get("translation_0"),
                        batch.extras.get("translation_1"),
                        batch.extras.get("translation_2"),
                        batch.extras.get("translation_3"),
                    ]
                    targets, targets_nt = append_4gt(four, tgt, special)
                    bleu.append(ids, preds, targets)
                    bleu_nt.append(ids, preds_nt, targets_nt)
                else:
                    bleu.append(ids, preds, [tgts])
                    _, tgts_nt, _ = append_gt_preds(
                        batch.id, refs, hyps, tgt, tokenizer,
                        remove_special_chars=True, chars_dict=special,
                    )
                    bleu_nt.append(ids, preds_nt, [tgts_nt])

        stats: Dict[str, Any] = {}
        if acc is not None and acc.total > 0:
            stats["ACC"] = acc.summarize()
        if wer.ids:
            stats["WER"] = wer.summarize("error_rate")
            stats["WER_no_turn"] = wer_nt.summarize("error_rate")
            if h.get("wer_file"):
                print_bleu_or_wer(wer, h["wer_file"], logger)
            if h.get("wer_file_no_turn"):
                print_bleu_or_wer(wer_nt, h["wer_file_no_turn"], logger)
        if bleu.ids:
            stats["BLEU"] = bleu.summarize("BLEU")
            stats["BLEU_no_turn"] = bleu_nt.summarize("BLEU")
            if h.get("bleu_file"):
                print_bleu_or_wer(bleu, h["bleu_file"], logger, is_bleu=True)
            if h.get("bleu_file_no_turn"):
                print_bleu_or_wer(
                    bleu_nt, h["bleu_file_no_turn"], logger, is_bleu=True
                )
        if "train_logger" in h:
            h["train_logger"].log_stats(
                stats_meta={"Epoch loaded": int(
                    self.hparams.get("epoch_counter").current
                    if self.hparams.get("epoch_counter") else 0
                )},
                test_stats=stats,
            )
        return stats
