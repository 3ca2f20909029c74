"""The compiled train/eval step (the device hot loop).

TPU-native redesign of the reference's ``ST.compute_forward`` /
``compute_objectives`` / ``fit_batch`` (``train_multitask.py:51-368``): one
jitted function takes the train state + a static-shaped batch and returns the
updated state + metrics. Inside:

  fbank (MXU DFT-matmuls) → CMVN (epoch-gated update) → SpecAugment (train)
  → conv frontend → transformer (teacher-forced) → CTC + label-smoothed NLL
  → grads → optax update.

Reference semantics carried over:
* loss = ctc_weight·CTC + (1-ctc_weight)·NLL(ls=0.1) (``:172-176``);
* gradient accumulation over *consecutive batches* via ``optax.MultiSteps``
  (the reference's ``should_step = step % factor == 0`` — ``:319``; this
  keeps bucket shapes free to vary between microbatches);
* nonfinite-loss step skipping via ``optax.apply_if_finite`` with the
  reference's patience (yaml:76);
* max_grad_norm clipping (yaml:71), AdamW + WarmCoolDecay schedule stepped
  per optimizer step (``:337``).

SPMD: the step is written in global-batch terms; under ``jit`` with the
batch sharded on the mesh ``data`` axis and parameters replicated, GSPMD
inserts the gradient/CMVN all-reduces over ICI (SURVEY.md §5.8).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.cmvn import CmvnState, cmvn_apply, cmvn_update
from ..ops.ctc import ctc_loss
from ..ops.losses import nll_loss
from ..ops.specaugment import spec_augment

__all__ = ["TrainState", "StepConfig", "make_train_step", "make_eval_forward",
           "make_optimizer", "init_train_state"]


class TrainState(NamedTuple):
    params: Any            # {"CNN":…, "Transformer":…, "seq_lin":…, "ctc_lin":…}
    opt_state: Any
    cmvn: CmvnState
    optimizer_step: jax.Array   # () int32 — optimizer attempts at should_step
                                # boundaries (incl. nonfinite-skipped ones),
                                # mirroring reference optimizer_step (:335)
    micro_step: jax.Array       # () int32 — fit_batch calls


class StepConfig(NamedTuple):
    """Static (hashable) step configuration."""

    fbank: Any                 # Fbank op (hashable by id — module-level)
    cnn: Any                   # flax module defs
    transformer: Any
    seq_lin: Any
    ctc_lin: Any
    specaug_opts: Optional[Tuple[Tuple[str, Any], ...]]
    ctc_weight: float
    label_smoothing: float
    loss_reduction: str
    pad_index: int
    blank_index: int
    #: optional DeviceSpeedPerturb — resample on device when the batch
    #: carries a speed_idx column (TPU-native augmentation placement)
    device_speed: Any = None
    #: optional parallel.pipeline.PipelineSpec — pipeline the encoder stack
    #: over the mesh's pipe axis inside the train/eval step (GPipe; grads
    #: flow through the ppermute scan — beyond the reference, which has no
    #: pipeline parallelism)
    pipeline: Any = None
    #: compute dtype for the network forward/backward (None = fp32). With
    #: jnp.bfloat16 this is the TPU-native equivalent of the reference's
    #: AMP fit_batch (``train_multitask.py:321-347``, ``auto_mix_prec``
    #: yaml:75): parameters, optimizer state, feature extraction (fbank/
    #: CMVN/SpecAugment) and both losses stay fp32; the conv frontend,
    #: transformer and head matmuls — where the FLOPs are — run in bf16 on
    #: the MXU. No loss scaling needed (bf16 shares fp32's exponent range,
    #: unlike the fp16 path the reference must GradScaler around).
    compute_dtype: Any = None


def make_optimizer(
    opt_factory,
    schedule_value: Callable,
    grad_accumulation_factor: int = 1,
    max_grad_norm: Optional[float] = None,
    nonfinite_patience: int = 100,
) -> optax.GradientTransformation:
    """Build the full optax chain mirroring reference fit_batch semantics.

    The reference steps the scheduler AFTER ``optimizer.step()`` with the
    already-incremented ``optimizer_step`` (``train_multitask.py:334-337``),
    so attempt ``a`` (1-based, counting ``should_step`` boundaries) runs at
    the lr the scheduler set after attempt ``a-1`` — i.e. ``value(a-1)`` —
    and the very FIRST update runs at the optimizer's construction lr
    (``transformer_multitask.yaml:223-224``), not at the warmup lr.
    Skipped (nonfinite) attempts still advance ``optimizer_step`` and hence
    the schedule, which is why the lr scaling lives OUTSIDE
    ``apply_if_finite`` in its own ``scale_by_schedule`` (whose count
    increments every attempt, applied or skipped), while the Adam moments
    live inside (they must not ingest nonfinite grads).

    The reference's overridden ``fit_batch`` replaced ``check_gradients``
    (which clips to ``max_grad_norm``) with ``check_loss_isfinite``
    (``train_multitask.py:331-332``) — so the reference recipe NEVER clips;
    pass ``max_grad_norm=None`` (the trainer default) for parity, or a value
    to opt in.
    """

    from .optim import OptimizerFactory

    if not isinstance(opt_factory, OptimizerFactory) and callable(opt_factory):
        # YAML !name: entries arrive as partials of the factory function
        # (reference binds them to module parameters — train_multitask.py:657)
        opt_factory = opt_factory()

    first_lr = float(opt_factory.lr)

    def schedule(count):
        # count = attempts before this one; attempt 1 runs at the
        # optimizer's construction lr, attempt a>=2 at value(a-1).
        return jnp.where(
            jnp.asarray(count) == 0,
            jnp.asarray(first_lr, jnp.float32),
            jnp.asarray(schedule_value(count), jnp.float32),
        )

    # unit-lr core: adamw(lr=1) emits -(m̂/(√v̂+eps) + wd·p); the outer
    # scale_by_schedule multiplies by lr(count) — identical math to torch
    # AdamW's p·(1-lr·wd) - lr·m̂/(√v̂+eps).
    if opt_factory.kind == "adamw":
        core = optax.adamw(
            learning_rate=1.0, b1=opt_factory.betas[0],
            b2=opt_factory.betas[1], eps=opt_factory.eps,
            weight_decay=opt_factory.weight_decay,
        )
    else:
        core = optax.adam(
            learning_rate=1.0, b1=opt_factory.betas[0],
            b2=opt_factory.betas[1], eps=opt_factory.eps,
        )
    chain = [optax.clip_by_global_norm(max_grad_norm)] if max_grad_norm else []
    tx: optax.GradientTransformation = optax.chain(*chain, core)
    # (optax.flatten was tried here — running AdamW over one contiguous
    # vector instead of ~400 leaves — and measured no step-time change;
    # XLA already fuses the leaf-wise update well. docs/PERF.md.)
    if nonfinite_patience:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=nonfinite_patience)
    tx = optax.chain(tx, optax.scale_by_schedule(schedule))
    if grad_accumulation_factor > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accumulation_factor)
    return tx


def _cast_floats(tree, dtype):
    """Cast float leaves (params/activations) to the compute dtype."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def _forward(params, cmvn_state, batch, cfg: StepConfig, train: bool,
             update_cmvn: bool, rng):
    wavs, wav_lens = batch["sig"], batch["sig_len"]
    if wavs.dtype == jnp.int16:
        # PCM16 transfer (trainer run_opt transfer_int16): unpack on
        # device — bit-exact inverse of the host pack
        wavs = wavs.astype(jnp.float32) / 32768.0
    if cfg.device_speed is not None and train and "speed_idx" in batch:
        wavs, wav_lens = cfg.device_speed.apply(
            wavs, wav_lens, batch["speed_idx"]
        )
    feats = cfg.fbank(wavs)
    if isinstance(update_cmvn, bool):
        if update_cmvn:
            cmvn_state = cmvn_update(cmvn_state, feats, wav_lens)
    else:
        # traced flag (train_step passes a device bool): both branches
        # live in ONE compiled program, so the epoch-4 freeze of the
        # running CMVN stats (update_until_epoch — reference
        # InputNormalization) does NOT recompile the whole bucket-shape
        # grid mid-run (it did when this was a static jit arg: a second
        # full compile set on a 1-core host cost ~30 min wall-clock)
        cmvn_state = jax.lax.cond(
            update_cmvn,
            lambda: cmvn_update(cmvn_state, feats, wav_lens),
            lambda: cmvn_state,
        )
    feats = cmvn_apply(cmvn_state, feats)

    rngs = {}
    if train:
        rng, k_aug, k_drop = jax.random.split(rng, 3)
        if cfg.specaug_opts is not None:
            feats = spec_augment(feats, k_aug, **dict(cfg.specaug_opts))
        rngs = {"dropout": k_drop}

    if cfg.compute_dtype is not None:
        # mixed precision: features were extracted/normalized/augmented in
        # fp32; the network runs in the compute dtype. The param cast is
        # differentiable — cotangents flow back in bf16 through the network
        # and convert to fp32 exactly at the parameter leaves, so gradients
        # and the optimizer stay fp32 (reference AMP semantics).
        feats = feats.astype(cfg.compute_dtype)
        params = _cast_floats(params, cfg.compute_dtype)

    src = cfg.cnn.apply(
        params["CNN"], feats, deterministic=not train, rngs=rngs
    )
    if cfg.pipeline is not None:
        from ..parallel.pipeline_encoder import pipelined_encode_train

        spec = cfg.pipeline
        enc_out = pipelined_encode_train(
            cfg.transformer, params["Transformer"], src, wav_lens,
            mesh=spec.mesh, axis=spec.axis, data_axis=spec.data_axis,
            num_microbatches=spec.num_microbatches,
            dropout_rng=(
                jax.random.fold_in(rngs["dropout"], 7) if train else None
            ),
            deterministic=not train,
            sequential_reference=getattr(
                spec, "sequential_reference", False
            ),
        )
        dec_out = cfg.transformer.apply(
            params["Transformer"], batch["tokens_bos"], enc_out, wav_lens,
            cfg.pad_index, not train, rngs=rngs,
            method="forward_decoder",
        )
    else:
        enc_out, dec_out = cfg.transformer.apply(
            params["Transformer"], src, batch["tokens_bos"], wav_lens,
            cfg.pad_index, not train, rngs=rngs,
        )
    p_ctc = None
    if cfg.ctc_weight > 0:
        logits_ctc = cfg.ctc_lin.apply(params["ctc_lin"], enc_out)
        p_ctc = jax.nn.log_softmax(logits_ctc.astype(jnp.float32), axis=-1)
    logits_seq = cfg.seq_lin.apply(params["seq_lin"], dec_out)
    p_seq = jax.nn.log_softmax(logits_seq.astype(jnp.float32), axis=-1)
    return p_ctc, p_seq, enc_out, cmvn_state


def _objectives(p_ctc, p_seq, batch, cfg: StepConfig):
    att = nll_loss(
        p_seq, batch["tokens_eos"], batch["tokens_eos_len"],
        label_smoothing=cfg.label_smoothing, reduction=cfg.loss_reduction,
    )
    ctc = 0.0
    if cfg.ctc_weight > 0:
        ctc = ctc_loss(
            p_ctc, batch["tokens"], batch["sig_len"], batch["tokens_len"],
            blank_index=cfg.blank_index, reduction=cfg.loss_reduction,
        )
    loss = cfg.ctc_weight * ctc + (1.0 - cfg.ctc_weight) * att
    return loss, {"loss": loss, "ctc_loss": ctc, "att_loss": att}


def make_train_step(cfg: StepConfig, tx: optax.GradientTransformation):
    """Returns jitted train_step(state, batch, rng, update_cmvn) -> (state, metrics)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng, update_cmvn=False):
        # traced, not static: flipping the CMVN freeze must not recompile
        # the per-bucket step grid (see _forward)
        update_flag = jnp.asarray(update_cmvn, bool)

        def loss_fn(params):
            p_ctc, p_seq, _, new_cmvn = _forward(
                params, state.cmvn, batch, cfg, True, update_flag, rng
            )
            loss, metrics = _objectives(p_ctc, p_seq, batch, cfg)
            return loss, (metrics, new_cmvn)

        (loss, (metrics, new_cmvn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # count applied optimizer updates (MultiSteps gates internally)
        applied = _count_applied(new_opt_state, state.opt_state)
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            cmvn=new_cmvn,
            optimizer_step=state.optimizer_step + applied,
            micro_step=state.micro_step + 1,
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def _count_applied(new_opt_state, old_opt_state) -> jax.Array:
    """1 if the optimizer consumed an update attempt this call.

    Mirrors the reference's ``optimizer_step`` (``train_multitask.py:335``):
    incremented at every ``should_step`` boundary, INCLUDING nonfinite-skipped
    ones — the schedule count (``scale_by_schedule``, outside
    ``apply_if_finite``) has exactly that semantics.
    """
    new_count = _find_count(new_opt_state)
    old_count = _find_count(old_opt_state)
    if new_count is None:
        return jnp.asarray(1, jnp.int32)
    return (new_count - old_count).astype(jnp.int32)


def _find_count(opt_state):
    """Locate the attempt counter in the (possibly wrapped) optax state.

    Preference order: the lr ``ScaleByScheduleState`` (counts every attempt,
    applied or skipped — reference ``optimizer_step`` semantics), then
    ``MultiStepsState.gradient_step`` (same value at boundaries), then any
    inner ``count`` as a fallback for custom chains.
    """
    by_schedule = _find_state_by_name(opt_state, "ScaleByScheduleState")
    if by_schedule is not None:
        return by_schedule.count
    return _find_any_count(opt_state)


def _find_state_by_name(opt_state, name):
    if type(opt_state).__name__ == name:
        return opt_state
    fields = getattr(opt_state, "_fields", None)
    if fields is not None:
        for f in ("inner_opt_state", "inner_state"):
            if f in fields:
                found = _find_state_by_name(getattr(opt_state, f), name)
                if found is not None:
                    return found
    if isinstance(opt_state, (tuple, list)):
        for element in opt_state:
            found = _find_state_by_name(element, name)
            if found is not None:
                return found
    return None


def _find_any_count(opt_state):
    fields = getattr(opt_state, "_fields", None)
    if fields is not None:
        if "gradient_step" in fields:  # MultiStepsState
            return opt_state.gradient_step
        if "count" in fields:  # ScaleBySchedule/Adam state
            return opt_state.count
        if "inner_opt_state" in fields:
            return _find_any_count(opt_state.inner_opt_state)
        if "inner_state" in fields:  # ApplyIfFiniteState
            return _find_any_count(opt_state.inner_state)
    if isinstance(opt_state, (tuple, list)):
        for element in opt_state:
            found = _find_any_count(element)
            if found is not None:
                return found
    return None


def make_eval_forward(cfg: StepConfig):
    """Jitted eval forward: (params, cmvn, batch) -> (p_ctc, p_seq, enc_out)."""

    @jax.jit
    def eval_forward(params, cmvn_state, batch):
        p_ctc, p_seq, enc_out, _ = _forward(
            params, cmvn_state, batch, cfg, False, False,
            jax.random.PRNGKey(0),
        )
        return p_ctc, p_seq, enc_out

    return eval_forward


def make_encode_forward(cfg: StepConfig):
    """Jitted inference-recipe forward: (params, cmvn, batch) ->
    (p_ctc, enc_out).

    Mirrors the reference's standalone ``inference.py:88-110`` exactly:
    fbank -> CMVN -> CNN -> ``Transformer.encode`` (the FLOOR-based
    padding mask, unlike the train forward's round-based one) -> CTC
    head log-softmax. No decoder pass — the searcher decodes from
    ``enc_out`` — so this is also cheaper than the train forward.
    """

    @jax.jit
    def encode_forward(params, cmvn_state, batch):
        feats = cfg.fbank(batch["sig"])
        feats = cmvn_apply(cmvn_state, feats)
        if cfg.compute_dtype is not None:
            feats = feats.astype(cfg.compute_dtype)
            params = _cast_floats(params, cfg.compute_dtype)
        src = cfg.cnn.apply(params["CNN"], feats, deterministic=True)
        enc_out = cfg.transformer.apply(
            params["Transformer"], src, batch["sig_len"],
            method="encode",
        )
        p_ctc = None
        if cfg.ctc_weight > 0:
            logits_ctc = cfg.ctc_lin.apply(params["ctc_lin"], enc_out)
            p_ctc = jax.nn.log_softmax(
                logits_ctc.astype(jnp.float32), axis=-1
            )
        return p_ctc, enc_out

    return encode_forward


def init_train_state(
    cfg: StepConfig, tx: optax.GradientTransformation, rng,
    sample_batch: Dict[str, Any], n_mels: int = 80,
) -> TrainState:
    """Initialize parameters/optimizer from one (host) sample batch."""
    from ..ops.cmvn import cmvn_init

    wavs = jnp.asarray(sample_batch["sig"][:1])
    feats = cfg.fbank(wavs)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    cnn_params = cfg.cnn.init(k1, feats)
    src = cfg.cnn.apply(cnn_params, feats)
    tokens = jnp.asarray(sample_batch["tokens_bos"][:1])
    tr_params = cfg.transformer.init(
        k2, src, tokens, jnp.ones((1,), jnp.float32)
    )
    enc, dec = cfg.transformer.apply(
        tr_params, src, tokens, jnp.ones((1,), jnp.float32)
    )
    seq_params = cfg.seq_lin.init(k3, dec)
    ctc_params = cfg.ctc_lin.init(k4, enc)
    params = {
        "CNN": cnn_params,
        "Transformer": tr_params,
        "seq_lin": seq_params,
        "ctc_lin": ctc_params,
    }
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        cmvn=cmvn_init(n_mels),
        optimizer_step=jnp.zeros((), jnp.int32),
        micro_step=jnp.zeros((), jnp.int32),
    )
