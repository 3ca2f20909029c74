#!/usr/bin/env python3
"""Secondary benchmark: training throughput (audio-seconds/sec per chip).

(The driver's headline metric is `bench.py`'s inference RTFx; this script
measures the compiled train step on the reference scale grid for tuning.)
Reference envelope: max_batch_len 450-500 s audio per GPU batch on
V100-32GB (BASELINE.md; /root/reference/stac-st/hparams/
transformer_multitask.yaml:102-106). The default batch here matches that
budget: B=32 x 15 s = 480 audio-s per chip. MFU is reported from XLA's
own per-executable flop count against the chip's bf16 peak.

Env knobs:
  STAC_TRAIN_PRESET=small|medium|large   model scale (default small)
  STAC_TRAIN_SWEEP=1                     sweep batch sizes, print a table
  STAC_TRAIN_BATCH=N                     override batch rows (15 s each)
  STAC_TRAIN_FP32=1                      disable bf16 compute
  STAC_TRAIN_THREEFRY=1                  disable hardware-RNG dropout
  STAC_TPU_PEAK_TFLOPS=X                 bf16 peak for MFU (default 197,
                                         TPU v5e)
"""

import json
import os
import time

import numpy as np

SR = 16000
# STAC_TRAIN_SECONDS: utterance length (default 15 s, the reference batch
# shape; long-form multi-turn windows run 30-90 s — SURVEY §5.7)
SECONDS = float(os.environ.get("STAC_TRAIN_SECONDS", "15"))
U = 128
VOCAB = 5000

# reference scale grid (ablations/run_m_and_l_size.sh:72-99)
PRESETS = {
    "small": dict(d=256, h=4, enc=12, dec=6),
    "medium": dict(d=512, h=8, enc=16, dec=6),
    "large": dict(d=1024, h=16, enc=14, dec=6),
}


def _build(preset, batch_rows):
    import jax
    import jax.numpy as jnp

    from stac_st_tpu.models import (
        ConvolutionFrontEnd,
        LinearHead,
        TransformerMultiTask,
    )
    from stac_st_tpu.ops import Fbank
    from stac_st_tpu.training.optim import AdamW
    from stac_st_tpu.training.schedulers import WarmCoolDecayLRSchedule
    from stac_st_tpu.training.step import (
        StepConfig,
        init_train_state,
        make_optimizer,
    )

    p = PRESETS[preset]
    cfg = StepConfig(
        fbank=Fbank(),
        cnn=ConvolutionFrontEnd(),
        transformer=TransformerMultiTask(
            tgt_vocab=VOCAB, input_size=5120, d_model=p["d"], nhead=p["h"],
            num_encoder_layers=p["enc"], num_decoder_layers=p["dec"],
            d_ffn=4 * p["d"],
            # STAC_TRAIN_NODROP=1: bisect knob — rate-0 dropout shortcuts
            # all mask generation, isolating the RNG+mask cost
            dropout=(0.0 if os.environ.get("STAC_TRAIN_NODROP") == "1"
                     else 0.1),
            normalize_before=True,
            # STAC_TRAIN_REMAT=1: rematerialize encoder layers in bwd
            remat=(os.environ.get("STAC_TRAIN_REMAT") == "1"),
        ),
        seq_lin=LinearHead(input_size=p["d"], n_neurons=VOCAB),
        ctc_lin=LinearHead(input_size=p["d"], n_neurons=VOCAB),
        specaug_opts=None,
        # STAC_TRAIN_NOCTC=1: bisect knob — drop the CTC branch entirely
        ctc_weight=(0.0 if os.environ.get("STAC_TRAIN_NOCTC") == "1"
                    else 0.3),
        label_smoothing=0.1,
        loss_reduction="batchmean",
        pad_index=0,
        blank_index=0,
        # bf16 network compute (the production policy: auto_mix_prec);
        # STAC_TRAIN_FP32=1 reverts to full fp32 for comparison runs
        compute_dtype=(
            None if os.environ.get("STAC_TRAIN_FP32") == "1"
            else jnp.bfloat16
        ),
    )
    # STAC_TRAIN_ACCUM=N: gradient accumulation through the production
    # optax.MultiSteps chain (reference effective batch = 4000 audio-s
    # via accumulation 8, run_default.sh grad_accumulation_factor).
    # Each measured step is then ONE microbatch; every Nth applies.
    tx = make_optimizer(
        AdamW(lr=1e-3),
        WarmCoolDecayLRSchedule(1e-3, 1000, 1000, 100000,
                                decay_every=10000).value,
        grad_accumulation_factor=int(
            os.environ.get("STAC_TRAIN_ACCUM", "1")),
        max_grad_norm=5.0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sig": jnp.asarray(
            rng.standard_normal(
                (batch_rows, int(SECONDS * SR))).astype(np.float32)
        ),
        "sig_len": jnp.ones((batch_rows,), jnp.float32),
        "tokens": jnp.asarray(
            rng.integers(3, VOCAB, (batch_rows, U)), jnp.int32),
        "tokens_len": jnp.full((batch_rows,), 0.9, jnp.float32),
        "tokens_bos": jnp.asarray(
            rng.integers(3, VOCAB, (batch_rows, U)), jnp.int32
        ),
        "tokens_eos": jnp.asarray(
            rng.integers(3, VOCAB, (batch_rows, U)), jnp.int32
        ),
        "tokens_eos_len": jnp.full((batch_rows,), 0.9, jnp.float32),
    }
    state = init_train_state(cfg, tx, jax.random.PRNGKey(0), batch)
    return cfg, tx, batch, state


def _key(seed):
    """STAC_TRAIN_TYPED_RBG=1: typed rbg key (impl travels WITH the key,
    no process-global jax_default_prng_impl mutation) — the scoped
    alternative to the config flip, A/B-able against it."""
    import jax

    if os.environ.get("STAC_TRAIN_TYPED_RBG") == "1":
        return jax.random.key(seed, impl="rbg")
    return jax.random.PRNGKey(seed)


def _measure(preset, batch_rows, n_steps=10):
    """Returns (step_ms, audio_s_per_s, mfu_pct, flops_per_step, roofline)."""
    import jax
    import optax

    from stac_st_tpu.training.step import _forward, _objectives

    cfg, tx, batch, state = _build(preset, batch_rows)

    # time whole accumulation cycles so every Nth step's apply cost is
    # averaged in exactly once per cycle
    accum = int(os.environ.get("STAC_TRAIN_ACCUM", "1"))
    if accum > 1:
        n_steps = max(n_steps, 2 * accum)
        n_steps -= n_steps % accum

    fwd_only = os.environ.get("STAC_TRAIN_FWDONLY") == "1"

    # N steps inside ONE jit call: the axon tunnel charges ~1 s dispatch
    # per call, which would swamp the step; a scan amortizes it the same
    # way a real input pipeline keeps the device busy.
    @jax.jit
    def multi_step(state, batch, key):
        def body(state, k):
            def loss_fn(params):
                p_ctc, p_seq, _, new_cmvn = _forward(
                    params, state.cmvn, batch, cfg, True, False, k
                )
                loss, _ = _objectives(p_ctc, p_seq, batch, cfg)
                return loss, new_cmvn

            if fwd_only:  # bisect knob: loss only, no grad/optimizer
                loss, _ = loss_fn(state.params)
                return state, loss

            (loss, new_cmvn), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return state._replace(
                params=params, opt_state=opt_state, cmvn=new_cmvn
            ), loss

        keys = jax.random.split(key, n_steps)
        state, losses = jax.lax.scan(body, state, keys)
        return state, losses

    # ONE AOT compile, reused for the run; XLA's own flop count for MFU.
    # cost_analysis counts a scan BODY once, NOT times the trip count
    # (verified: identical flops at length 1 and 10), so the per-step
    # count is the scan program's count as-is — do not divide by n_steps.
    compiled = multi_step.lower(
        state, batch, _key(1)).compile()
    flops_per_step = bytes_per_step = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca and ca.get("flops"):
            flops_per_step = float(ca["flops"])
        if ca and ca.get("bytes accessed"):
            bytes_per_step = float(ca["bytes accessed"])
    except Exception:
        pass

    state, losses = compiled(state, batch, _key(1))
    float(losses[-1])  # force
    t0 = time.perf_counter()
    state, losses = compiled(state, batch, _key(2))
    float(losses[-1])
    dt = (time.perf_counter() - t0) / n_steps

    peak = float(os.environ.get("STAC_TPU_PEAK_TFLOPS", "197")) * 1e12
    mfu = (flops_per_step / dt / peak * 100.0) if flops_per_step else None
    roofline = None
    if flops_per_step and bytes_per_step:
        # roofline statement (docs/PERF.md): the step cannot run faster
        # than max(compute bound, HBM bound). "bytes accessed" is XLA's
        # own HLO-level traffic estimate (counts re-reads an actual
        # fusion may keep in VMEM, so the HBM bound is an upper bound on
        # required traffic and the derived ceiling is conservative).
        hbm = float(os.environ.get("STAC_TPU_HBM_GBS", "819")) * 1e9
        t_compute = flops_per_step / peak
        t_hbm = bytes_per_step / hbm
        bound_s = max(t_compute, t_hbm)
        roofline = {
            "flops_per_step": flops_per_step,
            "bytes_per_step": bytes_per_step,
            "arith_intensity": round(flops_per_step / bytes_per_step, 1),
            "bound_compute_ms": round(t_compute * 1e3, 2),
            "bound_hbm_ms": round(t_hbm * 1e3, 2),
            "bound_ms": round(bound_s * 1e3, 2),
            "measured_ms": round(dt * 1e3, 2),
            "of_roofline_pct": round(bound_s / dt * 100.0, 1),
        }
    return (dt * 1000.0, batch_rows * SECONDS / dt, mfu, flops_per_step,
            roofline)


def main():
    import jax
    if os.environ.get("STAC_TRAIN_THREEFRY") != "1":
        # TPU hardware RngBitGenerator for dropout bits (docs/PERF.md)
        jax.config.update("jax_default_prng_impl", "rbg")
    if os.environ.get("STAC_PALLAS") == "1":
        from stac_st_tpu.ops import pallas as pallas_mod

        pallas_mod.enable()
        print("# pallas train kernels ENABLED", flush=True)

    preset = os.environ.get("STAC_TRAIN_PRESET", "small")

    sweep = os.environ.get("STAC_TRAIN_SWEEP")
    if sweep:
        # "1" = default grid; otherwise a comma list of batch sizes
        grid = ((16, 24, 32, 40, 48, 64) if sweep == "1"
                else tuple(int(x) for x in sweep.split(",")))
        rows = []
        for b in grid:
            try:
                ms, aps, mfu, fl, roof = _measure(preset, b)
            except Exception as exc:  # OOM etc: record and stop the sweep
                rows.append({"batch": b, "error": str(exc)[:200]})
                break
            rows.append({
                "batch": b, "audio_s": b * SECONDS,
                "step_ms": round(ms, 1),
                "audio_s_per_s": round(aps, 1),
                "mfu_pct": round(mfu, 1) if mfu else None,
                **({"roofline": roof} if roof and os.environ.get(
                    "STAC_TRAIN_ROOFLINE") else {}),
            })
            print(json.dumps(rows[-1]))
        print(json.dumps({"metric": "train_sweep", "preset": preset,
                          "rows": rows}))
        return

    batch_rows = int(os.environ.get("STAC_TRAIN_BATCH", "32"))
    ms, aps, mfu, fl, roof = _measure(preset, batch_rows)
    print(json.dumps({
        "metric": "train_audio_seconds_per_sec",
        "value": round(aps, 1),
        "unit": "audio_s_per_s_per_chip",
        "step_ms": round(ms, 1),
        "batch_audio_s": batch_rows * SECONDS,
        "mfu_pct": round(mfu, 1) if mfu else None,
        **({"roofline": roof} if roof else {}),
        "precision": ("fp32" if os.environ.get("STAC_TRAIN_FP32") == "1"
                      else "bf16"),
        "preset": preset,
    }))


if __name__ == "__main__":
    main()
