#!/usr/bin/env python3
"""Secondary benchmark: training throughput (audio-seconds/sec per chip).

(The driver's headline metric is `bench.py`'s inference RTFx; this script
measures the compiled train step on the flagship small preset for tuning.)
Reference envelope for context: max_batch_len 450–500 s audio per GPU batch
on V100-32GB (BASELINE.md).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    if os.environ.get("STAC_TRAIN_THREEFRY") != "1":
        # TPU hardware RngBitGenerator for dropout bits (docs/PERF.md)
        jax.config.update("jax_default_prng_impl", "rbg")
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

    BATCH, SECONDS, SR, U = 16, 15.0, 16000, 128
    VOCAB = 5000

    # reference scale grid (ablations/run_m_and_l_size.sh:72-99)
    PRESETS = {
        "small": dict(d=256, h=4, enc=12, dec=6),
        "medium": dict(d=512, h=8, enc=16, dec=6),
        "large": dict(d=1024, h=16, enc=14, dec=6),
    }
    preset = PRESETS[os.environ.get("STAC_TRAIN_PRESET", "small")]
    D_M, NH, ENC_L, DEC_L = (preset["d"], preset["h"], preset["enc"],
                             preset["dec"])

    cfg = StepConfig(
        fbank=Fbank(),
        cnn=ConvolutionFrontEnd(),
        transformer=TransformerMultiTask(
            tgt_vocab=VOCAB, input_size=5120, d_model=D_M, nhead=NH,
            num_encoder_layers=ENC_L, num_decoder_layers=DEC_L,
            d_ffn=4 * D_M,
            dropout=0.1, normalize_before=True,
        ),
        seq_lin=LinearHead(input_size=D_M, n_neurons=VOCAB),
        ctc_lin=LinearHead(input_size=D_M, n_neurons=VOCAB),
        specaug_opts=None,
        ctc_weight=0.3,
        label_smoothing=0.1,
        loss_reduction="batchmean",
        pad_index=0,
        blank_index=0,
        # bf16 network compute (the production policy: auto_mix_prec);
        # STAC_TRAIN_FP32=1 reverts to full fp32 for comparison runs
        compute_dtype=(
            None if os.environ.get("STAC_TRAIN_FP32") == "1"
            else __import__("jax.numpy", fromlist=["bfloat16"]).bfloat16
        ),
    )
    tx = make_optimizer(
        AdamW(lr=1e-3),
        WarmCoolDecayLRSchedule(1e-3, 1000, 1000, 100000,
                                decay_every=10000).value,
        grad_accumulation_factor=1,
        max_grad_norm=5.0,
    )
    rng = np.random.default_rng(0)
    batch = {
        "sig": jnp.asarray(
            rng.standard_normal((BATCH, int(SECONDS * SR))).astype(np.float32)
        ),
        "sig_len": jnp.ones((BATCH,), jnp.float32),
        "tokens": jnp.asarray(rng.integers(3, VOCAB, (BATCH, U)), jnp.int32),
        "tokens_len": jnp.full((BATCH,), 0.9, jnp.float32),
        "tokens_bos": jnp.asarray(
            rng.integers(3, VOCAB, (BATCH, U)), jnp.int32
        ),
        "tokens_eos": jnp.asarray(
            rng.integers(3, VOCAB, (BATCH, U)), jnp.int32
        ),
        "tokens_eos_len": jnp.full((BATCH,), 0.9, jnp.float32),
    }
    state = init_train_state(cfg, tx, jax.random.PRNGKey(0), batch)

    # N steps inside ONE jit call: the axon tunnel charges ~1 s dispatch per
    # call, which would swamp the ~100 ms step; a scan amortizes it the same
    # way a real input pipeline keeps the device busy.
    import optax
    from stac_st_tpu.training.step import _forward, _objectives

    N = 10

    @jax.jit
    def multi_step(state, batch, key):
        def body(state, k):
            def loss_fn(params):
                p_ctc, p_seq, _, new_cmvn = _forward(
                    params, state.cmvn, batch, cfg, True, False, k
                )
                loss, _ = _objectives(p_ctc, p_seq, batch, cfg)
                return loss, new_cmvn

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

        keys = jax.random.split(key, N)
        state, losses = jax.lax.scan(body, state, keys)
        return state, losses

    state, losses = multi_step(state, batch, jax.random.PRNGKey(1))
    float(losses[-1])  # compile + force
    t0 = time.perf_counter()
    state, losses = multi_step(state, batch, jax.random.PRNGKey(2))
    float(losses[-1])
    dt = (time.perf_counter() - t0) / N
    audio_per_step = BATCH * SECONDS
    print(json.dumps({
        "metric": "train_audio_seconds_per_sec",
        "value": round(audio_per_step / dt, 1),
        "unit": "audio_s_per_s_per_chip",
        "step_ms": round(dt * 1000, 1),
        "precision": "fp32" if cfg.compute_dtype is None else "bf16",
        "preset": os.environ.get("STAC_TRAIN_PRESET", "small"),
    }))


if __name__ == "__main__":
    main()
