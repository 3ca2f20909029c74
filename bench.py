#!/usr/bin/env python3
"""Benchmark: batched ST inference throughput (RTFx) on one TPU chip.

Measures the headline rebuild target (BASELINE.md: ≥20× real-time batched ST
inference per v5e chip): end-to-end fbank → CMVN → conv frontend → encoder →
prompted KV-cached beam search (test config: beam 10, temperature 1.15,
eos-threshold + length-norm), on a batch of 10 s utterances.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is RTFx / 20 (the reference north-star target; the reference
repo publishes no number of its own — BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("STAC_PALLAS") == "1":
        from stac_st_tpu.ops import pallas as pallas_mod

        pallas_mod.enable()
        print("# pallas decode kernels ENABLED", flush=True)

    from stac_st_tpu.decoding.beam_search import MultiTaskBeamSearch
    from stac_st_tpu.models import (
        ConvolutionFrontEnd,
        LinearHead,
        TransformerMultiTask,
    )
    from stac_st_tpu.ops import Fbank
    from stac_st_tpu.ops.cmvn import cmvn_apply, cmvn_init

    # flagship 'small' preset: d256, 12 enc + 6 dec (run_m_and_l_size.sh:72-99)
    D_MODEL, NHEAD, ENC_L, DEC_L, FFN, VOCAB = 256, 4, 12, 6, 1024, 5000
    BATCH = 16
    SECONDS = 10.0
    SR = 16000
    BEAM = 10

    cnn = ConvolutionFrontEnd(out_channels=(256, 256))
    transformer = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=5120, d_model=D_MODEL, nhead=NHEAD,
        num_encoder_layers=ENC_L, num_decoder_layers=DEC_L, d_ffn=FFN,
        dropout=0.1, normalize_before=True, causal=False,
    )
    seq_lin = LinearHead(input_size=D_MODEL, n_neurons=VOCAB)
    fbank = Fbank()

    rng = np.random.default_rng(0)
    wavs = jnp.asarray(
        rng.standard_normal((BATCH, int(SECONDS * SR))).astype(np.float32)
    )
    wav_lens = jnp.ones((BATCH,), jnp.float32)

    key = jax.random.PRNGKey(0)
    feats = fbank(wavs)
    cnn_params = cnn.init(key, feats)
    src = cnn.apply(cnn_params, feats)
    tr_params = transformer.init(
        key, src, jnp.ones((BATCH, 8), jnp.int32), wav_lens
    )
    dummy = transformer.apply(
        tr_params, src[:1], wav_lens[:1], method=transformer.encode
    )
    seq_params = seq_lin.init(key, dummy)
    cmvn = cmvn_init(80)

    @jax.jit
    def encode(params_cnn, params_tr, cmvn_state, wavs, wav_lens):
        feats = fbank(wavs)                      # fp32 feature extraction
        feats = cmvn_apply(cmvn_state, feats)
        src = cnn.apply(params_cnn, feats.astype(jnp.bfloat16))
        return transformer.apply(
            params_tr, src, wav_lens, method=transformer.encode
        )

    # bf16 inference: matmul-bound stages at MXU-native precision; the beam
    # scoring itself stays fp32 (log_softmax upcasts inside the search)
    def to_bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    tr_params = to_bf16(tr_params)
    seq_params = to_bf16(seq_params)
    cnn_params = to_bf16(cnn_params)

    searcher = MultiTaskBeamSearch(
        [transformer, seq_lin, None],
        bos_index=1, eos_index=2, blank_index=0,
        min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=BEAM,
        using_eos_threshold=True, length_normalization=True,
        temperature=1.15,
    )
    searcher.bind(tr_params, seq_params)
    searcher.set_decoder_prefix_tokens(3, 4)

    def run():
        enc_out = encode(cnn_params, tr_params, cmvn, wavs, wav_lens)
        hyps, scores = searcher(enc_out, wav_lens)
        return hyps

    # warmup / compile
    run()
    # timed
    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run()
    elapsed = time.perf_counter() - t0

    audio_seconds = BATCH * SECONDS * n_iters
    rtfx = audio_seconds / elapsed
    print(json.dumps({
        "metric": "st_inference_rtfx_beam10_b16_10s",
        "value": round(rtfx, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtfx / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
