#!/usr/bin/env python3
"""Measure the fused dual-prompt (ASR+ST) decode vs two sequential searches.

The inference recipe's per-utterance work is: encode ONCE, then decode the
same encoder output under the ASR prompt and the ST prompt (reference
``/root/reference/stac-st/inference.py:100-129``). ``call_multi`` fuses the
two searches into one beam-search program over 2B rows, paying the decode
loop's per-step fixed cost once for both output streams.

Methodology (docs/PERF.md round 3, axon tunnel): N iterations scanned
inside one compiled program — a single dispatch + host transfer — with a
per-iteration input perturbation to defeat loop-invariant hoisting. The
metric is audio-seconds-per-second of BOTH-STREAM decoding: each iteration
decodes B×SECONDS of audio into two hypothesis streams; RTFx counts the
audio once (the work is "inference recipe throughput", not "per decode").

Usage: python -u tools/exp_dual_decode.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from stac_st_tpu.decoding.beam_search import MultiTaskBeamSearch
    from stac_st_tpu.models import (
        ConvolutionFrontEnd,
        LinearHead,
        TransformerMultiTask,
    )
    from stac_st_tpu.ops import Fbank
    from stac_st_tpu.ops.cmvn import cmvn_apply, cmvn_init

    D_MODEL, NHEAD, ENC_L, DEC_L, FFN, VOCAB = 256, 4, 12, 6, 1024, 5000
    BATCH = int(os.environ.get("DUAL_BATCH", "16"))
    SECONDS = float(os.environ.get("DUAL_SECONDS", "10.0"))
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
        temperature=1.15, kv_cache_dtype="int8",
    )
    searcher.bind(tr_params, seq_params)

    prompt_asr = jnp.asarray([1, 3, 3], jnp.int32)
    prompt_st = jnp.asarray([1, 3, 4], jnp.int32)
    # fused: (2B, 3) rows, tile-major [asr×B, st×B]
    prompt_rows = jnp.concatenate([
        jnp.tile(prompt_asr[None, :], (BATCH, 1)),
        jnp.tile(prompt_st[None, :], (BATCH, 1)),
    ], axis=0)

    def encode_body(w):
        feats = cmvn_apply(cmvn, fbank(w))
        s = cnn.apply(cnn_params, feats.astype(jnp.bfloat16))
        return transformer.apply(
            tr_params, s, wav_lens, method=transformer.encode
        )

    n_iters = 4

    @jax.jit
    def scanned_sequential(wavs):
        def body(carry, i):
            enc = encode_body(wavs + i.astype(jnp.float32) * 1e-7)
            _t, _l, sc_a, _s = searcher.search_arrays(
                enc, wav_lens, prompt=prompt_asr
            )
            _t, _l, sc_b, _s = searcher.search_arrays(
                enc, wav_lens, prompt=prompt_st
            )
            return carry + sc_a.sum() + sc_b.sum(), None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(n_iters))
        return total

    @jax.jit
    def scanned_fused(wavs):
        wl2 = jnp.concatenate([wav_lens, wav_lens])

        def body(carry, i):
            enc = encode_body(wavs + i.astype(jnp.float32) * 1e-7)
            enc2 = jnp.concatenate([enc, enc], axis=0)
            _t, _l, sc, _s = searcher.search_arrays(
                enc2, wl2, prompt=prompt_rows
            )
            return carry + sc.sum(), None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(n_iters))
        return total

    for name, fn in (("sequential_2x", scanned_sequential),
                     ("fused_dual", scanned_fused)):
        np.asarray(fn(wavs))  # compile
        t0 = time.perf_counter()
        np.asarray(fn(wavs))
        dt = time.perf_counter() - t0
        rtfx = BATCH * SECONDS * n_iters / dt
        print(f"{name}: {dt*1e3/n_iters:.1f} ms/iter  "
              f"dual-stream RTFx {rtfx:.1f}", flush=True)


if __name__ == "__main__":
    main()
