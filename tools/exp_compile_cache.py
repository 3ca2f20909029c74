#!/usr/bin/env python3
"""Measure serving cold-start with the persistent compilation cache.

Builds the flagship small-preset ``STEngine`` (one 10 s bucket, one
16-row rung — ONE fused encode+search program, the unit of the serving
compile grid) and times engine construction + first call. Run it twice:
the first process populates ``--cache-dir``, the second reloads.

  python tools/exp_compile_cache.py --cache-dir /tmp/stac_cc   # cold
  python tools/exp_compile_cache.py --cache-dir /tmp/stac_cc   # warm

Prints one JSON line per run; the warm/cold ratio is the restart win a
production server sees per (bucket x rung) program (multiply by grid
size for the full redeploy saving).
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--rows", type=int, default=16)
    args = ap.parse_args()

    t_start = time.perf_counter()
    if args.cache_dir:
        from stac_st_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache(args.cache_dir)

    import jax

    from stac_st_tpu.models import (
        ConvolutionFrontEnd,
        LinearHead,
        TransformerMultiTask,
    )
    from stac_st_tpu.ops import Fbank
    from stac_st_tpu.ops.cmvn import cmvn_init
    from stac_st_tpu.serving import STEngine

    D, H, ENC_L, DEC_L, FFN, VOCAB = 256, 4, 12, 6, 1024, 5000
    cnn = ConvolutionFrontEnd(out_channels=(256, 256))
    transformer = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=5120, d_model=D, nhead=H,
        num_encoder_layers=ENC_L, num_decoder_layers=DEC_L, d_ffn=FFN,
        dropout=0.1, normalize_before=True, causal=False,
    )
    seq_lin = LinearHead(input_size=D, n_neurons=VOCAB)
    ctc_lin = LinearHead(input_size=D, n_neurons=VOCAB)
    rng = jax.random.PRNGKey(0)
    wav0 = np.zeros((int(args.seconds * 16000),), np.float32)
    fb = Fbank()
    feats = fb(np.zeros((1, wav0.shape[0]), np.float32))
    s = cnn.init(rng, feats)
    src = cnn.apply(s, feats)
    import jax.numpy as jnp

    tr = transformer.init(
        rng, src, jnp.zeros((1, 4), jnp.int32), jnp.ones((1,), jnp.float32))
    dec_stub = jnp.zeros((1, 4, D), src.dtype)
    params = {
        "CNN": s, "Transformer": tr,
        "seq_lin": seq_lin.init(rng, dec_stub),
        "ctc_lin": ctc_lin.init(rng, src),
    }

    class _Tok:
        def decode_ids(self, ids):
            return " ".join(str(i) for i in ids)

        def piece_to_id(self, p):
            return {"[turn]": 7, "[xt]": 8}.get(p, 3)

        def encode_as_ids(self, t):
            return [3]

    t_built = time.perf_counter()
    engine = STEngine(
        transformer, cnn, seq_lin, ctc_lin, params, cmvn_init(80), _Tok(),
        beam_size=10, max_decode_tokens=192, bf16=True,
        bucket_seconds=(args.seconds,), pad_batch_rows=args.rows,
        kv_cache_dtype="int8",
    )
    rng_np = np.random.default_rng(0)
    wavs = [rng_np.standard_normal(int(args.seconds * 16000)).astype(
        np.float32) * 0.1 for _ in range(args.rows)]
    engine.translate(wavs)  # compile (or cache-load) + run the program
    t_done = time.perf_counter()
    print(json.dumps({
        "metric": "serving_cold_start_s",
        "value": round(t_done - t_start, 1),
        "build_to_first_result_s": round(t_done - t_built, 1),
        "cache_dir": args.cache_dir or "off",
    }), flush=True)


if __name__ == "__main__":
    main()
