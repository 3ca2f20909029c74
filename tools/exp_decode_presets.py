#!/usr/bin/env python3
"""Full-budget decode RTFx across the reference scale grid.

bench.py measures the flagship small preset; this sweeps the reference's
size-ablation presets (``ablations/run_m_and_l_size.sh:72-99``: medium
d512·8h·16+6L, large d1024·16h·14+6L, d_ffn=4·d_model) with the same
methodology (B16 × 10 s, beam 10, int8 KV cache, scanned device
throughput — docs/PERF.md round 3).

Usage: python -u tools/exp_decode_presets.py [small medium large]
Env:   STAC_WINT8=1        weight-only int8 decode (utils/quantize.py)
       STAC_DECODE_BATCH=N batch rows (default 16; 1 = single stream)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# single source of truth for the reference scale grid
from bench_train import PRESETS as _TRAIN_PRESETS  # noqa: E402

PRESETS = {
    name: dict(d_model=p["d"], nhead=p["h"], enc=p["enc"], dec=p["dec"])
    for name, p in _TRAIN_PRESETS.items()
}


def run_preset(name: str, cfg: dict) -> float:
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

    BATCH, SECONDS, SR, BEAM, VOCAB = 16, 10.0, 16000, 10, 5000
    BATCH = int(os.environ.get("STAC_DECODE_BATCH", BATCH))
    d = cfg["d_model"]

    cnn = ConvolutionFrontEnd(out_channels=(256, 256))
    transformer = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=5120, d_model=d, nhead=cfg["nhead"],
        num_encoder_layers=cfg["enc"], num_decoder_layers=cfg["dec"],
        d_ffn=4 * d, dropout=0.1, normalize_before=True, causal=False,
    )
    seq_lin = LinearHead(input_size=d, n_neurons=VOCAB)
    fbank = Fbank()

    rng = np.random.default_rng(0)
    wavs = jnp.asarray(
        rng.standard_normal((BATCH, int(SECONDS * SR))).astype(np.float32))
    wav_lens = jnp.ones((BATCH,), jnp.float32)

    key = jax.random.PRNGKey(0)
    feats = fbank(wavs)
    cnn_params = cnn.init(key, feats)
    src = cnn.apply(cnn_params, feats)
    tr_params = transformer.init(
        key, src, jnp.ones((BATCH, 8), jnp.int32), wav_lens)
    dummy = transformer.apply(
        tr_params, src[:1], wav_lens[:1], method=transformer.encode)
    seq_params = seq_lin.init(key, dummy)
    cmvn = cmvn_init(80)

    def to_bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    tr_params, seq_params, cnn_params = (
        to_bf16(tr_params), to_bf16(seq_params), to_bf16(cnn_params))

    wint8 = os.environ.get("STAC_WINT8") == "1"
    if wint8:
        from stac_st_tpu.utils.quantize import quantize_decode_weights

        tr_params, seq_params = quantize_decode_weights(
            tr_params, seq_params)

    searcher = MultiTaskBeamSearch(
        [transformer, seq_lin, None],
        bos_index=1, eos_index=2, blank_index=0,
        min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=BEAM,
        using_eos_threshold=True, length_normalization=True,
        temperature=1.15, kv_cache_dtype="int8",
    )
    searcher.bind(tr_params, seq_params)
    prompt = jnp.asarray([1, 3, 4], jnp.int32)

    n_iters = 3

    @jax.jit
    def scanned(cnn_p, tr_p, cmvn_state, wavs):
        def body(carry, i):
            w = wavs + i.astype(jnp.float32) * 1e-7
            f = cmvn_apply(cmvn_state, fbank(w))
            s = cnn.apply(cnn_p, f.astype(jnp.bfloat16))
            enc = transformer.apply(
                tr_p, s, wav_lens, method=transformer.encode)
            _t, _l, sc, _s = searcher.search_arrays(
                enc, wav_lens, prompt=prompt)
            return carry + sc.sum(), None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(n_iters))
        return total

    np.asarray(scanned(cnn_params, tr_params, cmvn, wavs))  # compile
    t0 = time.perf_counter()
    np.asarray(scanned(cnn_params, tr_params, cmvn, wavs))
    dt = time.perf_counter() - t0
    rtfx = BATCH * SECONDS * n_iters / dt
    tag = " wint8" if wint8 else ""
    print(f"{name} (d{d}/{cfg['nhead']}h/{cfg['enc']}+{cfg['dec']}L) "
          f"B{BATCH}{tag}: "
          f"{dt*1e3/n_iters:.1f} ms/iter  full-budget RTFx {rtfx:.1f}",
          flush=True)
    return rtfx


def main():
    names = sys.argv[1:] or ["medium", "large"]
    for name in names:
        run_preset(name, PRESETS[name])


if __name__ == "__main__":
    main()
