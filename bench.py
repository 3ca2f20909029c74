#!/usr/bin/env python3
"""Benchmark: batched ST inference throughput (RTFx) on one TPU chip.

Measures the headline rebuild target (BASELINE.md: ≥20× real-time batched ST
inference per v5e chip): end-to-end fbank → CMVN → conv frontend → encoder →
prompted KV-cached beam search (test config: beam 10, temperature 1.15,
eos-threshold + length-norm), on a batch of 10 s utterances.

Two phases:
1. random weights, full decode budget (no early exit binds — the
   round-comparable headline, same metric as previous rounds);
2. briefly ON-CHIP-TRAINED weights (a few hundred steps on a synthetic
   supervised task — enough for eos to fire), serving config
   ``max_decode_tokens=192``: early exit + eos-threshold actually bind, so
   this is the RTFx a deployed model sees. Because beam-search params are
   dynamic jit arguments, the trained phase reuses the already-compiled
   kernels.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (random
phase; vs_baseline = RTFx / 20, the north-star target) plus trained_*
fields for phase 2. The decode KV cache defaults to int8 (the
recommended full-budget serving config — docs/PERF.md round 3);
STAC_KV_INT8=0 restores bf16. Each phase also reports a
*_device_throughput field measured as N iterations scanned inside one
compiled program: the per-chip identity without this dev tunnel's
~28 ms/call dispatch round trip (which dominates short trained decodes).
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

    cnn_params_f32, tr_params_f32, seq_params_f32 = (
        cnn_params, tr_params, seq_params
    )
    tr_params = to_bf16(tr_params)
    seq_params = to_bf16(seq_params)
    cnn_params = to_bf16(cnn_params)

    growth = os.environ.get("STAC_CACHE_GROWTH")
    searcher = MultiTaskBeamSearch(
        [transformer, seq_lin, None],
        bos_index=1, eos_index=2, blank_index=0,
        min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=BEAM,
        using_eos_threshold=True, length_normalization=True,
        temperature=1.15,
        **({"cache_growth": int(growth)} if growth else {}),
        # int8-quantized decode KV cache: the recommended full-budget
        # serving config (docs/PERF.md round 3, +14% at these shapes;
        # hyp-equality parity-tested). STAC_KV_INT8=0 restores bf16.
        **({} if os.environ.get("STAC_KV_INT8") == "0"
           else {"kv_cache_dtype": "int8"}),
    )
    searcher.bind(tr_params, seq_params)
    searcher.set_decoder_prefix_tokens(3, 4)

    def run():
        enc_out = encode(cnn_params, tr_params, cmvn, wavs, wav_lens)
        hyps, scores = searcher(enc_out, wav_lens)
        return hyps

    # warmup / compile
    run()
    # timed, dispatch-inclusive (round-1/2 methodology: two host round
    # trips per iteration — encode call + search call). This stays the
    # headline "value" so rounds compare like-for-like.
    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run()
    elapsed = time.perf_counter() - t0
    rtfx = BATCH * SECONDS * n_iters / elapsed

    # device throughput: N iterations of encode+search inside ONE
    # compiled program — the per-chip identity a production TPU host
    # sees. The axon dev tunnel charges ~28 ms per call round trip
    # (measured, docs/PERF.md round 3), which dominates SHORT decodes
    # (trained, early-exiting) and is an environment artifact, not
    # framework or chip time; at the full budget it is ~13% of the
    # program, so the two numbers are close there.
    rtfx_device = _scanned_rtfx(
        searcher, fbank, cnn, transformer, cnn_params, tr_params, cmvn,
        wavs, wav_lens, BATCH, SECONDS, n_iters=5,
    )

    # ---- phase 2: brief on-chip training so eos/early-exit bind ----------
    trained = {}
    if os.environ.get("STAC_BENCH_NOTRAIN") != "1":
        try:
            trained = _trained_phase(
                fbank, cnn, transformer, seq_lin, cnn_params_f32,
                tr_params_f32, seq_params_f32, wavs, wav_lens, to_bf16,
                searcher, encode, cmvn, BATCH, SECONDS, VOCAB,
            )
        except Exception as exc:  # report the headline even if phase 2 dies
            trained = {"trained_error": f"{type(exc).__name__}: {exc}"}

    result = {
        "metric": "st_inference_rtfx_beam10_b16_10s",
        "value": round(rtfx, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtfx / 20.0, 3),
        "rtfx_device_throughput": round(rtfx_device, 2),
        # host->device dispatch round trip (median of 20 trivial calls):
        # the environment tax each dispatch-inclusive number pays per
        # call. Short trained decodes make ~2 round trips per iteration,
        # so drift in THIS number (tunnel load, not framework) moves
        # trained_rtfx_cap192 directly — publishing it makes that drift
        # attributable (VERDICT r4 item 4; docs/PERF.md round 5).
        "dispatch_ms_median": _dispatch_ms(),
        **trained,
    }
    # Regression floors, RATCHETED (VERDICT r4 item 4): each floored key's
    # floor follows the best value any previous round measured (committed
    # BENCH_r*.json history), so quiet drift can no longer pass a fixed
    # floor while giving back the gains. DEVICE-throughput identities
    # ratchet at 95% of best (tight: the scanned program excludes the
    # host). DISPATCH-INCLUSIVE numbers ratchet at 90%: they carry the
    # tunnel's per-call round trip, which measurably wanders (round 5:
    # dispatch_ms_median 30.1 vs the ~28 ms historical — device
    # throughput was flat at -0.08% vs best while the inclusive headline
    # moved -6%; the dispatch_ms_median field in the output makes this
    # attribution explicit per run). Static minimums below are the r3
    # floors (history files may be absent in a fresh checkout).
    # STAC_BENCH_NOFLOOR=1 disables.
    floors = {
        "value": 440.0,
        "rtfx_device_throughput": 480.0,
        "trained_rtfx_device_throughput": 7000.0,
        "trained_rtfx_cap192": 0.0,   # ratchet-only (see docs/PERF.md r5)
    }
    inclusive = {"value", "trained_rtfx_cap192"}
    for key, best in _best_prior(floors).items():
        factor = 0.90 if key in inclusive else 0.95
        floors[key] = max(
            floors[key] if key not in inclusive else 0.0,
            round(factor * best, 2),
        )
    if os.environ.get("STAC_BENCH_NOFLOOR") != "1":
        broken = [
            f"{k} {result[k]} < floor {v}"
            for k, v in floors.items()
            if k in result and result[k] < v
        ]
        if broken:
            result["regression"] = broken
    print(json.dumps(result))
    if result.get("regression"):
        sys.exit(1)


def _dispatch_ms():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    f(x).block_until_ready()  # compile
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        times.append(time.perf_counter() - t0)
    return round(float(np.median(times)) * 1000.0, 2)


def _best_prior(keys):
    """Best per-key value across committed BENCH_r*.json round history."""
    import glob
    import os.path

    best = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                text = f.read()
            # driver files wrap the bench line in a {"parsed": {...}} blob
            blob = json.loads(text)
            rows = [blob.get("parsed", blob)]
        except Exception:
            continue
        for row in rows:
            if not isinstance(row, dict):
                continue
            for k in keys:
                v = row.get(k)
                if isinstance(v, (int, float)):
                    best[k] = max(best.get(k, float("-inf")), float(v))
    return best


def _scanned_rtfx(searcher, fbank, cnn, transformer, cnn_params, tr_params,
                  cmvn, wavs, wav_lens, batch, seconds, n_iters):
    """RTFx with n_iters of (fbank→CMVN→CNN→encode→beam search) in ONE
    compiled program (lax.scan): a single dispatch + host transfer for
    the whole measurement, so the tunnel's per-call latency amortizes to
    <2%. A per-iteration input perturbation defeats loop-invariant
    hoisting (XLA lifts an invariant scan body out of the loop — the
    trap tools/exp_int8_cache.py documents)."""
    import jax
    import jax.numpy as jnp

    from stac_st_tpu.ops.cmvn import cmvn_apply

    prompt = jnp.asarray(searcher.decoder_input_tokens, jnp.int32)

    @jax.jit
    def scanned(cnn_p, tr_p, cmvn_state, wavs, wav_lens):
        def body(carry, i):
            w = wavs + i.astype(jnp.float32) * 1e-7
            feats = cmvn_apply(cmvn_state, fbank(w))
            src = cnn.apply(cnn_p, feats.astype(jnp.bfloat16))
            enc = transformer.apply(
                tr_p, src, wav_lens, method=transformer.encode
            )
            _tok, _len, scores, _set = searcher.search_arrays(
                enc, wav_lens, prompt=prompt
            )
            return carry + scores.sum(), None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(n_iters))
        return total

    np.asarray(scanned(cnn_params, tr_params, cmvn, wavs, wav_lens))
    t0 = time.perf_counter()
    np.asarray(scanned(cnn_params, tr_params, cmvn, wavs, wav_lens))
    elapsed = time.perf_counter() - t0
    return batch * seconds * n_iters / elapsed


def _trained_phase(fbank, cnn, transformer, seq_lin, cnn_params, tr_params,
                   seq_params, wavs, wav_lens, to_bf16, searcher, encode,
                   cmvn, batch, seconds, vocab, steps=200):
    """Train briefly on-chip (synthetic supervised targets ending in eos),
    then re-measure RTFx with the serving decode cap. Returns extra JSON
    fields."""
    import jax
    import jax.numpy as jnp
    import optax

    from stac_st_tpu.ops.losses import nll_loss

    rng = np.random.default_rng(7)
    U = 14
    # fixed short target patterns (per-utterance), eos-terminated
    tgt = jnp.asarray(rng.integers(5, vocab, (batch, U)), jnp.int32)
    eos_col = jnp.full((batch, 1), 2, jnp.int32)
    prompt = jnp.asarray([[1, 3, 4]] * batch, jnp.int32)
    # teacher forcing: input [bos, src, tgt, y1..yU] ↔ target
    # [src, tgt, y1..yU, eos] — equal lengths, eos included
    tokens_bos = jnp.concatenate([prompt, tgt], axis=1)
    tokens_eos = jnp.concatenate([prompt[:, 1:], tgt, eos_col], axis=1)

    params = {"cnn": cnn_params, "tr": tr_params, "seq": seq_params}
    tx = optax.adamw(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, wavs, wav_lens):
        def loss_fn(p):
            feats = fbank(wavs)
            src = cnn.apply(p["cnn"], feats)
            _enc, dec = transformer.apply(
                p["tr"], src, tokens_bos, wav_lens
            )
            logits = seq_lin.apply(p["seq"], dec)
            logp = jax.nn.log_softmax(logits, axis=-1)
            lens = jnp.ones((batch,), jnp.float32)
            return nll_loss(logp, tokens_eos, lens, label_smoothing=0.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(steps):
        params, opt_state, loss = train_step(
            params, opt_state, wavs, wav_lens
        )
    final_loss = float(loss)

    cnn_b = to_bf16(params["cnn"])
    tr_b = to_bf16(params["tr"])
    seq_b = to_bf16(params["seq"])
    searcher.max_decode_tokens = 192  # serving config cap
    searcher.bind(tr_b, seq_b)

    def run():
        enc_out = encode(cnn_b, tr_b, cmvn, wavs, wav_lens)
        hyps, _ = searcher(enc_out, wav_lens)
        return hyps

    hyps = run()  # warmup (cap changes max_steps -> one new compile)
    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        hyps = run()
    elapsed = time.perf_counter() - t0
    rtfx = batch * seconds * n_iters / elapsed
    lens = [len(h) for h in hyps]

    # trained decodes early-exit in tens of ms — through this tunnel the
    # dispatch-inclusive number is mostly the 28 ms/call round trip, so
    # the scanned device-throughput identity is the meaningful one here
    rtfx_device = _scanned_rtfx(
        searcher, fbank, cnn, transformer, cnn_b, tr_b, cmvn,
        wavs, wav_lens, batch, seconds,
        n_iters=20,  # short decodes: amortize the single dispatch harder
    )
    return {
        "trained_rtfx_cap192": round(rtfx, 2),
        "trained_rtfx_device_throughput": round(rtfx_device, 2),
        "trained_steps": steps,
        "trained_loss": round(final_loss, 3),
        "trained_hyp_len_mean": round(float(np.mean(lens)), 1),
    }


if __name__ == "__main__":
    main()
