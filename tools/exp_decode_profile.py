#!/usr/bin/env python3
"""Itemize the decode step's device time at SINGLE-STREAM shapes.

The decode cost model (docs/PERF.md round 3) is ~46 µs fixed + ~6.5
µs/row per step; at single-stream serving (B=1, beam 10 = 10 rows) the
fixed part is ~40% of the step. NEXT.md's remaining lever — scanning the
6 decoder layers over stacked params — only pays if that fixed cost is
inter-op overhead (pipeline gaps between many tiny ops) rather than
mandatory work. This tool captures a device trace of the REAL compiled
search at 10 rows and reports (a) per-op aggregate durations and (b) the
device track's busy-vs-span gap fraction, so the lever is decided by
measurement instead of by guess.

Usage: python -u tools/exp_decode_profile.py   (real TPU)
Env: STAC_DP_BATCH (default 1), STAC_DP_BEAM (10), STAC_DP_SECONDS (10).
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def _build(batch, seconds, beam):
    import jax
    import jax.numpy as jnp

    from stac_st_tpu.decoding.beam_search import MultiTaskBeamSearch
    from stac_st_tpu.models import (
        ConvolutionFrontEnd,
        LinearHead,
        TransformerMultiTask,
    )
    from stac_st_tpu.ops import Fbank

    D_MODEL, NHEAD, ENC_L, DEC_L, FFN, VOCAB = 256, 4, 12, 6, 1024, 5000
    SR = 16000
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
        rng.standard_normal((batch, int(seconds * SR))).astype(np.float32))
    wav_lens = jnp.ones((batch,), jnp.float32)

    key = jax.random.PRNGKey(0)
    feats = fbank(wavs)
    cnn_params = cnn.init(key, feats)
    src = cnn.apply(cnn_params, feats)
    tr_params = transformer.init(
        key, src, jnp.ones((batch, 8), jnp.int32), wav_lens)
    enc = transformer.apply(
        tr_params, src, wav_lens, method=transformer.encode)
    seq_params = seq_lin.init(key, enc)

    def to_bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    tr_params, seq_params = to_bf16(tr_params), to_bf16(seq_params)
    searcher = MultiTaskBeamSearch(
        [transformer, seq_lin, None],
        bos_index=1, eos_index=2, blank_index=0,
        min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=beam,
        using_eos_threshold=True, length_normalization=True,
        temperature=1.15,
        **({} if os.environ.get("STAC_KV_INT8") == "0"
           else {"kv_cache_dtype": "int8"}),
    )
    searcher.bind(tr_params, seq_params)
    searcher.set_decoder_prefix_tokens(3, 4)
    enc = transformer.apply(
        tr_params, src.astype(jnp.bfloat16), wav_lens,
        method=transformer.encode)
    return searcher, enc, wav_lens


def main():
    import jax
    import jax.numpy as jnp

    batch = int(os.environ.get("STAC_DP_BATCH", "1"))
    seconds = float(os.environ.get("STAC_DP_SECONDS", "10"))
    beam = int(os.environ.get("STAC_DP_BEAM", "10"))
    n_iters = 3

    searcher, enc, wav_lens = _build(batch, seconds, beam)
    prompt = jnp.asarray(searcher.decoder_input_tokens, jnp.int32)

    @jax.jit
    def scanned(enc, wav_lens):
        def body(carry, i):
            e = enc + i.astype(enc.dtype) * 1e-7
            _tok, _len, scores, _ = searcher.search_arrays(
                e, wav_lens, prompt=prompt)
            return carry + scores.sum(), None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(n_iters))
        return total

    np.asarray(scanned(enc, wav_lens))  # compile
    import time
    t0 = time.perf_counter()
    np.asarray(scanned(enc, wav_lens))
    wall = time.perf_counter() - t0
    n_steps = int(enc.shape[1] * searcher.config.max_decode_ratio)
    print(f"# rows={batch * beam} steps~{n_steps} x{n_iters} iters: "
          f"wall {wall * 1e3:.1f} ms "
          f"(~{wall * 1e6 / (n_steps * n_iters):.1f} us/step)")

    out_dir = os.environ.get("STAC_PROFILE_DIR", "/tmp/decode_trace")
    with jax.profiler.trace(out_dir):
        np.asarray(scanned(enc, wav_lens))

    path = sorted(glob.glob(
        os.path.join(out_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    evs = data.get("traceEvents", [])
    pids_meta = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids_meta[e["pid"]] = e.get("args", {}).get("name", "")
    # keep only device-track complete events
    dev = [e for e in evs
           if e.get("ph") == "X" and "dur" in e
           and ("TPU" in pids_meta.get(e.get("pid"), "")
                or "device" in pids_meta.get(e.get("pid"), "").lower())]
    if not dev:
        dev = [e for e in evs if e.get("ph") == "X" and "dur" in e]
    # XLA emits NESTED events (jit_* ⊃ while ⊃ fusions); aggregate LEAF
    # self-time per op name via a per-lane stack sweep, plus per-lane gap
    # time (span minus leaf-busy) — the quantity that decides whether the
    # step is op-bound (busy) or scheduling-bound (gaps).
    lanes = {}
    for e in dev:
        lanes.setdefault((e["pid"], e.get("tid")), []).append(e)
    leaf_agg = {}
    leaf_events = 0
    for lane, les in lanes.items():
        les.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # (end_ts, name, child_time_accum)
        ivs = []

        def pop_upto(upto):
            nonlocal leaf_events
            while stack and stack[-1][0] <= upto:
                end, name, dur, child = stack.pop()
                if child == 0.0:  # no nested events: a leaf op
                    leaf_agg[name] = leaf_agg.get(name, 0.0) + dur
                    leaf_events += 1
                    ivs.append((end - dur, end))
                if stack:
                    stack[-1][3] += dur
        for e in les:
            ts, dur = e["ts"], e["dur"]
            pop_upto(ts)
            stack.append([ts + dur, e.get("name", "?"), dur, 0.0])
        pop_upto(float("inf"))
        if ivs:
            ivs.sort()
            span = ivs[-1][1] - ivs[0][0]
            busy, cs, ce = 0.0, ivs[0][0], ivs[0][1]
            for s, e2 in ivs[1:]:
                if s > ce:
                    busy += ce - cs
                    cs, ce = s, e2
                else:
                    ce = max(ce, e2)
            busy += ce - cs
            print(f"# lane pid={lane[0]} tid={lane[1]}: span "
                  f"{span/1e3:.2f} ms, leaf-busy {busy/1e3:.2f} ms, gaps "
                  f"{(span-busy)/1e3:.2f} ms "
                  f"({100*(span-busy)/max(span,1e-9):.1f}%)")
    total = sum(leaf_agg.values())
    steps_total = n_steps * n_iters
    print(f"# leaf total {total/1e3:.2f} ms over {leaf_events} leaf events "
          f"(~{leaf_events/max(steps_total,1):.0f} leaves/step, mean "
          f"{total/max(leaf_events,1):.2f} us/leaf)")
    for name, us in sorted(leaf_agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{us/1e3:9.3f} ms  {100*us/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
