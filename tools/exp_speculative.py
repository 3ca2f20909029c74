#!/usr/bin/env python3
"""Measure speculative (draft-verify) greedy decoding on the real chip.

Single-stream serving on the big presets is weight-stream-bound: every
decode step re-reads the whole decoder from HBM (docs/PERF.md round 3),
so step count — not step cost — is the remaining lever. Speculation cuts
target steps by the acceptance-weighted window size.

Protocol: build TARGET (default: the reference 'large' preset) and DRAFT
(default 'small') models, train BOTH briefly on-chip on the same
synthetic supervised task (bench.py phase-2 style — enough for eos to
bind and for the two models to approximately agree), then measure B=1
greedy decoding: a plain single-step greedy loop vs
``speculative_greedy_search`` at a sweep of window sizes k. Reports
tokens per target dispatch (the measured acceptance) alongside RTFx, so
the speedup can be re-derived for any other acceptance rate.

The acceptance here is an upper bound (both models memorize the same
tiny task); on real data it is a property of the draft's quality. The
MECHANISM's cost model is what this tool pins down.

Env: STAC_SPEC_TARGET=large|medium|small, STAC_SPEC_DRAFT=small,
STAC_SPEC_INT8=1 (weight-only int8 on the target decode path — the
recommended large-preset single-stream config), STAC_SPEC_KS=3,4,6,8.
Usage: python -u tools/exp_speculative.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

PRESETS = {  # reference scale grid (ablations/run_m_and_l_size.sh:72-99)
    "small": dict(d=256, h=4, enc=12, dec=6, ffn=1024),
    "medium": dict(d=512, h=8, enc=16, dec=6, ffn=2048),
    "large": dict(d=1024, h=16, enc=14, dec=6, ffn=4096),
}
VOCAB = 5000
SECONDS = 10.0
SR = 16000
TRAIN_B = 8
# synthetic target length (tokens before eos). Default 60 ≈ a multi-turn
# conversational segment; the decode phase then carries the utterance
# (at U≈14, encode dominates B=1 latency and speculation has little to
# amortize). STAC_SPEC_U overrides.
U = int(os.environ.get("STAC_SPEC_U", "60"))


def _build(preset: str, key, dec_layers: int = None):
    import jax
    import jax.numpy as jnp

    from stac_st_tpu.models import (
        ConvolutionFrontEnd,
        LinearHead,
        TransformerMultiTask,
    )
    from stac_st_tpu.ops import Fbank

    p = PRESETS[preset]
    cnn = ConvolutionFrontEnd(out_channels=(256, 256))
    tr = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=5120, d_model=p["d"], nhead=p["h"],
        num_encoder_layers=p["enc"],
        num_decoder_layers=dec_layers or p["dec"],
        d_ffn=p["ffn"], dropout=0.1, normalize_before=True, causal=False,
    )
    head = LinearHead(input_size=p["d"], n_neurons=VOCAB)
    fbank = Fbank()
    wavs = jnp.zeros((TRAIN_B, int(SECONDS * SR)), jnp.float32)
    feats = fbank(wavs)
    cnn_p = cnn.init(key, feats)
    src = cnn.apply(cnn_p, feats)
    tr_p = tr.init(key, src, jnp.ones((TRAIN_B, 8), jnp.int32))
    enc = tr.apply(tr_p, src[:1], method=tr.encode)
    head_p = head.init(key, enc)
    return dict(cnn=cnn, tr=tr, head=head, fbank=fbank,
                params={"cnn": cnn_p, "tr": tr_p, "seq": head_p})


def _train(m, wavs, tokens_bos, tokens_eos, steps=200, chunk=50):
    """Scan-chunked training: one dispatch per ``chunk`` steps (the
    per-call tunnel round trip would otherwise dominate — bench.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    from stac_st_tpu.ops.losses import nll_loss

    tx = optax.adamw(3e-4)
    params = m["params"]
    opt_state = tx.init(params)
    B = wavs.shape[0]

    @jax.jit
    def multi_step(params, opt_state, wavs):
        def loss_fn(p):
            feats = m["fbank"](wavs)
            src = m["cnn"].apply(p["cnn"], feats)
            _enc, dec = m["tr"].apply(p["tr"], src, tokens_bos)
            logp = jax.nn.log_softmax(
                m["head"].apply(p["seq"], dec), axis=-1)
            return nll_loss(logp, tokens_eos, jnp.ones((B,), jnp.float32),
                            label_smoothing=0.0)

        def body(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=chunk)
        return params, opt_state, losses[-1]

    loss = None
    for _ in range(steps // chunk):
        params, opt_state, loss = multi_step(params, opt_state, wavs)
    m["params"] = params
    return float(loss)


def _serving_params(m, int8: bool):
    """bf16 (+ optional decode-path int8) serving params for a model."""
    import jax
    import jax.numpy as jnp

    def to_bf16(t):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    tr_p = to_bf16(m["params"]["tr"])
    seq_p = to_bf16(m["params"]["seq"])
    cnn_p = to_bf16(m["params"]["cnn"])
    if int8:
        from stac_st_tpu.utils.quantize import quantize_decode_weights

        tr_p, seq_p = quantize_decode_weights(tr_p, seq_p)
    return {"tr": tr_p, "seq": seq_p, "cnn": cnn_p}


def _encode_fn(m):
    import jax.numpy as jnp

    fbank, cnn, tr = m["fbank"], m["cnn"], m["tr"]

    def encode(p, wavs):
        src = cnn.apply(p["cnn"], fbank(wavs).astype(jnp.bfloat16))
        return tr.apply(p["tr"], src, method=tr.encode)

    return encode


def main():
    import jax
    import jax.numpy as jnp

    from stac_st_tpu.decoding.speculative import speculative_greedy_search

    cache_dir = os.environ.get("STAC_SPEC_CACHE")
    if cache_dir:  # persistent compile cache: re-runs skip the compiles
        from stac_st_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache(cache_dir)

    target_name = os.environ.get("STAC_SPEC_TARGET", "large")
    draft_name = os.environ.get("STAC_SPEC_DRAFT", "small")
    int8 = os.environ.get("STAC_SPEC_INT8", "1") == "1"
    ks = [int(x) for x in
          os.environ.get("STAC_SPEC_KS", "3,4,6,8").split(",")]
    print(f"# target={target_name} draft={draft_name} weights_int8={int8} "
          f"U={U} draft_dec={os.environ.get('STAC_SPEC_DRAFT_DEC', '-')}",
          flush=True)

    rng = np.random.default_rng(7)
    wavs = jnp.asarray(
        rng.standard_normal((TRAIN_B, int(SECONDS * SR))).astype(np.float32))
    tgt = jnp.asarray(rng.integers(5, VOCAB, (TRAIN_B, U)), jnp.int32)
    prompt_rows = jnp.asarray([[1, 3, 4]] * TRAIN_B, jnp.int32)
    tokens_bos = jnp.concatenate([prompt_rows, tgt], axis=1)
    tokens_eos = jnp.concatenate(
        [prompt_rows[:, 1:], tgt, jnp.full((TRAIN_B, 1), 2, jnp.int32)],
        axis=1)

    key = jax.random.PRNGKey(0)
    # a SHALLOW draft decoder: the draft's cost floor is the decode
    # step's fixed per-op overhead (~46 µs at 6 layers), so fewer draft
    # decoder layers move the speculative ceiling directly
    draft_dec = int(os.environ.get("STAC_SPEC_DRAFT_DEC", "0")) or None
    target = _build(target_name, key)
    draft = _build(draft_name, jax.random.PRNGKey(1), dec_layers=draft_dec)
    t0 = time.perf_counter()
    lt = _train(target, wavs, tokens_bos, tokens_eos)
    ld = _train(draft, wavs, tokens_bos, tokens_eos)
    print(f"# trained: target loss {lt:.3f}, draft loss {ld:.3f} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    from stac_st_tpu.decoding.speculative import bind_spec_model

    t_params = _serving_params(target, int8)
    d_params = _serving_params(draft, False)
    t_encode, d_encode = _encode_fn(target), _encode_fn(draft)
    t_def, t_head = target["tr"], target["head"]
    d_def, d_head = draft["tr"], draft["head"]

    wav1 = wavs[:1]
    prompt = jnp.asarray([1, 3, 4], jnp.int32)
    MAX_STEPS = 192  # serving cap (STEngine default)

    # ---- baseline: plain single-step greedy loop on the target ----------
    # params are jit ARGUMENTS (binding inside the trace): closed-over
    # arrays would be baked into the HLO as constants — the large preset's
    # whole param tree in the program body (the remote compiler rejects
    # the oversized request; same rule as the searcher's params-at-call
    # design).
    @jax.jit
    def greedy_baseline(tp, wav):
        t_bound = bind_spec_model(t_def, t_head, tp["tr"], tp["seq"])
        enc = t_encode(tp, wav)
        P = 3
        cache = t_bound.init_cache(enc, P + MAX_STEPS, None)
        _, cache = t_bound.window(prompt[None, :-1], jnp.zeros((), jnp.int32),
                                  cache)

        def cond(c):
            _, n, _, _, done = c
            return jnp.logical_not(done)

        def body(c):
            buf, n, last, cache, _ = c
            logits, cache = t_bound.step(last[None], P - 1 + n, cache)
            nxt = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
            buf = buf.at[n].set(nxt)
            n = n + 1
            done = jnp.logical_or(nxt == 2, n >= MAX_STEPS)
            return buf, n, nxt, cache, done

        buf = jnp.zeros((MAX_STEPS,), jnp.int32)
        carry = (buf, jnp.zeros((), jnp.int32), prompt[-1], cache,
                 jnp.zeros((), bool))
        buf, n, _, _, _ = jax.lax.while_loop(cond, body, carry)
        return buf, n

    toks_base, n_base = jax.block_until_ready(greedy_baseline(t_params, wav1))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(greedy_baseline(t_params, wav1))
    base_s = (time.perf_counter() - t0) / iters

    # scanned (single-dispatch) identity: the tunnel charges ~28 ms per
    # call — at these 10–40 ms program sizes that DROWNS the comparison
    # (docs/PERF.md methodology); n iterations inside one lax.scan with
    # input perturbation give the device-time identity.
    def _scanned_seconds(fn, *args, n=10):
        @jax.jit
        def scanned(*args):
            def body(c, i):
                w = args[-1] + i.astype(jnp.float32) * 1e-7
                out = fn(*args[:-1], w)
                return c + out, None

            tot, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.int32), jnp.arange(n))
            return tot

        jax.block_until_ready(scanned(*args))
        t0 = time.perf_counter()
        jax.block_until_ready(scanned(*args))
        return (time.perf_counter() - t0) / n

    base_dev_s = _scanned_seconds(
        lambda tp, w: greedy_baseline(tp, w)[1], t_params, wav1)
    print(f"baseline greedy: {int(n_base)} tokens, {base_s * 1e3:.1f} ms "
          f"({base_dev_s * 1e3:.1f} ms device) -> RTFx "
          f"{SECONDS / base_s:.1f} ({SECONDS / base_dev_s:.1f} device)",
          flush=True)

    # ---- speculative sweep ----------------------------------------------
    for k in ks:
        @jax.jit
        def spec(tp, dp, wav, k=k):
            t_bound = bind_spec_model(t_def, t_head, tp["tr"], tp["seq"])
            d_bound = bind_spec_model(d_def, d_head, dp["tr"], dp["seq"])
            enc_t = t_encode(tp, wav)
            enc_d = d_encode(dp, wav)
            return speculative_greedy_search(
                t_bound, d_bound, enc_t, enc_d, prompt, MAX_STEPS, k,
                eos_index=2)

        res = jax.block_until_ready(spec(t_params, d_params, wav1))
        same = bool(
            int(res.length) == int(n_base)
            and np.array_equal(
                np.asarray(res.tokens[: int(res.length)]),
                np.asarray(toks_base[: int(n_base)]))
        )
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(spec(t_params, d_params, wav1))
        el = (time.perf_counter() - t0) / iters
        dev_s = _scanned_seconds(
            lambda tp, dp, w: spec(tp, dp, w).length,
            t_params, d_params, wav1)
        tps = int(res.length) / max(int(res.target_steps), 1)
        print(f"k={k}: {el * 1e3:.1f} ms ({dev_s * 1e3:.1f} ms device) -> "
              f"RTFx {SECONDS / el:.1f} ({SECONDS / dev_s:.1f} device, "
              f"{base_dev_s / dev_s:.2f}x vs baseline device), "
              f"{int(res.length)} tokens / {int(res.target_steps)} target "
              f"dispatches = {tps:.2f} tok/dispatch, exact={same}",
              flush=True)


if __name__ == "__main__":
    main()
