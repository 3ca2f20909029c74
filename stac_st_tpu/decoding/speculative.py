"""Speculative (draft–verify) greedy decoding — exact target decode, fewer steps.

A cheaper draft model proposes ``k`` tokens autoregressively; the target
model verifies the whole window with ONE KV-cached windowed decode step
(``TransformerMultiTask.decode_window``); the longest agreeing prefix is
accepted, plus the target's own token at the first disagreement. The
output is exactly the target model's greedy decode (token-for-token,
by construction — every emitted token is a target argmax given the same
prefix), independent of draft quality; the draft only changes SPEED
(accepted tokens per target dispatch).

Why this wins on TPU (docs/PERF.md cost model): a decode step costs
~46 µs fixed + ~6.5 µs/row; at single-stream shapes the fixed part is
~40% and the per-token weight stream (re-read every step; 201 MB/step
bf16 on the large preset) is the rest. Verifying k tokens in one windowed
step amortizes BOTH over k accepted tokens — the weight bytes are read
once per window instead of once per token. The operating point where
this matters is exactly large-preset low-concurrency serving
(reference presets: ``ablations/run_m_and_l_size.sh:72-99``); at high
concurrency the step is row-bound and speculation stops paying.

The reference has no serving/speculative story (its inference is the
batch recipe ``stac-st/inference.py``) — this is a beyond-reference
serving feature, opt-in at the engine level.

Single-utterance (B=1) by design: divergent per-row accept counts would
need per-row cache write indices, which the scalar-position decode cache
deliberately avoids (static shapes, one PE slice per step).
"""

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class SpecBound(NamedTuple):
    """A model bound for speculative decoding (all fns jit-traceable)."""

    init_cache: Callable  # (enc_out, max_len, enc_bias) -> cache
    step: Callable        # (tokens (B,), position, cache) -> ((B,V), cache)
    window: Callable      # (tokens (B,w), position, cache) -> ((B,w,V), ·)
    set_index: Callable   # (cache, index) -> cache


def bind_spec_model(model_def, seq_def, transformer_params, seq_lin_params,
                    kv_cache_dtype: Optional[str] = None) -> SpecBound:
    """Bind a (TransformerMultiTask, LinearHead) pair for speculation.

    Accepts weight-only int8 params (utils/quantize.py) and the int8 KV
    cache — both compose with the windowed verify step.
    """

    def init_cache(enc_out, max_len, enc_bias=None):
        return model_def.apply(
            transformer_params, enc_out, max_len, enc_bias, 1, False,
            kv_cache_dtype, method=model_def.init_decode_cache,
        )

    def step(tokens, position, cache):
        hidden, cache = model_def.apply(
            transformer_params, tokens, position, cache,
            method=model_def.decode_step,
        )
        return seq_def.apply(seq_lin_params, hidden), cache

    def window(tokens, position, cache):
        hidden, cache = model_def.apply(
            transformer_params, tokens, position, cache,
            method=model_def.decode_window,
        )
        return seq_def.apply(seq_lin_params, hidden), cache

    return SpecBound(init_cache, step, window, model_def.set_cache_index)


class SpecResult(NamedTuple):
    tokens: Any        # (max_steps,) int32 — generated tokens (prompt excl.)
    length: Any        # () int32 — generated count, eos included if emitted
    target_steps: Any  # () int32 — target dispatches (windows + prefill)
    drafted: Any       # () int32 — draft tokens proposed


def speculative_greedy_search(
    target: SpecBound,
    draft: SpecBound,
    enc_target,
    enc_draft,
    prompt,
    max_steps: int,
    k: int = 4,
    eos_index: int = 2,
    enc_bias_target=None,
    enc_bias_draft=None,
) -> SpecResult:
    """Greedy-decode ``target`` exactly, ``k`` draft tokens per verify step.

    enc_target/enc_draft: (1, S, d) encoder outputs from each model's OWN
    encoder (the two models share nothing but the tokenizer). prompt:
    (P,) int32 ``[bos, src_lang, tgt_lang]`` (reference prompt semantics,
    ``mutitask_decoder.py:85-103``). Returns generated tokens only (the
    prompt is not echoed), cut at the first eos (inclusive).
    """
    assert k >= 1 and max_steps >= 1
    prompt = jnp.asarray(prompt, jnp.int32).reshape(-1)
    P = prompt.shape[0]
    budget = P + max_steps + k  # window may overshoot by < k rows
    t_cache = target.init_cache(enc_target, budget, enc_bias_target)
    d_cache = draft.init_cache(enc_draft, budget, enc_bias_draft)

    # ---- prefill: feed prompt[:-1]; ``last`` stays unfed ----------------
    prefill_steps = jnp.zeros((), jnp.int32)
    if P > 1:
        pre = prompt[:-1][None, :]  # (1, P-1)
        _, t_cache = target.window(pre, jnp.zeros((), jnp.int32), t_cache)
        _, d_cache = draft.window(pre, jnp.zeros((), jnp.int32), d_cache)
        prefill_steps = jnp.ones((), jnp.int32)
    last = prompt[-1]

    buf = jnp.zeros((max_steps + k,), jnp.int32)

    def draft_k(last_tok, idx, cache):
        """k greedy draft steps; returns proposed tokens (k,) and cache."""

        def body(carry, _):
            tok, pos, cache = carry
            logits, cache = draft.step(tok[None], pos, cache)
            nxt = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
            return (nxt, pos + 1, cache), nxt

        (_, _, cache), toks = jax.lax.scan(
            body, (last_tok, idx, cache), None, length=k
        )
        return toks, cache

    def cond(carry):
        _, n_gen, _, _, _, done, _ = carry
        return jnp.logical_not(done)

    def body(carry):
        buf, n_gen, last, t_cache, d_cache, _done, iters = carry
        idx = P - 1 + n_gen  # cache write index == tokens consumed

        d_toks, d_cache = draft_k(last, idx, d_cache)  # (k,)

        # verify window: [last, d_0..d_{k-2}] -> target preds for all k
        win = jnp.concatenate([last[None], d_toks[:-1]])[None, :]  # (1, k)
        logits_w, t_cache = target.window(win, idx, t_cache)  # (1, k, V)
        preds = jnp.argmax(logits_w[0], axis=-1).astype(jnp.int32)  # (k,)

        # j = first disagreement; accepted-and-corrected run = preds[:m]
        agree = preds == d_toks
        j = jnp.argmin(agree)  # first False; 0 if all True — fix below
        j = jnp.where(jnp.all(agree), k, j)
        m = jnp.minimum(j + 1, k)
        # eos inside the run cuts it (inclusive)
        is_eos = preds == eos_index
        any_eos_in_run = jnp.any(is_eos & (jnp.arange(k) < m))
        eos_pos = jnp.argmax(is_eos & (jnp.arange(k) < m))
        m = jnp.where(any_eos_in_run, eos_pos + 1, m)
        # generation budget
        m = jnp.minimum(m, max_steps - n_gen)

        buf = jax.lax.dynamic_update_slice(buf, preds, (n_gen,))
        n_gen = n_gen + m
        new_idx = idx + m
        t_cache = target.set_index(t_cache, new_idx)
        d_cache = draft.set_index(d_cache, new_idx)
        last = preds[jnp.maximum(m - 1, 0)]
        done = jnp.logical_or(any_eos_in_run, n_gen >= max_steps)
        return buf, n_gen, last, t_cache, d_cache, done, iters + 1

    n0 = jnp.zeros((), jnp.int32)
    carry = (buf, n0, last, t_cache, d_cache, jnp.zeros((), bool), n0)
    buf, n_gen, _, _, _, _, iters = jax.lax.while_loop(cond, body, carry)
    return SpecResult(
        tokens=buf[:max_steps],
        length=n_gen,
        target_steps=iters + prefill_steps,
        drafted=iters * k,
    )
