"""Prompted batched beam search with KV cache (the inference hot loop).

TPU-native replacement for the reference's
``S2SMultiTaskTransformerBeamSearch`` (``stac-st/modules/mutitask_decoder.py``
+ SpeechBrain ``S2SBeamSearcher``): the decoder is seeded with the prompt
``[bos, source_lang, target_lang]`` (Whisper-style task selection —
``mutitask_decoder.py:85-103``), then beams are expanded to a *static*
``max_decode_ratio × enc_frames`` step budget.

Where the reference re-decodes the full prefix every step with no KV cache
(``mutitask_decoder.py:119-128`` → ``TransformerMultiTask.decode`` — O(L²)
per hypothesis), this implementation:

* keeps a functional KV cache (one append + per-step gather reorder of the
  self-attention cache only; the beam-invariant cross K/V is never moved);
* runs batch×beam flattened so every matmul stays MXU-shaped;
* compiles once per (batch, enc_len, steps) bucket via ``lax.scan`` —
  no data-dependent shapes; the language prompt is runtime data, so
  switching ASR↔ST does NOT recompile (the reference re-initializes the
  searcher per batch — ``train_multitask.py:98-136``).

Semantics preserved from the reference configuration (yaml:228-251):
temperature on logits before log-softmax, optional eos-threshold gating
(eos allowed only when its log-prob ≥ 1.5 × the best token's), optional
length normalization (selection on score/length, final score normalized),
min/max decode ratios relative to encoder frames, and hypotheses returned
*without* prompt or eos — exactly what the recipes feed to the tokenizer
(``dataio_and_utils.py:366-419``). Like the reference's shipped decode path,
cross-attention does not mask encoder padding by default
(``mutitask_decoder.py:126`` passes no ``enc_len``); enable
``mask_encoder_padding`` for strict-masked decoding on wide buckets.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BeamSearchConfig", "beam_search", "MultiTaskBeamSearch",
           "greedy_search"]

NEG_INF = -1.0e9


class BeamSearchConfig(NamedTuple):
    beam_size: int = 5
    bos_index: int = 1
    eos_index: int = 2
    blank_index: int = 0
    min_decode_ratio: float = 0.0
    max_decode_ratio: float = 1.0
    using_eos_threshold: bool = False
    eos_threshold: float = 1.5
    length_normalization: bool = False
    temperature: float = 1.0
    ctc_weight: float = 0.0     # joint CTC/attention (ctc_weight_decode)
    lm_weight: float = 0.0      # shallow LM fusion (yaml:249)
    temperature_lm: float = 1.0


def default_cache_gather(cache, flat_parent):
    """Reorder every (BB, ...) leaf of the cache by flat beam indices."""
    BB = flat_parent.shape[0]

    def gather(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == BB:
            return jnp.take(leaf, flat_parent, axis=0)
        return leaf

    return jax.tree_util.tree_map(gather, cache)


def _plan_segments(max_steps: int, first: Optional[int]):
    """Geometric step-budget segments: (first, 2·first, …, max_steps).

    Per-step HBM cache reads scale with the ALLOCATED budget, so decoding
    in growing segments makes the total cache read traffic ~triangular
    instead of rectangular — and trained models whose hyps early-exit
    inside the first segment never touch the larger allocations at all.
    Exact: later segments CONTINUE the same search state (unlike tiered
    decoding's rerun, no cross-budget certificate is needed)."""
    if not first or first >= max_steps:
        return (max_steps,)
    bounds, b = [], int(first)
    while b < max_steps:
        bounds.append(b)
        b *= 2
    bounds.append(max_steps)
    return tuple(bounds)


@functools.partial(
    jax.jit,
    static_argnames=(
        "decode_step_fn", "init_cache_fn", "cache_gather_fn", "max_steps",
        "config", "lm_step_fn", "lm_init_fn", "settled_bound_len",
        "grow_cache_fn", "cache_growth",
    ),
)
def beam_search(
    decode_step_fn: Callable,
    init_cache_fn: Callable,
    params: Any,
    enc_out: jax.Array,
    prompt: jax.Array,
    max_steps: int,
    config: BeamSearchConfig,
    cache_gather_fn: Callable = default_cache_gather,
    enc_bias: Optional[jax.Array] = None,
    ctc_log_probs: Optional[jax.Array] = None,
    ctc_input_lengths: Optional[jax.Array] = None,
    lm_step_fn: Optional[Callable] = None,
    lm_init_fn: Optional[Callable] = None,
    settled_bound_len: Optional[int] = None,
    grow_cache_fn: Optional[Callable] = None,
    cache_growth: Optional[int] = None,
):
    """Run beam search.

    Args:
      decode_step_fn: (params, tokens (BB,), position (), cache) ->
        (raw logits (BB, V), new cache). Params are threaded explicitly so
        the jit cache stays valid as training updates them (no
        closure-captured constants).
      init_cache_fn: (params, enc_out_tiled (BB, S, d), max_len) -> cache.
      params: dynamic parameter pytree passed to both fns.
      enc_out: (B, S, d) encoder output.
      prompt: (3,) int32 [bos, src_lang, tgt_lang] (any length ≥ 1), or
        (B, L) int32 per-utterance prompts (the fused multi-prompt
        decode tiles enc_out and varies the prompt per tile).
      max_steps: static decode-step budget.
      config: BeamSearchConfig (static).
      cache_gather_fn: (cache, flat_parent (BB,)) -> reordered cache.
      lm_step_fn: optional shallow-fusion LM (SB lm_forward_step,
        ``mutitask_decoder.py:130-137``): (params, tokens (BB,), position,
        lm_state) -> (logits (BB, V), lm_state). The LM consumes
        [bos, y₁, y₂, …] — the bos token only, not the language prompt,
        matching the reference searcher. Its log-softmax (over
        temperature_lm) is added with weight config.lm_weight AFTER the
        eos-threshold gate, as in SB's main loop.
      lm_init_fn: (params, batch_beam) -> initial lm_state (leaves leading
        with BB are gathered on beam reorder).
      settled_bound_len: optional length (≥ max_steps) to use as the
        length-normalization denominator in the early-exit bound. With the
        default (max_steps) the bound certifies the result for THIS budget;
        with a larger value it certifies the result would be identical
        under a budget of ``settled_bound_len`` steps — the basis for
        tiered decoding (run a small budget first, rerun the full budget
        only for batches whose ``settled`` flag is False).

    Returns:
      tokens (B, max_steps) best hypothesis (post-prompt, no eos),
      lengths (B,), scores (B,),
      settled (B,) bool — True where no alive beam could still beat the
      best finished hypothesis under the (bound) budget, i.e. the row's
      result is final regardless of additional decode steps.
    """
    B, S, _ = enc_out.shape
    beam = config.beam_size
    BB = B * beam

    # cross-attention K/V is beam-invariant: the cache keeps it per
    # utterance (B rows) and the decoder groups beams as query length;
    # only the self-attention caches live at B·beam rows.
    prompt_len = prompt.shape[-1]
    # segmented cache growth: allocate the first (smallest) budget now;
    # later segments grow the cache and CONTINUE the same search (exact)
    segments = _plan_segments(
        max_steps, cache_growth if grow_cache_fn is not None else None
    )
    cache = init_cache_fn(
        params, enc_out, prompt_len + segments[0], enc_bias, beam
    )

    # --- warmup: feed the prompt through the cache ---
    # prompt may be (L,) — one prompt for every row — or (B, L) per-row
    # prompts (beam copies of an utterance share its prompt): the basis
    # for the fused multi-prompt (ASR+ST) decode, where the same encoder
    # output is tiled and each tile gets a different language prompt.
    logits = None
    for p in range(prompt_len):
        if prompt.ndim == 2:
            tok = jnp.repeat(prompt[:, p], beam, axis=0)
        else:
            tok = jnp.full((BB,), prompt[p], jnp.int32)
        logits, cache = decode_step_fn(
            params, tok, jnp.asarray(p, jnp.int32), cache
        )

    min_steps = int(config.min_decode_ratio * S)

    use_ctc = config.ctc_weight > 0.0 and ctc_log_probs is not None
    if use_ctc:
        from .ctc_prefix import (
            ctc_prefix_init,
            ctc_prefix_score_all,
            ctc_prefix_select,
        )

        ctc_lp = jnp.repeat(
            ctc_log_probs.astype(jnp.float32), beam, axis=0
        )  # (BB, T_ctc, V)
        ctc_lens = jnp.repeat(
            (ctc_input_lengths if ctc_input_lengths is not None
             else jnp.full((B,), ctc_log_probs.shape[1])).astype(jnp.int32),
            beam, axis=0,
        )
        ctc_state = ctc_prefix_init(ctc_lp, blank=config.blank_index)
    else:
        ctc_state = None

    use_lm = lm_step_fn is not None and config.lm_weight > 0.0
    if use_lm:
        t_lm = config.temperature_lm if config.temperature_lm > 0 else 1.0
        lm_state = lm_init_fn(params, BB) if lm_init_fn is not None else None
        # the LM consumes bos only (not the language prompt) — SB feeds it
        # the inp_tokens stream, which starts at bos
        bos_tok = jnp.full((BB,), config.bos_index, jnp.int32)
        lm_logits, lm_state = lm_step_fn(
            params, bos_tok, jnp.asarray(0, jnp.int32), lm_state
        )
        lm_logp = jax.nn.log_softmax(
            lm_logits.astype(jnp.float32) / t_lm, axis=-1
        )
    else:
        lm_state, lm_logp = None, None

    alive_tokens = jnp.zeros((B, beam, max_steps), jnp.int32)
    alive_scores = jnp.tile(
        jnp.where(jnp.arange(beam) == 0, 0.0, NEG_INF)[None, :], (B, 1)
    ).astype(jnp.float32)
    fin_tokens = jnp.zeros((B, beam, max_steps), jnp.int32)
    fin_scores = jnp.full((B, beam), NEG_INF, jnp.float32)
    fin_lengths = jnp.zeros((B, beam), jnp.int32)

    def step(carry, t):
        (alive_tokens, alive_scores, fin_tokens, fin_scores, fin_lengths,
         ctc_state, cache, logits, lm_state, lm_logp) = carry
        t = jnp.asarray(t, jnp.int32)

        logp = jax.nn.log_softmax(
            logits.astype(jnp.float32) / config.temperature, axis=-1
        ).reshape(B, beam, -1)
        V = logp.shape[-1]

        # eos gating: threshold (eos only when close to the best token —
        # SB _check_eos_threshold) and the min-steps floor
        eos_col = logp[:, :, config.eos_index]
        if config.using_eos_threshold:
            eos_ok = eos_col > config.eos_threshold * jnp.max(logp, axis=-1)
            eos_col = jnp.where(eos_ok, eos_col, NEG_INF)
        eos_col = jnp.where(t >= min_steps, eos_col, NEG_INF)
        logp = logp.at[:, :, config.eos_index].set(eos_col)

        if use_lm:
            # shallow fusion AFTER the eos gate (SB main-loop order)
            logp = logp + config.lm_weight * lm_logp.reshape(B, beam, -1)
            eos_col = logp[:, :, config.eos_index]

        new_ctc_state = ctc_state
        if use_ctc:
            # partial joint scoring (SB ctc_score_mode='partial'): blend the
            # CTC prefix score into the top-K attention candidates per beam,
            # forcing eos into the candidate set so finalization stays live.
            K = beam + 1
            att_vals, att_ids = jax.lax.top_k(logp, K - 1)  # (B, beam, K-1)
            cand_ids = jnp.concatenate(
                [att_ids, jnp.full((B, beam, 1), config.eos_index)], axis=2
            ).reshape(B * beam, K)
            att_full = jnp.concatenate(
                [att_vals, eos_col[:, :, None]], axis=2
            )  # (B, beam, K)
            ctc_scores, cand_state, cand_ids_arr = ctc_prefix_score_all(
                ctc_state, ctc_lp, ctc_lens, blank=config.blank_index,
                eos=config.eos_index, candidates=cand_ids,
            )
            blended = (
                (1.0 - config.ctc_weight) * att_full
                + config.ctc_weight * ctc_scores.reshape(B, beam, K)
            )
            cum = alive_scores[:, :, None] + blended  # (B, beam, K)
            sel = cum / (t + 1.0) if config.length_normalization else cum
            sel_vals, flat_idx = jax.lax.top_k(sel.reshape(B, beam * K), beam)
            parent = flat_idx // K
            k_sel = flat_idx % K
            flat_parent0 = (
                jnp.arange(B)[:, None] * beam + parent
            ).reshape(-1)
            new_tok = jnp.take_along_axis(
                cand_ids.reshape(B, beam * K), flat_idx, axis=1
            ).astype(jnp.int32)
            new_cum = jnp.take_along_axis(
                cum.reshape(B, beam * K), flat_idx, axis=1
            )
            # commit CTC state: gather candidate rows by parent, pick k
            from jax import tree_util as _tu

            gathered = _tu.tree_map(
                lambda a: jnp.take(a, flat_parent0, axis=0), cand_state
            )
            cand_ids_g = jnp.take(cand_ids, flat_parent0, axis=0)
            new_ctc_state = ctc_prefix_select(
                gathered, cand_ids_g, k_sel.reshape(B * beam)
            )
        else:
            cum = alive_scores[:, :, None] + logp  # (B, beam, V)

            # ---- ONE top-k over beam*V including eos (SB semantics: a
            # hypothesis finishes only when eos itself wins a beam slot) ----
            sel = cum / (t + 1.0) if config.length_normalization else cum
            sel_vals, flat_idx = jax.lax.top_k(sel.reshape(B, beam * V), beam)
            parent = flat_idx // V
            new_tok = (flat_idx % V).astype(jnp.int32)
            new_cum = jnp.take_along_axis(
                cum.reshape(B, beam * V), flat_idx, axis=1
            )
        is_eos = new_tok == config.eos_index

        # parent-reordered prefixes (eos hyps exclude the eos token itself)
        parent_tokens = jnp.take_along_axis(
            alive_tokens, parent[:, :, None], axis=1
        )

        # ---- finished set: merge eos winners, keep top beam ----
        eos_sel_scores = jnp.where(is_eos, sel_vals, NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, eos_sel_scores], axis=1)
        all_fin_tokens = jnp.concatenate([fin_tokens, parent_tokens], axis=1)
        all_fin_lengths = jnp.concatenate(
            [fin_lengths, jnp.full((B, beam), t, jnp.int32)], axis=1
        )
        fin_scores, fin_idx = jax.lax.top_k(all_fin_scores, beam)
        fin_tokens = jnp.take_along_axis(
            all_fin_tokens, fin_idx[:, :, None], axis=1
        )
        fin_lengths = jnp.take_along_axis(all_fin_lengths, fin_idx, axis=1)

        # ---- alive beams: eos winners die (score -inf), rest continue ----
        # where-select on the step axis fuses into the parent gather's
        # output write (a dynamic_update there forced transposes + an
        # extra pass over the array)
        alive_tokens = jnp.where(
            jnp.arange(max_steps)[None, None, :] == t,
            new_tok[:, :, None], parent_tokens,
        )
        alive_scores = jnp.where(is_eos, NEG_INF, new_cum)

        flat_parent = (jnp.arange(B)[:, None] * beam + parent).reshape(-1)
        if isinstance(cache, dict) and cache.get("anc") is not None:
            # gather-free mode: the K/V caches stay where they were written;
            # only the (tiny) ancestor table is reordered, and the slot for
            # the position about to be written maps to its own row. The
            # Pallas kernel resolves ancestry at attention time
            # (models/transformer.py step_anc).
            anc = jnp.take_along_axis(
                cache["anc"], parent[:, :, None], axis=1
            )
            anc = jnp.where(
                jnp.arange(anc.shape[-1])[None, None, :] == (prompt_len + t),
                jnp.arange(beam, dtype=jnp.int32)[None, :, None], anc,
            )
            cache = {**cache, "anc": anc}
        else:
            cache = cache_gather_fn(cache, flat_parent)
        logits, cache = decode_step_fn(
            params, new_tok.reshape(BB), (prompt_len + t).astype(jnp.int32),
            cache,
        )
        new_lm_state, new_lm_logp = lm_state, lm_logp
        if use_lm:
            new_lm_state = default_cache_gather(lm_state, flat_parent)
            lm_logits, new_lm_state = lm_step_fn(
                params, new_tok.reshape(BB), (t + 1).astype(jnp.int32),
                new_lm_state,
            )
            new_lm_logp = jax.nn.log_softmax(
                lm_logits.astype(jnp.float32) / t_lm, axis=-1
            )
        return (
            t + 1, alive_tokens, alive_scores, fin_tokens, fin_scores,
            fin_lengths, new_ctc_state, cache, logits, new_lm_state,
            new_lm_logp,
        )

    # normalizer for the settle bound: max_steps certifies this budget;
    # settled_bound_len (≥ max_steps) certifies a larger one (tiering)
    norm_len = float(settled_bound_len or max_steps)
    assert norm_len >= max_steps, (settled_bound_len, max_steps)

    def _unsettled(alive_scores, fin_scores):
        bound = jnp.max(alive_scores, axis=1)
        if config.length_normalization:
            bound = bound / norm_len
        return bound > jnp.max(fin_scores, axis=1)

    def make_cond(bound: int):
        def cond(carry):
            """Early exit: stop once no alive beam can still beat its
            batch's best finished hypothesis. Alive raw scores only
            decrease; without length normalization the bound is the
            current max, with it the least-negative reachable value
            raw/norm_len (norm_len = max_steps, or settled_bound_len when
            certifying a larger budget). Exact — results match the
            full-budget loop (tests/test_beam_search.py). (With joint CTC
            blending the per-step increments stay ≤ 0 — both att
            log-probs and CTC prefix-score deltas are non-positive — so
            the bound holds.)"""
            t = carry[0]
            alive_scores, fin_scores = carry[2], carry[4]
            unsettled = _unsettled(alive_scores, fin_scores)
            return jnp.logical_and(t < bound, jnp.any(unsettled))

        return cond

    def body(carry):
        return step(carry[1:], carry[0])

    carry = (jnp.asarray(0, jnp.int32), alive_tokens, alive_scores,
             fin_tokens, fin_scores, fin_lengths, ctc_state, cache, logits,
             lm_state, lm_logp)
    # one while_loop per segment; growing the cache between segments.
    # A segment whose work is already done (t == bound, or every row
    # settled) executes zero iterations — trained models that finish in
    # the first segment never pay for the larger allocations.
    for si, bound in enumerate(segments):
        carry = jax.lax.while_loop(make_cond(bound), body, carry)
        if si + 1 < len(segments):
            grown = grow_cache_fn(
                carry[7], prompt_len + segments[si + 1]
            )
            carry = carry[:7] + (grown,) + carry[8:]
    (t_final, alive_tokens, alive_scores, fin_tokens, fin_scores,
     fin_lengths, *_rest) = carry

    # ---- fallback: hyps that never emitted eos compete at the BUDGET ----
    # Normalized by norm_len (the certified budget), NOT by the loop's
    # exit step t_final: t_final is batch-global (the early exit fires
    # when every ROW settles), so dividing by it couples one row's
    # selection to its batch mates — decoding the same utterance in a
    # different batch could pick a different hypothesis (observed at
    # flagship shape on a weak model: 34/64 rows flipped between a
    # full and a padded partial batch). Under the cond's bound,
    # max(alive)/norm_len <= max(fin) at exit, so with norm_len
    # normalization an alive hyp can only win when NO finished hyp
    # exists — and then the loop ran to the full budget anyway
    # (t_final == norm_len). This is also SpeechBrain's semantics: its
    # loop always runs the full budget, so unfinished hyps compete at
    # the budget length, never at an early-exit step.
    alive_sel = (
        alive_scores / norm_len
        if config.length_normalization
        else alive_scores
    )
    all_scores = jnp.concatenate([fin_scores, alive_sel], axis=1)
    all_tokens = jnp.concatenate([fin_tokens, alive_tokens], axis=1)
    all_lengths = jnp.concatenate(
        [fin_lengths, jnp.full((B, beam), 1, jnp.int32) * t_final], axis=1
    )
    best = jnp.argmax(all_scores, axis=1)
    tokens = jnp.take_along_axis(all_tokens, best[:, None, None], axis=1)[:, 0]
    lengths = jnp.take_along_axis(all_lengths, best[:, None], axis=1)[:, 0]
    scores = jnp.take_along_axis(all_scores, best[:, None], axis=1)[:, 0]
    settled = jnp.logical_not(_unsettled(alive_scores, fin_scores))
    return tokens, lengths, scores, settled


def greedy_search(decode_step_fn, init_cache_fn, params, enc_out, prompt,
                  max_steps: int, eos_index: int = 2,
                  temperature: float = 1.0,
                  cache_gather_fn: Callable = default_cache_gather,
                  enc_bias=None):
    """Greedy decode (beam 1, no thresholds) — the PR1 validation path."""
    cfg = BeamSearchConfig(
        beam_size=1, eos_index=eos_index, temperature=temperature
    )
    tokens, lengths, scores, _ = beam_search(
        decode_step_fn, init_cache_fn, params, enc_out, prompt, max_steps,
        cfg, cache_gather_fn, enc_bias,
    )
    return tokens, lengths, scores


class MultiTaskBeamSearch:
    """YAML-facing searcher (reference ``S2SMultiTaskTransformerBeamSearch``).

    Holds decode config + module definitions from YAML; parameters are bound
    once by the trainer (``bind``), building the jit-stable step closures.
    The reference's mutable language-switch API
    (``set_decoder_prefix_tokens``) is preserved — the prompt is runtime
    data, so ASR↔ST switching reuses the compiled kernel.
    """

    def __init__(
        self,
        modules: List[Any],
        bos_index: int = 1,
        eos_index: int = 2,
        blank_index: int = 0,
        min_decode_ratio: float = 0.0,
        max_decode_ratio: float = 1.0,
        beam_size: int = 5,
        using_eos_threshold: bool = False,
        eos_threshold: float = 1.5,
        length_normalization: bool = False,
        temperature: float = 1.0,
        lm_weight: float = 0.0,
        temperature_lm: float = 0.0,
        ctc_weight: float = 0.0,
        source_lang: int = -100,
        target_lang: int = -100,
        mask_encoder_padding: bool = False,
        max_decode_tokens: Optional[int] = None,
        cache_growth: Optional[int] = 64,
        kv_cache_dtype: Optional[str] = None,
        **unused,
    ):
        self.model_def = modules[0]
        self.seq_lin_def = modules[1] if len(modules) > 1 else None
        self.ctc_lin_def = modules[2] if len(modules) > 2 else None
        self.config = BeamSearchConfig(
            beam_size=int(beam_size),
            bos_index=int(bos_index),
            eos_index=int(eos_index),
            blank_index=int(blank_index),
            min_decode_ratio=float(min_decode_ratio),
            max_decode_ratio=float(max_decode_ratio),
            using_eos_threshold=bool(using_eos_threshold),
            eos_threshold=float(eos_threshold),
            length_normalization=bool(length_normalization),
            temperature=float(temperature),
            ctc_weight=float(ctc_weight),
            lm_weight=float(lm_weight),
            temperature_lm=float(temperature_lm),
        )
        # shallow-fusion LM hook (reference lm_forward_step surface,
        # mutitask_decoder.py:130-137): set via set_lm(); active only when
        # lm_weight > 0, like SB
        self._lm_step_fn: Optional[Callable] = None
        self._lm_init_fn: Optional[Callable] = None
        self.mask_encoder_padding = bool(mask_encoder_padding)
        # serving-level cap on decode steps (the reference semantic is
        # max_decode_ratio × enc frames — 250 steps for 10 s audio — but
        # conversational ST outputs are tens of tokens; a cap bounds the
        # compiled loop without changing results when hyps finish earlier)
        self.max_decode_tokens = (
            int(max_decode_tokens) if max_decode_tokens else None
        )
        # tiered decoding: when a serving cap is set, optionally run the
        # search at this small step budget first — per-step cache reads
        # scale with the ALLOCATED budget — and rerun the full budget only
        # if some batch row is not provably settled (the early-exit bound
        # normalized by the FULL budget certifies budget-independence; see
        # beam_search settled_bound_len). Exact on both paths
        # (tests/test_beam_search.py::TestTieredDecoding). Default OFF:
        # measured SLOWER on the trained bench (1302 vs 1415 RTFx) — the
        # cross-budget certificate needs alive scores to decay ~3x further
        # than the budget-local exit, so the tier pass runs past the point
        # the plain capped search would already have stopped (docs/PERF.md).
        self.decode_tier: Optional[int] = None
        # segmented cache growth: decode in geometric step-budget segments
        # (cache_growth, 2x, ... max_steps), growing the KV cache between
        # segments. Exact (a continuation, not a rerun) — per-step cache
        # reads scale with the allocated budget, so total read traffic is
        # ~triangular, and early-exiting (trained) models never touch the
        # large allocations. None disables (single full-budget segment).
        self.cache_growth = int(cache_growth) if cache_growth else None
        # int8-quantized self-attention KV cache: halves the decode loop's
        # dominant HBM stream (the per-step cache read — the int8→bf16
        # convert fuses into the matmul operand load, measured 357→223
        # µs/step at bench shapes, tools/exp_int8_cache.py). Per-(row,
        # head, position) fp32 scales; opt-in (tiny quantization noise can
        # reorder near-tied beams). Ignored under Pallas anc mode.
        if kv_cache_dtype not in (None, "int8"):
            raise ValueError(f"kv_cache_dtype: {kv_cache_dtype!r} "
                             "(supported: None, 'int8')")
        self.kv_cache_dtype = kv_cache_dtype
        self.bos_token = int(bos_index)
        self.source_lang = int(source_lang)
        self.target_lang = int(target_lang)
        self.decoder_input_tokens: Optional[List[int]] = None
        self._params: Optional[Dict[str, Any]] = None
        self._decode_step_fn: Optional[Callable] = None
        self._init_cache_fn: Optional[Callable] = None
        self._cache_gather_fn: Optional[Callable] = None

    # ---- reference-mutable prompt API ----------------------------------
    def set_source_language(self, source_lang: int) -> None:
        self.source_lang = int(source_lang)

    def set_target_language(self, target_lang: int) -> None:
        self.target_lang = int(target_lang)

    def set_decoder_prefix_tokens(self, source_lang: int, target_lang: int):
        self.set_source_language(source_lang)
        self.set_target_language(target_lang)
        self.decoder_input_tokens = [
            self.bos_token, self.source_lang, self.target_lang,
        ]

    # ---- LM fusion hook ---------------------------------------------------
    def set_lm(self, lm_step_fn: Callable, lm_init_fn: Optional[Callable],
               lm_params: Any, lm_weight: Optional[float] = None) -> None:
        """Plug a jittable LM for shallow fusion.

        lm_step_fn: (params, tokens (BB,), position (), state) ->
          (logits (BB, V), state); receives ``params["lm"]`` — wrapped here
          so the jit key stays stable while LM params remain dynamic.
        lm_init_fn: (params, batch_beam) -> state (or None).
        """
        def step(params, tokens, position, state):
            return lm_step_fn(params["lm"], tokens, position, state)

        def init(params, bb):
            if lm_init_fn is None:
                return None
            return lm_init_fn(params["lm"], bb)

        self._lm_step_fn = step
        self._lm_init_fn = init
        self._lm_params = lm_params
        if lm_weight is not None:
            self.config = self.config._replace(lm_weight=float(lm_weight))
        if self._params is not None:
            self._params = {**self._params, "lm": lm_params}

    # ---- parameter binding ----------------------------------------------
    # The step closures are built ONCE (stable jit keys); parameters are a
    # dynamic argument threaded through beam_search, so training updates
    # never stale the compiled kernels.
    def bind(self, transformer_params, seq_lin_params) -> None:
        self._params = {"t": transformer_params, "s": seq_lin_params,
                        "lm": getattr(self, "_lm_params", None)}
        if self._decode_step_fn is not None:
            return
        model_def = self.model_def
        seq_def = self.seq_lin_def
        # gather-free beam decode requires the Pallas ancestor kernel;
        # captured at bind time so the jit-static closures stay consistent
        # (toggle stac_st_tpu.ops.pallas BEFORE constructing/binding).
        from ..ops import pallas as pallas_mod

        anc_enabled = pallas_mod.is_enabled()

        def _anc_fits(beam: int, max_len: int) -> bool:
            # step_anc keeps one utterance's (beam, H, S, Dh) K and V
            # blocks VMEM-resident (~16 MiB/core on TPU); refuse shapes
            # that cannot compile and fall back to gather-mode decode,
            # matching the other kernels' fallback contract (ADVICE r2).
            h = int(model_def.nhead)
            dh = int(model_def.d_model) // h
            per_utt_bytes = 2 * beam * h * max_len * dh * 4  # fp32 worst
            return per_utt_bytes <= 8 * 1024 * 1024

        kv_cache_dtype = self.kv_cache_dtype

        def init_cache_fn(params, enc_out, max_len, enc_bias=None, beam=1):
            anc_mode = (
                anc_enabled and beam > 1
                and _anc_fits(int(beam), int(max_len))
            )
            return model_def.apply(
                params["t"], enc_out, max_len, enc_bias, beam,
                anc_mode, None if anc_mode else kv_cache_dtype,
                method=model_def.init_decode_cache,
            )

        def decode_step_fn(params, tokens, position, cache):
            hidden, cache = model_def.apply(
                params["t"], tokens, position, cache,
                method=model_def.decode_step,
            )
            return seq_def.apply(params["s"], hidden), cache

        def cache_gather_fn(cache, flat_parent):
            new_layers = []
            for layer in cache["layers"]:
                self_c = layer["self"]
                new_layers.append({
                    **layer,
                    # gather every per-row leaf (k/v plus the int8 mode's
                    # k_scale/v_scale); "index" is a shared scalar
                    "self": {
                        name: (leaf if name == "index"
                               else jnp.take(leaf, flat_parent, axis=0))
                        for name, leaf in self_c.items()
                    },
                })
            return {**cache, "layers": new_layers}

        self._decode_step_fn = decode_step_fn
        self._init_cache_fn = init_cache_fn
        self._cache_gather_fn = cache_gather_fn
        # segmented cache growth rides the model's own layout knowledge.
        # Disabled under Pallas anc mode: the VMEM-budget guard decides
        # anc on the allocation init_cache sees, and the anc kernel keeps
        # the full allocated block VMEM-resident — growth would invalidate
        # both. (Anc mode avoids the gather copy anyway.)
        self._grow_cache_fn = (
            None if anc_enabled
            else getattr(model_def, "grow_decode_cache", None)
        )

    # ---- jit-friendly array surface -------------------------------------
    def search_arrays(self, enc_out, wav_lens=None, ctc_log_probs=None,
                      prompt=None, params=None):
        """Raw search returning device arrays (tokens, lengths, scores,
        settled) — safe to call INSIDE an outer jit (no host syncs, no
        Python-list conversion, tiering not applied). The serving engine
        fuses encode + search into one compiled program through this
        (docs/PERF.md round 3: halves per-bucket dispatches)."""
        if prompt is None:
            if self.decoder_input_tokens is None:
                raise RuntimeError(
                    "call set_decoder_prefix_tokens(src, tgt) first or "
                    "pass prompt="
                )
            prompt = jnp.asarray(self.decoder_input_tokens, jnp.int32)
        if self._decode_step_fn is None:
            raise RuntimeError("searcher not bound to parameters (bind())")
        S = enc_out.shape[1]
        max_steps = max(int(self.config.max_decode_ratio * S), 1)
        if self.max_decode_tokens is not None:
            max_steps = min(max_steps, self.max_decode_tokens)
        enc_bias = None
        if self.mask_encoder_padding and wav_lens is not None:
            from ..ops import masks as M

            pad = M.src_key_padding_mask_encode(jnp.asarray(wav_lens), S)
            enc_bias = M.additive_bias(pad[:, None, None, :])
        ctc_lens = None
        if ctc_log_probs is not None and wav_lens is not None:
            ctc_lens = jnp.floor(
                jnp.asarray(wav_lens) * ctc_log_probs.shape[1]
            ).astype(jnp.int32)
        return beam_search(
            self._decode_step_fn, self._init_cache_fn,
            self._params if params is None else params,
            enc_out, prompt, max_steps, self.config,
            self._cache_gather_fn, enc_bias, ctc_log_probs, ctc_lens,
            lm_step_fn=self._lm_step_fn, lm_init_fn=self._lm_init_fn,
            grow_cache_fn=self._grow_cache_fn,
            cache_growth=self.cache_growth,
        )

    # ---- call surface ---------------------------------------------------
    def __call__(self, enc_out, wav_lens=None, ctc_log_probs=None):
        """enc_out: (B, S, d); returns (hyps list-of-id-lists, scores np).

        ctc_log_probs: optional (B, T_enc, V) CTC frame posteriors for joint
        CTC/attention decoding (used when ctc_weight > 0)."""
        if self.decoder_input_tokens is None:
            raise RuntimeError(
                "call set_decoder_prefix_tokens(src, tgt) first "
                "(reference initialize_beam_search, dataio_and_utils.py:234)"
            )
        prompt = jnp.asarray(self.decoder_input_tokens, jnp.int32)
        return self._search_with_prompt(
            jnp.asarray(enc_out), wav_lens, prompt, ctc_log_probs
        )

    def call_multi(self, enc_out, wav_lens=None, prompts=None,
                   ctc_log_probs=None):
        """Fused multi-prompt search: decode the SAME encoder output under
        P different language prompts in ONE beam-search program.

        The reference's inference recipe runs the encoder once and decodes
        twice — ASR ``[bos,src,src]`` then ST ``[bos,src,tgt]`` — as two
        sequential searches over the same ``enc_out``
        (``/root/reference/stac-st/inference.py:100-129``). Here the
        encoder output is tiled P× on the batch axis and each tile gets
        its own prompt row, so one decode loop serves all P outputs: the
        per-step fixed cost (op dispatch, cache reads bounded by the
        LONGEST output instead of per-task budgets) is amortized over P
        hypothesis streams. Exact — each tile's rows never interact, so
        results equal P independent searches.

        Args:
          enc_out: (B, S, d) encoder output (NOT tiled by the caller).
          wav_lens: optional (B,) relative lengths.
          prompts: sequence of P prompt token lists (same length each,
            e.g. ``[[bos,src,src],[bos,src,tgt]]``).
          ctc_log_probs: optional (B, T, V) CTC posteriors (joint decode).

        Returns: list of P (hyps, scores) pairs, one per prompt, each in
        ``__call__``'s format.
        """
        pr = jnp.asarray(list(prompts), jnp.int32)
        if pr.ndim != 2:
            raise ValueError("prompts must be a (P, L) token matrix")
        P = pr.shape[0]
        enc_out = jnp.asarray(enc_out)
        B = enc_out.shape[0]
        enc_t = jnp.concatenate([enc_out] * P, axis=0)
        wl = (
            None if wav_lens is None
            else jnp.concatenate([jnp.asarray(wav_lens)] * P, axis=0)
        )
        ctc_t = (
            None if ctc_log_probs is None
            else jnp.concatenate([jnp.asarray(ctc_log_probs)] * P, axis=0)
        )
        prompt_rows = jnp.repeat(pr, B, axis=0)  # (P·B, L), tile-major
        hyps, scores = self._search_with_prompt(enc_t, wl, prompt_rows, ctc_t)
        return [
            (hyps[i * B:(i + 1) * B], scores[i * B:(i + 1) * B])
            for i in range(P)
        ]

    def _search_with_prompt(self, enc_out, wav_lens, prompt, ctc_log_probs):
        if self._decode_step_fn is None:
            raise RuntimeError("searcher not bound to parameters (bind())")
        S = enc_out.shape[1]
        max_steps = max(int(self.config.max_decode_ratio * S), 1)
        if self.max_decode_tokens is not None:
            max_steps = min(max_steps, self.max_decode_tokens)
        enc_bias = None
        if self.mask_encoder_padding and wav_lens is not None:
            from ..ops import masks as M

            pad = M.src_key_padding_mask_encode(jnp.asarray(wav_lens), S)
            enc_bias = M.additive_bias(pad[:, None, None, :])
        ctc_lens = None
        if ctc_log_probs is not None and wav_lens is not None:
            ctc_lens = jnp.floor(
                jnp.asarray(wav_lens) * ctc_log_probs.shape[1]
            ).astype(jnp.int32)

        def run(budget, bound_len=None):
            return beam_search(
                self._decode_step_fn, self._init_cache_fn, self._params,
                enc_out, prompt, budget, self.config, self._cache_gather_fn,
                enc_bias, ctc_log_probs, ctc_lens,
                lm_step_fn=self._lm_step_fn, lm_init_fn=self._lm_init_fn,
                settled_bound_len=bound_len,
                grow_cache_fn=self._grow_cache_fn,
                cache_growth=self.cache_growth,
            )

        from ..parallel.distributed import gather_to_host

        tier = self.decode_tier if self.max_decode_tokens is not None else None
        min_steps = int(self.config.min_decode_ratio * S)
        if tier is not None and min_steps < tier < max_steps:
            tokens, lengths, scores, settled = run(tier, bound_len=max_steps)
            if not bool(np.all(gather_to_host(settled))):
                # some row could still improve with more steps — rerun the
                # full budget (settled rows reproduce identical results)
                tokens, lengths, scores, _ = run(max_steps)
        else:
            tokens, lengths, scores, _ = run(max_steps)
        # gather_to_host: on multi-host pods the outputs are sharded on
        # the batch axis across processes; every process assembles the
        # full arrays (single-host: plain np.asarray)
        tokens = gather_to_host(tokens)
        lengths = gather_to_host(lengths)
        hyps = [
            list(map(int, tokens[b, : lengths[b]]))
            for b in range(tokens.shape[0])
        ]
        return hyps, gather_to_host(scores)
