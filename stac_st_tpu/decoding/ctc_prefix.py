"""CTC prefix scoring for joint CTC/attention decoding.

Re-owns SpeechBrain's ``CTCPrefixScorer`` (imported by the reference decoder,
``mutitask_decoder.py:10``; exposed through ``ctc_weight_decode``,
yaml:158 — 0 by default, so attention-only decoding is the shipped path).

Algorithm (Watanabe et al., hybrid CTC/attention): for a hypothesis prefix
``g`` and every candidate next token ``c``, the scorer maintains CTC forward
variables over the frame axis — ``r_nb[t]`` (paths ending in a non-blank
emission of the last label) and ``r_b[t]`` (paths ending in blank) — and
returns ``log p_ctc(g·c · … | x)``. All V candidates are scored in one
vectorized sweep per decode step (a ``lax.scan`` over frames with (BB, V)
lanes — static shapes, MXU/VPU friendly).

State layout per hypothesis: ``r_nb, r_b: (BB, T)`` for the current prefix,
plus the last emitted label. Scores are length-T log-sums, batched over
beams exactly like the attention scores they blend with.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["CtcPrefixState", "ctc_prefix_init", "ctc_prefix_score_all"]

NEG_INF = -1.0e9


class CtcPrefixState(NamedTuple):
    r_nb: jax.Array     # (BB, T) log prob, prefix paths ending non-blank
    r_b: jax.Array      # (BB, T) log prob, prefix paths ending blank
    last: jax.Array     # (BB,) last label of the prefix (-1 = empty)


def _logaddexp(a, b):
    return jnp.logaddexp(a, b)


def ctc_prefix_init(log_probs: jax.Array, blank: int = 0) -> CtcPrefixState:
    """State for the empty prefix. log_probs: (BB, T, V)."""
    BB, T, _ = log_probs.shape
    blank_lp = log_probs[:, :, blank]  # (BB, T)
    r_b = jnp.cumsum(blank_lp, axis=1)  # all-blank paths
    r_nb = jnp.full((BB, T), NEG_INF, jnp.float32)
    return CtcPrefixState(
        r_nb=r_nb, r_b=r_b, last=jnp.full((BB,), -1, jnp.int32)
    )


def ctc_prefix_score_all(
    state: CtcPrefixState,
    log_probs: jax.Array,
    input_lengths: jax.Array,
    blank: int = 0,
    eos: int = 2,
    candidates: jax.Array | None = None,
) -> Tuple[jax.Array, CtcPrefixState]:
    """Score candidate continuations.

    Args:
      state: current prefix state.
      log_probs: (BB, T, V) CTC frame log-posteriors.
      input_lengths: (BB,) absolute valid frame counts.
      blank, eos: special ids (reference contract: blank 0, eos 2).
      candidates: optional (BB, K) token ids for *partial* scoring (the
        SB ``ctc_score_mode='partial'`` memory trade — SURVEY.md §2.3);
        None scores the full vocabulary.

    Returns:
      scores: (BB, K) log p_ctc(prefix · c · ... | x) per candidate
        (candidates equal to ``eos`` get the *complete*-prefix probability);
      candidate_state: CtcPrefixState with (BB, K, T) stacked variables —
        commit one candidate per beam with :func:`ctc_prefix_select`.
    """
    BB, T, V = log_probs.shape
    r_nb, r_b, last = state

    if candidates is None:
        cand_ids = jnp.broadcast_to(
            jnp.arange(V, dtype=jnp.int32)[None, :], (BB, V)
        )
        x = jnp.swapaxes(log_probs, 1, 2)  # (BB, K=V, T)
    else:
        cand_ids = candidates.astype(jnp.int32)  # (BB, K)
        x = jnp.take_along_axis(
            jnp.swapaxes(log_probs, 1, 2), cand_ids[:, :, None], axis=1
        )  # (BB, K, T)
    K = cand_ids.shape[1]

    # phi[t]: prob of prefix at t usable before emitting c at t+1.
    # For c == last, the non-blank ending cannot chain directly (it would
    # collapse), so only the blank ending contributes.
    same = cand_ids == last[:, None]
    phi_base = _logaddexp(r_nb, r_b)  # (BB, T)
    phi = jnp.where(
        same[:, :, None], r_b[:, None, :], phi_base[:, None, :]
    )  # (BB, K, T)

    blank_lp = log_probs[:, :, blank][:, None, :]  # (BB, 1, T)

    # forward sweep over frames:
    #   new_r_nb[t] = (new_r_nb[t-1] ⊕ phi[t-1]) + x[t]
    #   new_r_b[t]  = (new_r_b[t-1] ⊕ new_r_nb[t-1]) + xb[t]
    def frame(carry, inputs):
        prev_nb, prev_b, prev_phi = carry
        x_t, xb_t, phi_t = inputs
        nb = _logaddexp(prev_nb, prev_phi) + x_t
        b = _logaddexp(prev_b, prev_nb) + xb_t
        return (nb, b, phi_t), (nb, b)

    init_nb = jnp.full((BB, K), NEG_INF, jnp.float32)
    init_b = jnp.full((BB, K), NEG_INF, jnp.float32)
    # at t=0 a candidate can start fresh: phi_{-1} = 0 for the empty prefix
    # (or NEG_INF otherwise — starting mid-stream requires the prefix done)
    empty = (last < 0)[:, None]
    phi_m1 = jnp.where(empty, 0.0, NEG_INF) * jnp.ones((BB, K))

    xs = (
        jnp.moveaxis(x, 2, 0),                       # (T, BB, K)
        jnp.moveaxis(jnp.broadcast_to(blank_lp, (BB, K, T)), 2, 0),
        jnp.moveaxis(phi, 2, 0),
    )
    (_, _, _), (nb_seq, b_seq) = jax.lax.scan(
        frame, (init_nb, init_b, phi_m1), xs
    )
    nb_all = jnp.moveaxis(nb_seq, 0, 2)  # (BB, K, T)
    b_all = jnp.moveaxis(b_seq, 0, 2)

    idx = jnp.maximum(input_lengths.astype(jnp.int32) - 1, 0)  # (BB,)

    # prefix probability ψ(c) = Σ_t φ[t-1]·x_t(c): each path is counted at
    # its FIRST completion of prefix·c, any continuation allowed after —
    # this (not the exact-labeling forward variable) is what blends with
    # the attention scores.
    phi_shifted = jnp.concatenate(
        [phi_m1[:, :, None], phi[:, :, :-1]], axis=2
    )  # (BB, K, T): φ[t-1]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (BB, K, T), 2)
    valid = t_idx < input_lengths[:, None, None].astype(jnp.int32)
    psi_terms = jnp.where(valid, phi_shifted + x, NEG_INF)
    scores = jax.nn.logsumexp(psi_terms, axis=2)  # (BB, K)

    # eos candidates: probability that the *current prefix* is the output
    prefix_done = _logaddexp(
        jnp.take_along_axis(r_nb, idx[:, None], axis=1)[:, 0],
        jnp.take_along_axis(r_b, idx[:, None], axis=1)[:, 0],
    )
    scores = jnp.where(cand_ids == eos, prefix_done[:, None], scores)
    scores = jnp.where(cand_ids == blank, NEG_INF, scores)

    return scores, CtcPrefixState(nb_all, b_all, last), cand_ids


def ctc_prefix_select(
    candidate_state: CtcPrefixState, cand_ids: jax.Array, k_index: jax.Array
) -> CtcPrefixState:
    """Commit one candidate per beam by its K-index. candidate_state holds
    (BB, K, T) variables; k_index: (BB,). Returns a (BB, T) state."""
    nb_all, b_all, _ = candidate_state
    k = k_index.astype(jnp.int32)
    take = lambda a: jnp.take_along_axis(
        a, k[:, None, None].repeat(a.shape[2], 2), axis=1
    )[:, 0, :]
    tokens = jnp.take_along_axis(cand_ids, k[:, None], axis=1)[:, 0]
    return CtcPrefixState(take(nb_all), take(b_all), tokens)
