"""CTC prefix scorer vs brute-force path enumeration (tiny shapes)."""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.decoding.ctc_prefix import (
    ctc_prefix_init,
    ctc_prefix_score_all,
    ctc_prefix_select,
)

BLANK, EOS = 0, 2


def collapse(path):
    out = []
    prev = None
    for s in path:
        if s != prev and s != BLANK:
            out.append(s)
        prev = s
    return tuple(out)


def brute_force_prefix_prob(log_probs, prefix, T, V):
    """sum of P(path) over paths whose collapsed labeling starts with prefix."""
    probs = np.exp(log_probs)
    total = 0.0
    for path in itertools.product(range(V), repeat=T):
        lab = collapse(path)
        if lab[: len(prefix)] == tuple(prefix):
            p = 1.0
            for t, s in enumerate(path):
                p *= probs[t, s]
            total += p
    return total


def brute_force_exact_prob(log_probs, labeling, T, V):
    probs = np.exp(log_probs)
    total = 0.0
    for path in itertools.product(range(V), repeat=T):
        if collapse(path) == tuple(labeling):
            p = 1.0
            for t, s in enumerate(path):
                p *= probs[t, s]
            total += p
    return total


class TestCtcPrefixScorer:
    @pytest.fixture(scope="class")
    def logp(self):
        rng = np.random.default_rng(5)
        T, V = 4, 4
        x = rng.standard_normal((1, T, V)).astype(np.float32)
        return jax.nn.log_softmax(jnp.asarray(x), axis=-1), T, V

    def test_first_step_scores(self, logp):
        lp, T, V = logp
        state = ctc_prefix_init(lp, blank=BLANK)
        scores, cand, cand_ids = ctc_prefix_score_all(
            state, lp, jnp.asarray([T]), blank=BLANK, eos=EOS
        )
        np_lp = np.asarray(lp)[0]
        for c in range(V):
            if c == BLANK:
                continue
            expected = brute_force_prefix_prob(np_lp, [c], T, V)
            if c == EOS:  # eos column = empty-prefix completed (all blank)
                expected = brute_force_exact_prob(np_lp, [], T, V)
            got = float(np.exp(scores[0, c]))
            assert got == pytest.approx(expected, rel=1e-4), f"c={c}"

    def test_second_step_scores(self, logp):
        lp, T, V = logp
        state = ctc_prefix_init(lp, blank=BLANK)
        scores1, cand, cand_ids = ctc_prefix_score_all(
            state, lp, jnp.asarray([T]), blank=BLANK, eos=EOS
        )
        first = 1  # commit token 1 (full-vocab candidates: k == id)
        state2 = ctc_prefix_select(cand, cand_ids, jnp.asarray([first]))
        scores2, _, _ = ctc_prefix_score_all(
            state2, lp, jnp.asarray([T]), blank=BLANK, eos=EOS
        )
        np_lp = np.asarray(lp)[0]
        for c in (1, 3):
            expected = brute_force_prefix_prob(np_lp, [first, c], T, V)
            got = float(np.exp(scores2[0, c]))
            assert got == pytest.approx(expected, rel=1e-4), f"c={c}"
        # eos = exact probability of labeling (first,)
        expected_eos = brute_force_exact_prob(np_lp, [first], T, V)
        assert float(np.exp(scores2[0, EOS])) == pytest.approx(
            expected_eos, rel=1e-4
        )

    def test_shorter_input_length(self, logp):
        lp, T, V = logp
        state = ctc_prefix_init(lp, blank=BLANK)
        scores, _, _ = ctc_prefix_score_all(
            state, lp, jnp.asarray([2]), blank=BLANK, eos=EOS
        )
        np_lp = np.asarray(lp)[0, :2]
        expected = brute_force_prefix_prob(np_lp, [1], 2, V)
        assert float(np.exp(scores[0, 1])) == pytest.approx(expected, rel=1e-4)


    def test_partial_candidates_match_full(self, logp):
        lp, T, V = logp
        state = ctc_prefix_init(lp, blank=BLANK)
        full, _, _ = ctc_prefix_score_all(
            state, lp, jnp.asarray([T]), blank=BLANK, eos=EOS
        )
        cands = jnp.asarray([[1, 3, EOS]])
        part, _, ids = ctc_prefix_score_all(
            state, lp, jnp.asarray([T]), blank=BLANK, eos=EOS,
            candidates=cands,
        )
        for k, c in enumerate([1, 3, EOS]):
            assert float(part[0, k]) == pytest.approx(
                float(full[0, c]), rel=1e-5
            )
