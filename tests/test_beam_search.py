"""Beam-search semantic tests: prompt control, termination, batch invariance."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.decoding.beam_search import (
    MultiTaskBeamSearch,
    beam_search,
)
from stac_st_tpu.models import LinearHead, TransformerMultiTask

D, VOCAB = 32, 40


@pytest.fixture(scope="module")
def setup():
    model = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=16, d_model=D, nhead=4,
        num_encoder_layers=1, num_decoder_layers=2, d_ffn=64, dropout=0.0,
        normalize_before=True,
    )
    seq_lin = LinearHead(input_size=D, n_neurons=VOCAB)
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(1, VOCAB, (2, 5)))
    t_params = model.init(jax.random.PRNGKey(1), src, tgt)
    enc = model.apply(params := t_params, src, method=model.encode)
    s_params = seq_lin.init(jax.random.PRNGKey(2), enc)

    def make_searcher(**kw):
        opts = dict(bos_index=1, eos_index=2, blank_index=0,
                    min_decode_ratio=0.0, max_decode_ratio=1.0)
        opts.update(kw)
        s = MultiTaskBeamSearch([model, seq_lin, None], **opts)
        s.bind(t_params, s_params)
        return s

    return dict(model=model, t_params=t_params, s_params=s_params,
                make_searcher=make_searcher, rng=rng)


def _random_enc(setup, B, S):
    x = setup["rng"].standard_normal((B, S, 16)).astype(np.float32)
    return setup["model"].apply(
        setup["t_params"], jnp.asarray(x),
        method=setup["model"].encode,
    )


class TestBeamSemantics:
    def test_prompt_changes_output(self, setup):
        """ASR vs ST prompts must steer decoding (task-by-prompt design).

        min_decode_ratio forces non-empty hyps on the random-weight model
        (an untrained model scores immediate-eos highest, which is also the
        un-normalized beam's preference).
        """
        enc = _random_enc(setup, 2, 12)
        s = setup["make_searcher"](beam_size=3, min_decode_ratio=0.4)
        s.set_decoder_prefix_tokens(5, 5)
        hyps_asr, sc_asr = s(enc)
        s.set_decoder_prefix_tokens(5, 9)
        hyps_st, sc_st = s(enc)
        assert all(len(h) >= 4 for h in hyps_asr)
        assert hyps_asr != hyps_st or not np.allclose(sc_asr, sc_st)

    def test_hyps_have_no_prompt_or_eos(self, setup):
        enc = _random_enc(setup, 3, 10)
        s = setup["make_searcher"](beam_size=3)
        s.set_decoder_prefix_tokens(5, 9)
        hyps, _ = s(enc)
        for h in hyps:
            assert 1 not in h  # bos
            assert 2 not in h  # eos
            assert len(h) <= 10  # max_decode_ratio * S

    def test_deterministic(self, setup):
        enc = _random_enc(setup, 2, 10)
        s = setup["make_searcher"](beam_size=4)
        s.set_decoder_prefix_tokens(5, 9)
        a, sa = s(enc)
        b, sb = s(enc)
        assert a == b
        np.testing.assert_array_equal(sa, sb)

    def test_batch_invariance_with_padding_mask(self, setup):
        """Decoding an utterance alone == in a padded batch (strict masking).

        The reference's shipped decode attends padded encoder frames
        (mutitask_decoder.py:126 passes no enc_len); with
        mask_encoder_padding=True the TPU path is batch-shape invariant.
        """
        model, t_params = setup["model"], setup["t_params"]
        x_short = setup["rng"].standard_normal((1, 6, 16)).astype(np.float32)
        # lone utterance, exact length
        enc_alone = model.apply(
            t_params, jnp.asarray(x_short), jnp.asarray([5.0 / 6.0]),
            method=model.encode,
        )
        # same utterance padded to 12 frames inside a batch
        x_pad = np.zeros((1, 12, 16), np.float32)
        x_pad[:, :6] = x_short
        enc_pad = model.apply(
            t_params, jnp.asarray(x_pad), jnp.asarray([5.0 / 12.0]),
            method=model.encode,
        )
        s = setup["make_searcher"](beam_size=3, mask_encoder_padding=True)
        s.set_decoder_prefix_tokens(5, 9)
        hyps_alone, _ = s(enc_alone, jnp.asarray([5.0 / 6.0]))
        hyps_pad, _ = s(enc_pad, jnp.asarray([5.0 / 12.0]))
        # same attended frames (0..5) ⇒ same leading hypothesis tokens up to
        # the shorter max-steps budget
        n = min(len(hyps_alone[0]), len(hyps_pad[0]), 6)
        assert hyps_alone[0][:n] == hyps_pad[0][:n]

    def test_temperature_affects_scores(self, setup):
        enc = _random_enc(setup, 1, 10)
        s1 = setup["make_searcher"](beam_size=3, temperature=1.0)
        s2 = setup["make_searcher"](beam_size=3, temperature=2.0)
        for s in (s1, s2):
            s.set_decoder_prefix_tokens(5, 9)
        _, sc1 = s1(enc)
        _, sc2 = s2(enc)
        assert not np.allclose(sc1, sc2)

    def test_beam_one_equals_greedy_argmax(self, setup):
        """beam=1 must follow the stepwise argmax path exactly."""
        model, t_params = setup["model"], setup["t_params"]
        s_params = setup["s_params"]
        enc = _random_enc(setup, 1, 8)
        s = setup["make_searcher"](beam_size=1)
        s.set_decoder_prefix_tokens(5, 9)
        hyps, _ = s(enc)

        # manual argmax rollout via full-prefix decode (oracle, no cache)
        seq_lin = LinearHead(input_size=D, n_neurons=VOCAB)
        tokens = [1, 5, 9]
        out = []
        for _ in range(8):
            dec, _a = model.apply(
                t_params, jnp.asarray([tokens]), enc, method=model.decode
            )
            logits = seq_lin.apply(s_params, dec)[0, -1]
            nxt = int(jnp.argmax(logits))
            if nxt == 2:
                break
            out.append(nxt)
            tokens.append(nxt)
        assert hyps[0] == out


class TestJointCtcDecoding:
    def test_ctc_blending_changes_hyps(self, setup):
        """ctc_weight_decode > 0 must blend CTC prefix scores in (and still
        produce valid hypotheses)."""
        enc = _random_enc(setup, 2, 12)
        rng = setup["rng"]
        ctc_lp = jax.nn.log_softmax(jnp.asarray(
            rng.standard_normal((2, 12, VOCAB)).astype(np.float32)
        ), axis=-1)

        s_att = setup["make_searcher"](beam_size=3, min_decode_ratio=0.3)
        s_att.set_decoder_prefix_tokens(5, 9)
        hyps_att, sc_att = s_att(enc)

        s_joint = setup["make_searcher"](
            beam_size=3, min_decode_ratio=0.3, ctc_weight=0.5
        )
        s_joint.set_decoder_prefix_tokens(5, 9)
        hyps_joint, sc_joint = s_joint(
            enc, jnp.asarray([1.0, 1.0]), ctc_log_probs=ctc_lp
        )
        assert all(isinstance(h, list) for h in hyps_joint)
        assert np.all(np.isfinite(sc_joint))
        # different scoring rule ⇒ different scores (almost surely)
        assert hyps_att != hyps_joint or not np.allclose(sc_att, sc_joint)

    def test_ctc_weight_zero_ignores_ctc(self, setup):
        enc = _random_enc(setup, 1, 10)
        ctc_lp = jnp.zeros((1, 10, VOCAB))
        s = setup["make_searcher"](beam_size=2)
        s.set_decoder_prefix_tokens(5, 9)
        a, sa = s(enc)
        b, sb = s(enc, None, ctc_log_probs=ctc_lp)
        assert a == b
        np.testing.assert_array_equal(sa, sb)


class TestLMFusion:
    """Shallow LM fusion (reference lm_forward_step surface,
    mutitask_decoder.py:130-137 + yaml:249-251)."""

    @staticmethod
    def _bigram_lm(rng, favored):
        """Stateless bigram LM strongly preferring token `favored`."""
        bias = np.full((VOCAB,), -5.0, np.float32)
        bias[favored] = 5.0
        bias_j = jnp.asarray(bias)

        def lm_step(lm_params, tokens, position, state):
            logits = jnp.tile(bias_j[None, :] * lm_params["scale"],
                              (tokens.shape[0], 1))
            return logits, state

        def lm_init(lm_params, bb):
            return {"seen": jnp.zeros((bb,), jnp.int32)}

        return lm_step, lm_init, {"scale": jnp.asarray(1.0)}

    def test_zero_weight_is_identity(self, setup):
        enc = _random_enc(setup, 2, 10)
        base = setup["make_searcher"](beam_size=3, min_decode_ratio=0.3)
        base.set_decoder_prefix_tokens(5, 9)
        hyps_a, sc_a = base(enc)

        s = setup["make_searcher"](beam_size=3, min_decode_ratio=0.3,
                                   lm_weight=0.0)
        lm_step, lm_init, lm_params = self._bigram_lm(setup["rng"], 7)
        s.set_lm(lm_step, lm_init, lm_params)  # weight stays 0 -> inactive
        s.bind(setup["t_params"], setup["s_params"])
        s.set_decoder_prefix_tokens(5, 9)
        hyps_b, sc_b = s(enc)
        assert hyps_a == hyps_b
        np.testing.assert_allclose(sc_a, sc_b, atol=1e-5)

    def test_strong_lm_steers_output(self, setup):
        enc = _random_enc(setup, 2, 10)
        favored = 7
        lm_step, lm_init, lm_params = self._bigram_lm(setup["rng"], favored)
        s = setup["make_searcher"](beam_size=3, min_decode_ratio=0.5)
        s.set_lm(lm_step, lm_init, lm_params, lm_weight=5.0)
        s.bind(setup["t_params"], setup["s_params"])
        s.set_decoder_prefix_tokens(5, 9)
        hyps, _ = s(enc)
        # a +10-logit LM preference at weight 5 dominates the random model
        for h in hyps:
            assert h and all(tok == favored for tok in h), h

    def test_moderate_lm_changes_scores(self, setup):
        enc = _random_enc(setup, 2, 10)
        lm_step, lm_init, lm_params = self._bigram_lm(setup["rng"], 11)
        base = setup["make_searcher"](beam_size=3, min_decode_ratio=0.3)
        base.set_decoder_prefix_tokens(5, 9)
        _, sc_base = base(enc)
        s = setup["make_searcher"](beam_size=3, min_decode_ratio=0.3)
        s.set_lm(lm_step, lm_init, lm_params, lm_weight=0.3)
        s.bind(setup["t_params"], setup["s_params"])
        s.set_decoder_prefix_tokens(5, 9)
        _, sc_lm = s(enc)
        assert not np.allclose(sc_base, sc_lm)


class TestTieredDecoding:
    """decode_tier: small-budget first pass + settled certificate.

    Exactness contract: with a serving cap set, the tiered searcher must
    return byte-identical hypotheses/scores to the single-pass full-budget
    searcher — on both the settled fast path (confident model, eos early)
    and the unsettled rerun path (random weights, eos-threshold)."""

    def _eos_biased_params(self, setup, boost=12.0):
        import jax

        def bump(tree):
            def f(path_leaf):
                return path_leaf
            p = jax.tree_util.tree_map(lambda x: x, tree)
            bias = np.asarray(p["params"]["linear"]["bias"]).copy()
            bias[2] += boost
            p["params"]["linear"]["bias"] = jnp.asarray(bias)
            return p
        return bump(setup["s_params"])

    def _searcher(self, setup, s_params, tier, cap=8):
        s = setup["make_searcher"](
            beam_size=3, length_normalization=True,
            max_decode_tokens=cap,
        )
        s.bind(setup["t_params"], s_params)
        s.decode_tier = tier
        s.set_decoder_prefix_tokens(5, 9)
        return s

    def test_settled_fast_path_matches_full(self, setup):
        enc = _random_enc(setup, 3, 20)
        sp = self._eos_biased_params(setup)
        tiered = self._searcher(setup, sp, tier=3)
        single = self._searcher(setup, sp, tier=None)
        h_t, sc_t = tiered(enc)
        h_s, sc_s = single(enc)
        assert h_t == h_s
        np.testing.assert_allclose(sc_t, sc_s, atol=1e-5)
        # the settled certificate really fires at the small budget
        from stac_st_tpu.decoding.beam_search import beam_search

        _, _, _, settled = beam_search(
            tiered._decode_step_fn, tiered._init_cache_fn, tiered._params,
            enc, jnp.asarray([1, 5, 9], jnp.int32), 3, tiered.config,
            tiered._cache_gather_fn, settled_bound_len=8,
        )
        assert bool(np.all(np.asarray(settled)))

    def test_unsettled_rerun_matches_full(self, setup):
        enc = _random_enc(setup, 2, 20)
        tiered = self._searcher(setup, setup["s_params"], tier=3)
        single = self._searcher(setup, setup["s_params"], tier=None)
        # random weights + eos-threshold: nothing settles at the tier
        tiered.config = tiered.config._replace(using_eos_threshold=True,
                                               eos_threshold=1.5)
        single.config = single.config._replace(using_eos_threshold=True,
                                               eos_threshold=1.5)
        h_t, sc_t = tiered(enc)
        h_s, sc_s = single(enc)
        assert h_t == h_s
        np.testing.assert_allclose(sc_t, sc_s, atol=1e-5)

    def test_no_cap_stays_single_pass(self, setup):
        """Without max_decode_tokens (reference budget semantics) the tier
        knob must be inert."""
        enc = _random_enc(setup, 2, 10)
        s = setup["make_searcher"](beam_size=3)
        s.set_decoder_prefix_tokens(5, 9)
        base_h, base_sc = s(enc)
        s.decode_tier = 2
        h, sc = s(enc)
        assert h == base_h
        np.testing.assert_array_equal(sc, base_sc)


class TestSegmentedCacheGrowth:
    """Segmented cache growth is exact: later segments CONTINUE the same
    search on a grown allocation, so hyps/scores match the single-segment
    run bit for bit (docs/PERF.md round 3)."""

    @pytest.mark.parametrize("growth", [4, 8, 16])
    def test_growth_matches_single_segment(self, setup, growth):
        enc = _random_enc(setup, 3, 48)  # max_steps = 48 -> >= 2 segments
        base = setup["make_searcher"](beam_size=4, cache_growth=None)
        seg = setup["make_searcher"](beam_size=4, cache_growth=growth)
        for s in (base, seg):
            s.set_decoder_prefix_tokens(5, 6)
        h0, s0 = base(enc)
        h1, s1 = seg(enc)
        assert h0 == h1
        np.testing.assert_allclose(s0, s1, rtol=1e-6)

    def test_growth_with_test_search_options(self, setup):
        enc = _random_enc(setup, 2, 40)
        kw = dict(beam_size=3, using_eos_threshold=True,
                  length_normalization=True, temperature=1.15)
        base = setup["make_searcher"](cache_growth=None, **kw)
        seg = setup["make_searcher"](cache_growth=8, **kw)
        for s in (base, seg):
            s.set_decoder_prefix_tokens(4, 9)
        h0, s0 = base(enc)
        h1, s1 = seg(enc)
        assert h0 == h1
        np.testing.assert_allclose(s0, s1, rtol=1e-6)

    def test_growth_with_serving_cap(self, setup):
        enc = _random_enc(setup, 2, 64)
        base = setup["make_searcher"](beam_size=3, cache_growth=None,
                                      max_decode_tokens=24)
        seg = setup["make_searcher"](beam_size=3, cache_growth=8,
                                     max_decode_tokens=24)
        for s in (base, seg):
            s.set_decoder_prefix_tokens(7, 8)
        h0, _ = base(enc)
        h1, _ = seg(enc)
        assert h0 == h1


class TestInt8KVCache:
    """Opt-in int8 self-attention cache (kv_cache_dtype='int8'):
    per-(row, head, position) scales quantize K/V at append time; the
    dequant rides the logits column (K) and the softmax weights (V).
    Halves decode cache HBM traffic (docs/PERF.md round 3)."""

    def test_int8_matches_fp_hyps(self, setup):
        enc = _random_enc(setup, 3, 24)
        base = setup["make_searcher"](beam_size=4)
        q8 = setup["make_searcher"](beam_size=4, kv_cache_dtype="int8")
        for s in (base, q8):
            s.set_decoder_prefix_tokens(5, 6)
        h0, s0 = base(enc)
        h1, s1 = q8(enc)
        assert h0 == h1  # quantization noise must not reorder these beams
        np.testing.assert_allclose(s0, s1, rtol=5e-3, atol=5e-3)

    def test_int8_cache_dtype_and_scales(self, setup):
        model, t_params = setup["model"], setup["t_params"]
        enc = _random_enc(setup, 2, 16)
        cache = model.apply(
            t_params, enc, 8, None, 2, False, "int8",
            method=model.init_decode_cache,
        )
        sc = cache["layers"][0]["self"]
        assert sc["k"].dtype == jnp.int8 and sc["v"].dtype == jnp.int8
        assert sc["k_scale"].shape == (4, 4, 1, 8)
        # one step writes position 0 and sets its scale
        tok = jnp.array([3, 4, 5, 6], jnp.int32)
        _, cache2 = model.apply(
            t_params, tok, jnp.int32(0), cache,
            method=model.decode_step,
        )
        sc2 = cache2["layers"][0]["self"]
        assert int(sc2["index"]) == 1
        assert np.all(np.asarray(sc2["k_scale"])[:, :, 0, 0] > 0)
        assert np.all(np.asarray(sc2["k_scale"])[:, :, 0, 1:] == 0)

    def test_int8_with_segmented_growth(self, setup):
        enc = _random_enc(setup, 2, 48)
        base = setup["make_searcher"](beam_size=3, kv_cache_dtype="int8",
                                      cache_growth=None)
        seg = setup["make_searcher"](beam_size=3, kv_cache_dtype="int8",
                                     cache_growth=8)
        for s in (base, seg):
            s.set_decoder_prefix_tokens(4, 9)
        h0, s0 = base(enc)
        h1, s1 = seg(enc)
        assert h0 == h1  # growth stays exact with quantized caches
        np.testing.assert_allclose(s0, s1, rtol=1e-6)

    def test_greedy_int8_runs(self, setup):
        """beam_size=1 exercises the dus (non-fused) int8 append."""
        enc = _random_enc(setup, 2, 16)
        base = setup["make_searcher"](beam_size=1)
        q8 = setup["make_searcher"](beam_size=1, kv_cache_dtype="int8")
        for s in (base, q8):
            s.set_decoder_prefix_tokens(5, 6)
        h0, _ = base(enc)
        h1, _ = q8(enc)
        assert h0 == h1

    def test_rejects_unknown_dtype(self, setup):
        with pytest.raises(ValueError):
            setup["make_searcher"](kv_cache_dtype="fp8")


class TestFusedMultiPrompt:
    """call_multi: P prompts decoded in ONE program == P separate searches."""

    def test_dual_matches_two_searches(self, setup):
        enc = _random_enc(setup, 3, 12)
        s = setup["make_searcher"](beam_size=3, min_decode_ratio=0.2)
        s.set_decoder_prefix_tokens(5, 5)
        hyps_asr, sc_asr = s(enc)
        s.set_decoder_prefix_tokens(5, 9)
        hyps_st, sc_st = s(enc)
        (f_asr, f_sc_asr), (f_st, f_sc_st) = s.call_multi(
            enc, prompts=[[1, 5, 5], [1, 5, 9]]
        )
        assert f_asr == hyps_asr
        assert f_st == hyps_st
        np.testing.assert_allclose(f_sc_asr, sc_asr, rtol=1e-5)
        np.testing.assert_allclose(f_sc_st, sc_st, rtol=1e-5)

    def test_dual_with_padding_mask_and_lens(self, setup):
        enc = _random_enc(setup, 2, 10)
        lens = jnp.asarray([0.7, 1.0])
        s = setup["make_searcher"](beam_size=3, mask_encoder_padding=True)
        s.set_decoder_prefix_tokens(4, 4)
        h_a, _ = s(enc, lens)
        s.set_decoder_prefix_tokens(4, 8)
        h_b, _ = s(enc, lens)
        (f_a, _), (f_b, _) = s.call_multi(
            enc, lens, prompts=[[1, 4, 4], [1, 4, 8]]
        )
        assert f_a == h_a
        assert f_b == h_b

    def test_triple_prompt(self, setup):
        """P is not limited to 2 (e.g. one ASR + two target languages)."""
        enc = _random_enc(setup, 2, 10)
        s = setup["make_searcher"](beam_size=2)
        prompts = [[1, 5, 5], [1, 5, 9], [1, 5, 11]]
        fused = s.call_multi(enc, prompts=prompts)
        assert len(fused) == 3
        for prompt, (hyps, scores) in zip(prompts, fused):
            s.set_decoder_prefix_tokens(prompt[1], prompt[2])
            ref_hyps, ref_scores = s(enc)
            assert hyps == ref_hyps
            np.testing.assert_allclose(scores, ref_scores, rtol=1e-5)

    def test_fused_with_int8_and_growth(self, setup):
        """The fused path composes with the production cache options."""
        enc = _random_enc(setup, 2, 24)
        s = setup["make_searcher"](beam_size=3, kv_cache_dtype="int8",
                                   cache_growth=8)
        s.set_decoder_prefix_tokens(5, 5)
        h_a, _ = s(enc)
        s.set_decoder_prefix_tokens(5, 9)
        h_b, _ = s(enc)
        (f_a, _), (f_b, _) = s.call_multi(
            enc, prompts=[[1, 5, 5], [1, 5, 9]]
        )
        assert f_a == h_a
        assert f_b == h_b

    def test_rejects_ragged_prompts(self, setup):
        s = setup["make_searcher"](beam_size=2)
        with pytest.raises(ValueError):
            s.call_multi(
                _random_enc(setup, 1, 8), prompts=[[1, 5, 5], [1, 5]]
            )

    def test_fused_with_lm_fusion(self, setup):
        """LM shallow fusion composes with per-row prompts (the LM consumes
        bos only, which is uniform across rows)."""
        bias = np.full((VOCAB,), -2.0, np.float32)
        bias[11] = 2.0
        bias_j = jnp.asarray(bias)

        def lm_step(lm_params, tokens, position, state):
            return jnp.tile(bias_j[None, :], (tokens.shape[0], 1)), state

        enc = _random_enc(setup, 2, 10)
        s = setup["make_searcher"](beam_size=3, min_decode_ratio=0.3)
        s.set_lm(lm_step, None, {}, lm_weight=0.4)
        s.bind(setup["t_params"], setup["s_params"])
        s.set_decoder_prefix_tokens(5, 5)
        h_a, _ = s(enc)
        s.set_decoder_prefix_tokens(5, 9)
        h_b, _ = s(enc)
        (f_a, _), (f_b, _) = s.call_multi(
            enc, prompts=[[1, 5, 5], [1, 5, 9]]
        )
        assert f_a == h_a
        assert f_b == h_b


class TestBatchCompositionInvariance:
    """A row's decode must not depend on what else shares its batch.

    The early-exit while_loop's exit step t_final is batch-global; the
    alive-hypothesis fallback once normalized by it, so the SAME
    utterance decoded next to different batch mates (or silence padding)
    could select a different hypothesis (observed at flagship shape:
    34/64 rows flipped between a full and a padded partial batch). The
    fallback now normalizes by the certified budget, which also matches
    SpeechBrain's full-budget-loop semantics."""

    def _hyps(self, setup, searcher, enc, lens):
        searcher.set_decoder_prefix_tokens(3, 4)
        hyps, _ = searcher(enc, lens)
        return hyps

    @pytest.mark.parametrize("norm", [True, False])
    def test_rows_invariant_under_batch_composition(self, setup, norm):
        searcher = setup["make_searcher"](
            beam_size=4, using_eos_threshold=True,
            length_normalization=norm, temperature=1.15,
        )
        B, S = 8, 12
        enc = _random_enc(setup, B, S)
        lens = jnp.asarray(
            np.linspace(0.5, 1.0, B).astype(np.float32))
        full = self._hyps(setup, searcher, enc, lens)
        # decode the same rows in small ragged groups (with different
        # neighbors and loop exit times)
        for lo, hi in ((0, 3), (3, 5), (5, 8)):
            part = self._hyps(setup, searcher, enc[lo:hi], lens[lo:hi])
            for i, h in enumerate(part):
                assert h == full[lo + i], (norm, lo + i)

    def test_rows_invariant_next_to_silence_rows(self, setup):
        searcher = setup["make_searcher"](
            beam_size=4, using_eos_threshold=True,
            length_normalization=True, temperature=1.15,
        )
        B, S = 4, 12
        enc = _random_enc(setup, B, S)
        lens = jnp.ones((B,), jnp.float32)
        full = self._hyps(setup, searcher, enc, lens)
        # pad with near-silence rows (settle immediately) — real rows
        # must decode identically
        sil = setup["model"].apply(
            setup["t_params"],
            jnp.zeros((4, S, 16), jnp.float32),
            method=setup["model"].encode,
        )
        enc_p = jnp.concatenate([enc, sil], axis=0)
        lens_p = jnp.concatenate([lens, jnp.full((4,), 0.25)], axis=0)
        padded = self._hyps(setup, searcher, enc_p, lens_p)
        for i in range(B):
            assert padded[i] == full[i], i
