"""Speculative (draft–verify) greedy decoding: exactness and plumbing.

The contract under test: ``speculative_greedy_search`` emits EXACTLY the
target model's greedy decode — token-for-token — for ANY draft model and
ANY window size k, because every emitted token is a target argmax given
the same prefix (accepted draft tokens equal the target argmax by the
verification rule; the corrected token IS the target argmax). The draft
only changes the number of target dispatches.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.decoding.speculative import (
    SpecBound,
    bind_spec_model,
    speculative_greedy_search,
)
from stac_st_tpu.models import LinearHead, TransformerMultiTask

VOCAB, D, H, FFN = 50, 32, 4, 64
EOS = 2
PROMPT = np.array([1, 5, 6], np.int32)  # [bos, src_lang, tgt_lang]


def _make(seed: int, dec_layers: int = 2):
    model = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=D, d_model=D, nhead=H,
        num_encoder_layers=2, num_decoder_layers=dec_layers, d_ffn=FFN,
        dropout=0.0, normalize_before=True,
    )
    r = np.random.default_rng(seed)
    src = jnp.asarray(r.standard_normal((1, 9, D)).astype(np.float32))
    tgt = jnp.asarray(r.integers(1, VOCAB, (1, 5)))
    params = model.init(jax.random.PRNGKey(seed), src, tgt)
    head = LinearHead(input_size=D, n_neurons=VOCAB)
    h_params = head.init(
        jax.random.PRNGKey(seed + 100), jnp.zeros((1, D), jnp.float32)
    )
    enc = model.apply(params, src, method=model.encode)
    return model, params, head, h_params, enc


def _naive_greedy(bound: SpecBound, enc, prompt, max_steps: int):
    """Reference: plain argmax-until-eos through single decode steps."""
    P = len(prompt)
    cache = bound.init_cache(enc, P + max_steps, None)
    pos = 0
    for t in prompt[:-1]:
        _, cache = bound.step(jnp.asarray([t], jnp.int32), pos, cache)
        pos += 1
    last = jnp.asarray([prompt[-1]], jnp.int32)
    out = []
    for _ in range(max_steps):
        logits, cache = bound.step(last, pos, cache)
        pos += 1
        nxt = int(jnp.argmax(logits[0]))
        out.append(nxt)
        if nxt == EOS:
            break
        last = jnp.asarray([nxt], jnp.int32)
    return out


class TestDecodeWindow:
    """decode_window == sequential decode_step (the verify-step oracle)."""

    @pytest.mark.parametrize("kv_dtype", [None, "int8"])
    def test_window_matches_steps(self, kv_dtype):
        model, params, head, h_params, enc = _make(0)
        bound = bind_spec_model(model, head, params, h_params, kv_dtype)
        r = np.random.default_rng(1)
        toks = jnp.asarray(r.integers(1, VOCAB, (1, 6)), jnp.int32)

        cache_w = bound.init_cache(enc, 16, None)
        logits_w, cache_w = bound.window(toks, jnp.zeros((), jnp.int32),
                                         cache_w)

        cache_s = bound.init_cache(enc, 16, None)
        seq_logits = []
        for i in range(6):
            l_i, cache_s = bound.step(toks[:, i], i, cache_s)
            seq_logits.append(l_i)
        seq_logits = jnp.stack(seq_logits, axis=1)  # (1, 6, V)

        # int8 cache rows are quantized identically either way, but the
        # attention matmul shapes differ (w-row tile vs 1-row), so allow
        # accumulation-order noise; float path is tighter.
        atol = 1e-4 if kv_dtype is None else 5e-4
        np.testing.assert_allclose(
            np.asarray(logits_w), np.asarray(seq_logits), atol=atol
        )
        for lw, ls in zip(cache_w["layers"], cache_s["layers"]):
            assert int(lw["self"]["index"]) == int(ls["self"]["index"]) == 6
            np.testing.assert_allclose(
                np.asarray(lw["self"]["k"][..., :6]),
                np.asarray(ls["self"]["k"][..., :6]), atol=1e-5,
            )

    def test_set_cache_index_rewind_then_overwrite(self):
        """Rewinding the index and re-decoding from there is exact."""
        model, params, head, h_params, enc = _make(0)
        bound = bind_spec_model(model, head, params, h_params)
        r = np.random.default_rng(2)
        toks = jnp.asarray(r.integers(1, VOCAB, (1, 8)), jnp.int32)

        # decode 4 real tokens, then a 4-token window we mostly discard
        cache = bound.init_cache(enc, 16, None)
        _, cache = bound.window(toks[:, :4], jnp.zeros((), jnp.int32), cache)
        _, cache = bound.window(toks[:, 4:], jnp.asarray(4), cache)
        cache = model.set_cache_index(cache, jnp.asarray(5))  # keep 1 of 4

        # continue with fresh tokens from position 5
        cont = jnp.asarray(r.integers(1, VOCAB, (1, 3)), jnp.int32)
        logits_a, _ = bound.window(cont, jnp.asarray(5), cache)

        # oracle: the same 5+3 tokens fed straight through
        cache_b = bound.init_cache(enc, 16, None)
        full = jnp.concatenate([toks[:, :5], cont], axis=1)
        logits_b, _ = bound.window(full, jnp.zeros((), jnp.int32), cache_b)
        np.testing.assert_allclose(
            np.asarray(logits_a), np.asarray(logits_b[:, 5:]), atol=1e-4
        )


class TestSpeculativeExactness:
    @pytest.mark.parametrize("k", [1, 2, 4, 7])
    def test_equals_target_greedy_random_draft(self, k):
        """Any draft (here: different random weights) — same output."""
        model_t, p_t, head, h_t, enc_t = _make(0)
        model_d, p_d, head_d, h_d, enc_d = _make(7, dec_layers=1)
        target = bind_spec_model(model_t, head, p_t, h_t)
        draft = bind_spec_model(model_d, head_d, p_d, h_d)

        want = _naive_greedy(target, enc_t, PROMPT, max_steps=12)
        res = speculative_greedy_search(
            target, draft, enc_t, enc_d, PROMPT, max_steps=12, k=k,
            eos_index=EOS,
        )
        got = list(np.asarray(res.tokens[: int(res.length)]))
        assert got == want

    def test_perfect_draft_cuts_target_steps(self):
        """Draft == target ⇒ full acceptance ⇒ ~max_steps/k dispatches."""
        model, params, head, h_params, enc = _make(3)
        target = bind_spec_model(model, head, params, h_params)

        want = _naive_greedy(target, enc, PROMPT, max_steps=16)
        res = speculative_greedy_search(
            target, target, enc, enc, PROMPT, max_steps=16, k=4,
            eos_index=EOS,
        )
        got = list(np.asarray(res.tokens[: int(res.length)]))
        assert got == want
        # ceil(len/4) verify windows + 1 prefill
        expect_steps = -(-len(want) // 4) + 1
        assert int(res.target_steps) == expect_steps

    def test_eos_cuts_inside_window(self):
        """A head biased to eos stops after one token, eos included."""
        model, params, head, h_params, enc = _make(0)
        biased = jax.tree_util.tree_map(lambda x: x, h_params)
        bias = np.zeros((VOCAB,), np.float32)
        bias[EOS] = 1e4
        biased = {"params": {"linear": {
            "kernel": h_params["params"]["linear"]["kernel"],
            "bias": jnp.asarray(bias),
        }}}
        target = bind_spec_model(model, head, params, biased)
        res = speculative_greedy_search(
            target, target, enc, enc, PROMPT, max_steps=12, k=4,
            eos_index=EOS,
        )
        assert int(res.length) == 1
        assert int(res.tokens[0]) == EOS

    def test_int8_weights_and_cache_compose(self):
        """Speculation over int8 decode weights + int8 KV cache is exact
        vs the SAME quantized target decoded greedily."""
        from stac_st_tpu.utils.quantize import quantize_decode_weights

        model_t, p_t, head, h_t, enc_t = _make(0)
        model_d, p_d, head_d, h_d, enc_d = _make(7, dec_layers=1)
        q_t, q_h = quantize_decode_weights(p_t, h_t)
        target = bind_spec_model(model_t, head, q_t, q_h, "int8")
        draft = bind_spec_model(model_d, head_d, p_d, h_d, "int8")

        want = _naive_greedy(target, enc_t, PROMPT, max_steps=10)
        res = speculative_greedy_search(
            target, draft, enc_t, enc_d, PROMPT, max_steps=10, k=3,
            eos_index=EOS,
        )
        got = list(np.asarray(res.tokens[: int(res.length)]))
        assert got == want

    def test_jit_compiles_once_end_to_end(self):
        """The whole search jits (static k/max_steps/prompt-len)."""
        model, params, head, h_params, enc = _make(5)
        target = bind_spec_model(model, head, params, h_params)

        @jax.jit
        def run(enc):
            return speculative_greedy_search(
                target, target, enc, enc, PROMPT, max_steps=8, k=3,
                eos_index=EOS,
            )

        res = run(enc)
        want = _naive_greedy(target, enc, PROMPT, max_steps=8)
        assert list(np.asarray(res.tokens[: int(res.length)])) == want


class TestSpeculativeEngine:
    """SpeculativeSTEngine: serving wrapper over target+draft engines."""

    @pytest.fixture(scope="class")
    def engines(self, tmp_path_factory):
        import os
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from fixtures import make_corpus, train_fixture_tokenizer

        from stac_st_tpu.models import ConvolutionFrontEnd
        from stac_st_tpu.ops.cmvn import cmvn_init
        from stac_st_tpu.serving import SpeculativeSTEngine, STEngine

        root = str(tmp_path_factory.mktemp("spec_serve"))
        _, _, joint = make_corpus(root, n_utts=4, seconds=0.4)
        sp, _ = train_fixture_tokenizer(root, joint, vocab=150)

        def build(seed, dec_layers):
            cnn = ConvolutionFrontEnd(out_channels=(16, 16))
            model = TransformerMultiTask(
                tgt_vocab=150, input_size=20 * 16, d_model=32, nhead=4,
                num_encoder_layers=2, num_decoder_layers=dec_layers,
                d_ffn=64, dropout=0.0, normalize_before=True,
            )
            seq_lin = LinearHead(input_size=32, n_neurons=150)
            ctc_lin = LinearHead(input_size=32, n_neurons=150)
            rng = jax.random.PRNGKey(seed)
            feats = jnp.zeros((1, 41, 80))
            cnn_p = cnn.init(rng, feats)
            src = cnn.apply(cnn_p, feats)
            tr_p = model.init(rng, src, jnp.ones((1, 4), jnp.int32))
            enc = model.apply(tr_p, src, method=model.encode)
            params = {
                "CNN": cnn_p, "Transformer": tr_p,
                "seq_lin": seq_lin.init(rng, enc),
                "ctc_lin": ctc_lin.init(rng, enc),
            }
            return STEngine(
                model, cnn, seq_lin, ctc_lin, params, cmvn_init(80), sp,
                bucket_seconds=(0.5, 1.0), bf16=False, beam_size=2,
                max_decode_tokens=12,
                turn_id=sp.piece_to_id("[turn]"),
                xt_id=sp.piece_to_id("[xt]"),
            )

        target = build(0, dec_layers=2)
        draft = build(9, dec_layers=1)
        return target, draft, SpeculativeSTEngine(target, draft, k=3)

    def _target_greedy_text(self, target, wav, src_lang, tgt_lang):
        """Oracle: greedy decode through the target's own encode path."""
        from stac_st_tpu.decoding.speculative import bind_spec_model

        sp = target.tokenizer
        src_id = sp.encode_as_ids(f"[{src_lang}]")[-1]
        tgt_id = sp.encode_as_ids(f"[{tgt_lang}]")[-1]
        prompt = [target.searcher.bos_token, src_id, tgt_id]
        width = target._bucket_width(len(wav))
        batch = np.zeros((1, width), np.float32)
        batch[0, : len(wav)] = wav
        lens = jnp.asarray([len(wav) / width], np.float32)
        enc = target._encode(
            target.params, target.cmvn, jnp.asarray(batch), lens)
        bound = bind_spec_model(
            target._transformer, target.searcher.seq_lin_def,
            target.params["Transformer"], target.params["seq_lin"],
        )
        toks = _naive_greedy(bound, enc, prompt, max_steps=12)
        return sp.decode_ids(toks)

    def test_translate_matches_target_greedy(self, engines, rng):
        target, _draft, spec = engines
        wavs = [rng.standard_normal(int(0.3 * 16000)).astype(np.float32),
                rng.standard_normal(int(0.7 * 16000)).astype(np.float32)]
        got = spec.translate(wavs)
        want = [self._target_greedy_text(target, w, "es", "en")
                for w in wavs]
        assert got == want
        assert len(spec.last_stats) == 2
        for s in spec.last_stats:
            assert s["target_steps"] >= 1

    def test_perfect_draft_stats(self, engines, rng):
        from stac_st_tpu.serving import SpeculativeSTEngine

        target, _d, _s = engines
        spec = SpeculativeSTEngine(target, target, k=3)
        wav = rng.standard_normal(int(0.3 * 16000)).astype(np.float32)
        text = spec.transcribe([wav])[0]
        assert text == self._target_greedy_text(target, wav, "es", "es")
        (stat,) = spec.last_stats
        # full acceptance: ceil(tokens/3) windows + 1 prefill
        assert stat["target_steps"] == -(-stat["tokens"] // 3) + 1

    def test_warmup_compiles_buckets(self, engines):
        _t, _d, spec = engines
        assert spec.warmup() == 2
