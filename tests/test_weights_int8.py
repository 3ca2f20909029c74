"""Weight-only int8 decode (utils/quantize.py + dequant-on-read model paths).

Correctness is pinned by construction: quantizing and then EXACTLY
dequantizing the same kernels (int8 · scale, per output column) must
give the same decode as running the int8 kernels through the fused
dequant-on-read path — the only difference is where the scale multiply
happens (inside each product vs on the f32 accumulator), which is
algebraically identical for per-column scales.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.models import LinearHead, TransformerMultiTask
from stac_st_tpu.utils.quantize import (
    quantize_decode_weights,
    quantize_dense_params,
)

VOCAB, D, H, FFN = 64, 32, 4, 64


@pytest.fixture(scope="module")
def model_and_params():
    model = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=D, d_model=D, nhead=H,
        num_encoder_layers=2, num_decoder_layers=2, d_ffn=FFN,
        dropout=0.0, normalize_before=True,
    )
    r = np.random.default_rng(0)
    src = jnp.asarray(r.standard_normal((2, 9, D)).astype(np.float32))
    tgt = jnp.asarray(r.integers(1, VOCAB, (2, 5)))
    params = model.init(jax.random.PRNGKey(0), src, tgt)
    return model, params


def _dequantize(tree):
    """int8 kernel + scale -> exact f32 kernel (drops the scale leaf)."""
    def walk(d):
        if isinstance(d, dict):
            if "kernel" in d and d["kernel"].dtype == jnp.int8:
                out = {"kernel": d["kernel"].astype(jnp.float32)
                       * d["kernel_scale"]}
                if "bias" in d:
                    out["bias"] = d["bias"]
                return out
            return {k: walk(v) for k, v in d.items()}
        return d
    return walk(tree)


class TestQuantizeTree:
    def test_leaf_selection(self, model_and_params):
        _, params = model_and_params
        q, _ = quantize_decode_weights(params)
        layer = q["params"]["decoder"]["layer_0"]
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            assert layer["self_attn"][name]["kernel"].dtype == jnp.int8
            assert layer["self_attn"][name]["kernel_scale"].dtype == (
                jnp.float32)
        # cross-attention K/V run once per utterance (encode phase): float
        assert layer["cross_attn"]["k_proj"]["kernel"].dtype == jnp.float32
        assert layer["cross_attn"]["v_proj"]["kernel"].dtype == jnp.float32
        assert layer["cross_attn"]["q_proj"]["kernel"].dtype == jnp.int8
        assert layer["ffn"]["fc1"]["kernel"].dtype == jnp.int8
        # encoder untouched
        enc = params["params"]["encoder"]["layer_0"]
        q_enc = q["params"]["encoder"]["layer_0"]
        assert jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: a.dtype == b.dtype, enc, q_enc))
        # input tree not mutated
        assert params["params"]["decoder"]["layer_0"]["self_attn"][
            "q_proj"]["kernel"].dtype == jnp.float32

    def test_dense_quantization_error_bounded(self):
        r = np.random.default_rng(1)
        k = r.standard_normal((16, 8)).astype(np.float32)
        q = quantize_dense_params({"kernel": jnp.asarray(k)})
        k_dq = np.asarray(q["kernel"], np.float32) * np.asarray(
            q["kernel_scale"])
        # symmetric per-column int8: error <= scale/2 per entry
        bound = np.asarray(q["kernel_scale"]) / 2 + 1e-7
        assert (np.abs(k_dq - k) <= bound[None, :]).all()


class TestDecodeParity:
    def _run_steps(self, model, params, enc_out, tokens):
        T = tokens.shape[1]
        cache = model.apply(
            params, enc_out, T,
            method=TransformerMultiTask.init_decode_cache)
        outs = []
        for t in range(T):
            out, cache = model.apply(
                params, tokens[:, t], jnp.asarray(t), cache,
                method=TransformerMultiTask.decode_step)
            outs.append(np.asarray(out))
        return np.stack(outs, axis=1)

    def test_int8_path_equals_exact_dequant(self, model_and_params):
        """decode_step with int8 kernels == decode_step with the same
        kernels exactly dequantized to float (per-column scale factors
        out of the accumulation algebraically)."""
        model, params = model_and_params
        r = np.random.default_rng(2)
        enc_out = jnp.asarray(
            r.standard_normal((2, 9, D)).astype(np.float32))
        tokens = jnp.asarray(r.integers(1, VOCAB, (2, 6)))

        q_params, _ = quantize_decode_weights(params)
        dq_params = _dequantize(q_params)
        got = self._run_steps(model, q_params, enc_out, tokens)
        want = self._run_steps(model, dq_params, enc_out, tokens)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_head_int8_equals_exact_dequant(self, model_and_params):
        head = LinearHead(input_size=D, n_neurons=VOCAB)
        r = np.random.default_rng(3)
        x = jnp.asarray(r.standard_normal((5, D)).astype(np.float32))
        p = head.init(jax.random.PRNGKey(1), x)
        _, q_seq = quantize_decode_weights(
            {"params": {"decoder": {}}}, p)
        dq = _dequantize(q_seq)
        got = np.asarray(head.apply(q_seq, x))
        want = np.asarray(head.apply(dq, x))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_beam_search_hyps_match_exact_dequant(self, model_and_params):
        from stac_st_tpu.decoding.beam_search import MultiTaskBeamSearch

        model, params = model_and_params
        head = LinearHead(input_size=D, n_neurons=VOCAB)
        r = np.random.default_rng(4)
        enc_out = jnp.asarray(
            r.standard_normal((2, 9, D)).astype(np.float32))
        enc_lens = jnp.ones((2,), jnp.float32)
        hp = head.init(jax.random.PRNGKey(2), enc_out)

        q_tr, q_hp = quantize_decode_weights(params, hp)
        outs = {}
        for tag, tp, sp in (("int8", q_tr, q_hp),
                            ("dequant", _dequantize(q_tr), _dequantize(q_hp))):
            searcher = MultiTaskBeamSearch(
                [model, head], bos_index=1, eos_index=2, blank_index=0,
                min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=3,
                max_decode_tokens=12,
            )
            searcher.bind(tp, sp)
            searcher.set_decoder_prefix_tokens(3, 4)
            hyps, scores = searcher(enc_out, enc_lens)
            outs[tag] = hyps
        assert [list(h) for h in outs["int8"]] == [
            list(h) for h in outs["dequant"]]


class TestEngine:
    def test_engine_weights_int8(self):
        import sys, os, tempfile

        sys.path.insert(0, os.path.dirname(__file__))
        from fixtures import make_corpus, train_fixture_tokenizer

        from stac_st_tpu.models import ConvolutionFrontEnd
        from stac_st_tpu.ops.cmvn import cmvn_init
        from stac_st_tpu.serving import STEngine

        root = tempfile.mkdtemp(prefix="wint8_")
        _, _, joint = make_corpus(root, n_utts=4, seconds=0.4)
        sp, _ = train_fixture_tokenizer(root, joint, vocab=80)

        cnn = ConvolutionFrontEnd(out_channels=(16, 16))
        model = TransformerMultiTask(
            tgt_vocab=80, input_size=20 * 16, d_model=D, nhead=H,
            num_encoder_layers=2, num_decoder_layers=2, d_ffn=FFN,
            dropout=0.0, normalize_before=True,
        )
        seq_lin = LinearHead(input_size=D, n_neurons=80)
        ctc_lin = LinearHead(input_size=D, n_neurons=80)
        key = jax.random.PRNGKey(0)
        feats = jnp.zeros((1, 41, 80))
        cnn_p = cnn.init(key, feats)
        src = cnn.apply(cnn_p, feats)
        tr_p = model.init(key, src, jnp.ones((1, 4), jnp.int32))
        enc = model.apply(tr_p, src, method=model.encode)
        params = {"CNN": cnn_p, "Transformer": tr_p,
                  "seq_lin": seq_lin.init(key, enc),
                  "ctc_lin": ctc_lin.init(key, enc)}
        engine = STEngine(
            model, cnn, seq_lin, ctc_lin, params, cmvn_init(80), sp,
            beam_size=2, bucket_seconds=(0.5,), bf16=False,
            weights_int8=True,
            turn_id=sp.piece_to_id("[turn]"), xt_id=sp.piece_to_id("[xt]"),
        )
        lay = engine.params["Transformer"]["params"]["decoder"]["layer_0"]
        assert lay["self_attn"]["q_proj"]["kernel"].dtype == jnp.int8
        assert engine.params["seq_lin"]["params"]["linear"][
            "kernel"].dtype == jnp.int8
        wav = np.random.default_rng(0).standard_normal(4000).astype(
            np.float32)
        out = engine.translate([wav]) + engine.transcribe([wav])
        assert all(isinstance(t, str) for t in out)
        # dual fused path also dequantizes
        asr, st = engine.transcribe_and_translate([wav])
        assert isinstance(asr[0], str) and isinstance(st[0], str)
