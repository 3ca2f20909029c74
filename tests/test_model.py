"""Model tests: shapes, masks, and KV-cached decode == full-prefix oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.models import (
    ConvolutionFrontEnd,
    LinearHead,
    TransformerMultiTask,
    conv_out_length,
)

D_MODEL, NHEAD, ENC_L, DEC_L, FFN, VOCAB = 32, 4, 2, 2, 64, 50


@pytest.fixture(scope="module")
def model_and_params():
    model = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=24, d_model=D_MODEL, nhead=NHEAD,
        num_encoder_layers=ENC_L, num_decoder_layers=DEC_L, d_ffn=FFN,
        dropout=0.0, normalize_before=True, causal=False,
    )
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((2, 12, 24)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(1, VOCAB, (2, 7)))
    params = model.init(jax.random.PRNGKey(0), src, tgt)
    return model, params


class TestFrontend:
    def test_downsampling_shape(self, rng):
        fe = ConvolutionFrontEnd()
        feats = jnp.asarray(rng.standard_normal((2, 101, 80)).astype(np.float32))
        params = fe.init(jax.random.PRNGKey(0), feats)
        out = fe.apply(params, feats)
        # 101 -> 51 -> 26 (SAME/stride-2 ceil chain); 80 -> 20; 256 channels
        assert out.shape == (2, 26, 20, 256)
        assert conv_out_length(101) == 26
        assert out.shape[2] * out.shape[3] == 5120

    def test_25hz_contract(self):
        """100 Hz fbank -> 25 Hz encoder frames (inference.py:48)."""
        assert conv_out_length(400) == 100


class TestTransformerMultiTask:
    def test_forward_shapes(self, model_and_params, rng):
        model, params = model_and_params
        src = jnp.asarray(rng.standard_normal((2, 12, 24)).astype(np.float32))
        tgt = jnp.asarray(rng.integers(1, VOCAB, (2, 7)))
        wav_len = jnp.asarray([1.0, 0.5], jnp.float32)
        enc, dec = model.apply(params, src, tgt, wav_len)
        assert enc.shape == (2, 12, D_MODEL)
        assert dec.shape == (2, 7, D_MODEL)

    def test_4d_src_flatten(self, model_and_params, rng):
        model, params = model_and_params
        src4 = jnp.asarray(rng.standard_normal((2, 12, 6, 4)).astype(np.float32))
        tgt = jnp.asarray(rng.integers(1, VOCAB, (2, 5)))
        enc, dec = model.apply(params, src4, tgt)
        assert enc.shape == (2, 12, D_MODEL)

    def test_padding_invariance(self, model_and_params, rng):
        """Padded frames must not change valid encoder outputs."""
        model, params = model_and_params
        src = rng.standard_normal((1, 8, 24)).astype(np.float32)
        padded = np.concatenate(
            [src, 999.0 * np.ones((1, 8, 24), np.float32)], axis=1
        )
        enc_short = model.apply(
            params, jnp.asarray(src), None,
            method=TransformerMultiTask.encode,
        )
        # encode() keeps the frame AT index abs_len (reference quirk:
        # floor + strict '>' — TransformerMultiTask.py:291-294), so pick a
        # rel length with abs_len=7 ⇒ attended set = frames 0..7 exactly.
        enc_pad = model.apply(
            params, jnp.asarray(padded), jnp.asarray([7.5 / 16.0]),
            method=TransformerMultiTask.encode,
        )
        np.testing.assert_allclose(
            np.asarray(enc_short)[0, :8], np.asarray(enc_pad)[0, :8],
            rtol=1e-4, atol=1e-4,
        )

    def test_causal_decoder(self, model_and_params, rng):
        """Future target tokens must not affect earlier positions."""
        model, params = model_and_params
        src = jnp.asarray(rng.standard_normal((1, 10, 24)).astype(np.float32))
        tgt1 = np.array([[1, 5, 7, 9, 11]])
        tgt2 = tgt1.copy()
        tgt2[0, -1] = 40  # change last token only
        _, dec1 = model.apply(params, src, jnp.asarray(tgt1))
        _, dec2 = model.apply(params, src, jnp.asarray(tgt2))
        np.testing.assert_allclose(
            np.asarray(dec1)[0, :-1], np.asarray(dec2)[0, :-1],
            rtol=1e-5, atol=1e-5,
        )

    def test_decode_step_matches_full_decode(self, model_and_params, rng):
        """KV-cached stepping == reference full-prefix re-decode (oracle)."""
        model, params = model_and_params
        B, S, T = 2, 10, 6
        enc_out = jnp.asarray(
            rng.standard_normal((B, S, D_MODEL)).astype(np.float32)
        )
        tokens = jnp.asarray(rng.integers(1, VOCAB, (B, T)))

        # oracle: full-prefix decode (the reference's decode())
        full, _ = model.apply(
            params, tokens, enc_out, method=TransformerMultiTask.decode
        )

        # stepped: feed tokens one by one through the cache
        cache = model.apply(
            params, enc_out, T, method=TransformerMultiTask.init_decode_cache
        )
        stepped = []
        for t in range(T):
            out, cache = model.apply(
                params, tokens[:, t], jnp.asarray(t), cache,
                method=TransformerMultiTask.decode_step,
            )
            stepped.append(np.asarray(out))
        stepped = np.stack(stepped, axis=1)  # (B, T, d)
        np.testing.assert_allclose(
            stepped, np.asarray(full), rtol=1e-4, atol=1e-4
        )


class TestLinearHead:
    def test_shape(self, rng):
        head = LinearHead(input_size=D_MODEL, n_neurons=VOCAB)
        x = jnp.asarray(rng.standard_normal((2, 5, D_MODEL)).astype(np.float32))
        params = head.init(jax.random.PRNGKey(0), x)
        assert head.apply(params, x).shape == (2, 5, VOCAB)


class TestEncoderVariants:
    def test_relpos_encoder_forward(self, rng):
        model = TransformerMultiTask(
            tgt_vocab=VOCAB, input_size=24, d_model=D_MODEL, nhead=NHEAD,
            num_encoder_layers=2, num_decoder_layers=2, d_ffn=FFN,
            dropout=0.0, normalize_before=True,
            attention_type="RelPosMHAXL",
        )
        src = jnp.asarray(rng.standard_normal((2, 10, 24)).astype(np.float32))
        tgt = jnp.asarray(rng.integers(1, VOCAB, (2, 5)))
        params = model.init(jax.random.PRNGKey(0), src, tgt)
        enc, dec = model.apply(params, src, tgt, jnp.asarray([1.0, 0.7]))
        assert enc.shape == (2, 10, D_MODEL)
        assert dec.shape == (2, 5, D_MODEL)
        assert np.all(np.isfinite(np.asarray(enc)))

    def test_relpos_shift_invariance(self, rng):
        """Relative attention: uniform time shift of content must not change
        outputs (unlike absolute PE)."""
        from stac_st_tpu.models.relpos import RelPosMultiHeadAttention

        mha = RelPosMultiHeadAttention(d_model=16, nhead=2)
        x = rng.standard_normal((1, 6, 16)).astype(np.float32)
        params = mha.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out1, _ = mha.apply(params, jnp.asarray(x))
        # embed the same content one step later in a longer sequence
        x2 = np.concatenate([x[:, :1] * 0, x], axis=1)
        out2, _ = mha.apply(params, jnp.asarray(x2))
        # middle positions attend same relative pattern; only check shapes +
        # finiteness here (strict invariance needs masking of the extra pos)
        assert out2.shape == (1, 7, 16)
        assert np.all(np.isfinite(np.asarray(out2)))

    def test_conformer_encoder_forward(self, rng):
        model = TransformerMultiTask(
            tgt_vocab=VOCAB, input_size=24, d_model=D_MODEL, nhead=NHEAD,
            num_encoder_layers=2, num_decoder_layers=2, d_ffn=FFN,
            dropout=0.0, normalize_before=True,
            encoder_module="conformer", attention_type="RelPosMHAXL",
            kernel_size=7,
        )
        src = jnp.asarray(rng.standard_normal((2, 12, 24)).astype(np.float32))
        tgt = jnp.asarray(rng.integers(1, VOCAB, (2, 5)))
        params = model.init(jax.random.PRNGKey(0), src, tgt)
        enc, dec = model.apply(params, src, tgt, jnp.asarray([1.0, 0.5]))
        assert enc.shape == (2, 12, D_MODEL)
        assert np.all(np.isfinite(np.asarray(enc)))
        # KV-cached decode still works with a conformer encoder
        cache = model.apply(
            params, enc, 4, method=TransformerMultiTask.init_decode_cache
        )
        out, cache = model.apply(
            params, jnp.asarray([1, 1]), jnp.asarray(0), cache,
            method=TransformerMultiTask.decode_step,
        )
        assert out.shape == (2, D_MODEL)


class TestLongDecodeCache:
    def test_long_cache_matches_full_decode(self, model_and_params, rng):
        """The decode-layout cache (Kᵀ (B,H,Dh,S) / V (B,H,S,Dh) — no
        per-step transposes) must stay exact over long budgets."""
        model, params = model_and_params
        CACHE_LEN = 128
        B, S, T = 2, 10, 100  # T > 64 exercises the fori_loop chunk path
        enc_out = jnp.asarray(
            rng.standard_normal((B, S, D_MODEL)).astype(np.float32)
        )
        tokens = jnp.asarray(rng.integers(1, VOCAB, (B, T)))
        full, _ = model.apply(
            params, tokens, enc_out, method=TransformerMultiTask.decode
        )
        cache = model.apply(
            params, enc_out, CACHE_LEN,
            method=TransformerMultiTask.init_decode_cache,
        )
        stepped = []
        for t in range(T):
            out, cache = model.apply(
                params, tokens[:, t], jnp.asarray(t), cache,
                method=TransformerMultiTask.decode_step,
            )
            stepped.append(np.asarray(out))
        stepped = np.stack(stepped, axis=1)
        np.testing.assert_allclose(
            stepped, np.asarray(full), rtol=5e-4, atol=5e-4
        )
