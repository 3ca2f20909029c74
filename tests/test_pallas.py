"""Pallas kernel parity tests (interpret mode — runs on the CPU mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.ops.pallas.attention import flash_attention


def _reference_attention(q, k, v, bias=None):
    Dh = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (Dh ** 0.5)
    if bias is not None:
        logits = logits + bias[:, None, None, :]
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


class TestFlashAttention:
    @pytest.mark.parametrize("B,T,H,Dh", [(2, 64, 4, 64), (1, 200, 2, 64)])
    def test_matches_reference(self, rng, B, T, H, Dh):
        q = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        out = flash_attention(q, k, v, interpret=True)
        ref = _reference_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_padding_bias(self, rng):
        B, T, H, Dh = 2, 96, 2, 64
        q = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        bias = jnp.where(
            jnp.arange(T)[None, :] < 60, 0.0, -1e9
        ).astype(jnp.float32).repeat(B, axis=0).reshape(B, T)
        out = flash_attention(q, k, v, bias, interpret=True)
        ref = _reference_attention(q, k, v, bias)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


class TestDecodeAttentionKernels:
    def test_self_attention_parity(self, rng):
        from stac_st_tpu.ops.pallas.decode_attention import (
            decode_self_attention,
        )

        BB, H, Dh, S = 6, 4, 64, 40
        q = jnp.asarray(rng.standard_normal((BB, H, Dh)).astype(np.float32))
        kT = jnp.asarray(
            rng.standard_normal((BB, H, Dh, S)).astype(np.float32)
        )
        v = jnp.asarray(rng.standard_normal((BB, H, S, Dh)).astype(np.float32))
        idx = jnp.asarray(17, jnp.int32)
        out = decode_self_attention(q, kT, v, idx, interpret=True)
        # reference
        logits = jnp.einsum("bhd,bhds->bhs", q, kT)
        mask = jnp.where(jnp.arange(S)[None, None, :] > 17, -1e9, 0.0)
        w = jax.nn.softmax(logits + mask, axis=-1)
        ref = jnp.einsum("bhs,bhsd->bhd", w, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_cross_attention_parity_with_beams(self, rng):
        from stac_st_tpu.ops.pallas.decode_attention import (
            decode_cross_attention,
        )

        B, beam, H, Dh, S = 3, 4, 2, 64, 30
        q = jnp.asarray(
            rng.standard_normal((B * beam, H, Dh)).astype(np.float32)
        )
        kT = jnp.asarray(rng.standard_normal((B, H, Dh, S)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))
        bias = jnp.where(
            jnp.arange(S)[None, :] < 20, 0.0, -1e9
        ) * jnp.ones((B, S))
        out = decode_cross_attention(q, kT, v, bias, beam, interpret=True)
        qg = q.reshape(B, beam, H, Dh)
        logits = jnp.einsum("bqhd,bhds->bqhs", qg, kT)
        w = jax.nn.softmax(logits + bias[:, None, None, :], axis=-1)
        ref = jnp.einsum("bqhs,bhsd->bqhd", w, v).reshape(B * beam, H, Dh)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_anc_attention_parity(self, rng):
        """Gather-free ancestor-select kernel == explicit-gather oracle."""
        from stac_st_tpu.ops.pallas.decode_attention import (
            decode_self_attention_anc,
        )

        B, beam, H, Dh, S = 2, 3, 2, 64, 24
        BB = B * beam
        q = jnp.asarray(rng.standard_normal((BB, H, Dh)).astype(np.float32))
        k = jnp.asarray(
            rng.standard_normal((BB, H, S, Dh)).astype(np.float32)
        )
        v = jnp.asarray(
            rng.standard_normal((BB, H, S, Dh)).astype(np.float32)
        )
        anc = jnp.asarray(rng.integers(0, beam, (B, beam, S)), jnp.int32)
        idx = jnp.asarray(13, jnp.int32)
        out = decode_self_attention_anc(q, k, v, anc, idx, beam,
                                        interpret=True)
        # oracle: physically gather each beam's ancestral K/V per position
        k5 = np.asarray(k).reshape(B, beam, H, S, Dh)
        v5 = np.asarray(v).reshape(B, beam, H, S, Dh)
        anc_np = np.asarray(anc)
        ref = np.zeros((B, beam, H, Dh), np.float32)
        for b in range(B):
            for r in range(beam):
                kg = np.stack(
                    [k5[b, anc_np[b, r, s], :, s, :] for s in range(S)], 1
                )  # (H, S, Dh)
                vg = np.stack(
                    [v5[b, anc_np[b, r, s], :, s, :] for s in range(S)], 1
                )
                logits = np.einsum(
                    "hd,hsd->hs", np.asarray(q).reshape(B, beam, H, Dh)[b, r],
                    kg,
                )
                logits[:, 14:] = -1e9
                w = np.exp(logits - logits.max(-1, keepdims=True))
                w = w / w.sum(-1, keepdims=True)
                ref[b, r] = np.einsum("hs,hsd->hd", w, vg)
        np.testing.assert_allclose(
            np.asarray(out).reshape(B, beam, H, Dh), ref,
            rtol=2e-4, atol=2e-4,
        )

    def test_beam_search_anc_mode_equals_gather_mode(self, rng):
        """Full searcher in gather-free (anc) mode == physical-gather mode."""
        import stac_st_tpu.ops.pallas as pallas_mod
        from stac_st_tpu.decoding.beam_search import MultiTaskBeamSearch
        from stac_st_tpu.models import LinearHead, TransformerMultiTask

        model = TransformerMultiTask(
            tgt_vocab=40, input_size=16, d_model=64, nhead=2,
            num_encoder_layers=1, num_decoder_layers=2, d_ffn=64,
            dropout=0.0, normalize_before=True,
        )
        head = LinearHead(input_size=64, n_neurons=40)
        src = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
        tgt = jnp.asarray(rng.integers(1, 40, (2, 5)))
        params = model.init(jax.random.PRNGKey(0), src, tgt)
        enc = model.apply(params, src, method=model.encode)
        hp = head.init(jax.random.PRNGKey(1), enc)

        def run():
            s = MultiTaskBeamSearch(
                [model, head, None], bos_index=1, eos_index=2,
                min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=3,
                using_eos_threshold=True, length_normalization=True,
                temperature=1.2,
            )
            s.bind(params, hp)
            s.set_decoder_prefix_tokens(3, 4)
            return s(enc)

        base_hyps, base_scores = run()
        try:
            pallas_mod.enable(interpret=True)
            anc_hyps, anc_scores = run()
        finally:
            pallas_mod.disable()
        assert anc_hyps == base_hyps
        np.testing.assert_allclose(anc_scores, base_scores, rtol=1e-4,
                                   atol=1e-4)

    def test_model_step_parity_with_kernels(self, rng):
        """MHA.step with pallas enabled == XLA path (interpret mode)."""
        import stac_st_tpu.ops.pallas as pallas_mod
        from stac_st_tpu.models import TransformerMultiTask

        model = TransformerMultiTask(
            tgt_vocab=30, input_size=16, d_model=64, nhead=1,
            num_encoder_layers=1, num_decoder_layers=1, d_ffn=32,
            dropout=0.0, normalize_before=True,
        )
        src = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
        tgt = jnp.asarray(rng.integers(1, 30, (2, 4)))
        params = model.init(jax.random.PRNGKey(0), src, tgt)
        enc = model.apply(params, src, method=model.encode)

        def roll(n_steps=4):
            cache = model.apply(
                params, enc, n_steps,
                method=TransformerMultiTask.init_decode_cache,
            )
            outs = []
            for t in range(n_steps):
                o, cache = model.apply(
                    params, tgt[:, t], jnp.asarray(t), cache,
                    method=TransformerMultiTask.decode_step,
                )
                outs.append(np.asarray(o))
            return np.stack(outs)

        base = roll()
        try:
            pallas_mod.enable(interpret=True)
            fast = roll()
        finally:
            pallas_mod.disable()
        np.testing.assert_allclose(fast, base, rtol=5e-4, atol=5e-4)
